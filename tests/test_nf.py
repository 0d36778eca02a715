"""Noise filling (nf.py): level analysis, decoder fill, wire format,
stream chunking/seek determinism, and rate-control integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import audiocodec_tpu as act
from audiocodec_tpu import nf
from audiocodec_tpu import quantize as q
from audiocodec_tpu.io import bitstream
from audiocodec_tpu.io import stream_container as sc

F32 = jnp.float32


@pytest.fixture(scope="module")
def codec():
    return act.Codec.create(
        sample_rate=44100, filters_n=256, bark_bands_n=32,
        compute_dtype=F32,
    )


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(7)
    t = np.arange(256 * 48) / 44100
    x = 0.3 * np.sin(2 * np.pi * 440 * t)
    x += 0.08 * rng.standard_normal(t.size)
    return jnp.asarray(x.astype(np.float32)[None, :, None])


class TestAnalyze:
    def test_energy_matched_level(self):
        """The decoded fill's expected power equals the zeroed residual
        power (the analyzer's defining property), up to log quantization."""
        rng = np.random.default_rng(0)
        spec = jnp.asarray(rng.normal(size=(1, 4, 64, 1)).astype(np.float32))
        delta = jnp.full((1, 4, 64, 1), 10.0, F32)  # everything quantizes to 0
        codes = jnp.zeros((1, 4, 64, 1), jnp.int32)
        lv = nf.analyze(spec, codes, delta, 8)
        a = np.asarray(nf.level_to_amp(lv, np.dtype(np.float32)))
        fill_power = (a[:, :, None, :] * np.asarray(delta[..., 8:, :])) ** 2 / 3
        lost = (np.asarray(spec)[..., 8:, :] ** 2).sum(axis=2)
        got = fill_power.sum(axis=2)
        np.testing.assert_allclose(got[..., 0], lost[..., 0], rtol=0.1)

    def test_silence_gives_zero(self):
        spec = jnp.zeros((1, 3, 64, 2), F32)
        delta = jnp.ones((1, 3, 64, 2), F32)
        codes = jnp.zeros((1, 3, 64, 2), jnp.int32)
        assert int(np.max(nf.analyze(spec, codes, delta, 8))) == 0

    def test_no_holes_gives_zero(self):
        rng = np.random.default_rng(1)
        spec = jnp.asarray(rng.normal(size=(1, 3, 64, 1)).astype(np.float32))
        delta = jnp.full((1, 3, 64, 1), 1e-3, F32)
        codes, d = q.quantize(spec, delta * np.sqrt(3.0))
        assert int((np.asarray(codes)[..., 8:, :] == 0).sum()) == 0
        assert int(np.max(nf.analyze(spec, codes, d, 8))) == 0

    def test_cap_at_deadzone_capacity(self):
        """Level never exceeds the zero bin's residual bound sqrt(3)*z."""
        spec = jnp.full((1, 2, 64, 1), 100.0, F32)  # absurd residual
        delta = jnp.ones((1, 2, 64, 1), F32)
        codes = jnp.zeros((1, 2, 64, 1), jnp.int32)
        lv = nf.analyze(spec, codes, delta, 8, deadzone=1.0)
        a = float(np.max(np.asarray(nf.level_to_amp(lv, np.dtype(np.float32)))))
        assert a <= np.sqrt(3.0) * 1.0 * 1.03  # one log step of slack


class TestBandGuard:
    def test_inverted_band_rejected_both_sides(self):
        """An empty fill band (band_end <= band_start — e.g. a bwe
        crossover below the fill's start at extreme sample-rate/
        filters_n combinations) must refuse LOUDLY on analyze AND fill:
        silently accepting it lets the encoder write a container whose
        decode builds a wrong-width spectrum and crashes."""
        spec = jnp.zeros((1, 2, 64, 1), F32)
        delta = jnp.ones((1, 2, 64, 1), F32)
        codes = jnp.zeros((1, 2, 64, 1), jnp.int32)
        levels = jnp.zeros((1, 2, 1), jnp.uint8)
        for end in (8, 4, 0):
            with pytest.raises(ValueError, match="empty"):
                nf.analyze(spec, codes, delta, 8, band_end=end)
            with pytest.raises(ValueError, match="empty"):
                nf.fill(spec, codes, delta, levels, 8, 0, band_end=end)


class TestFill:
    def _setup(self):
        rng = np.random.default_rng(2)
        spec = jnp.asarray(rng.normal(size=(2, 5, 64, 2)).astype(np.float32))
        delta = jnp.full((2, 5, 64, 2), 0.5, F32)
        codes = jnp.asarray(
            rng.integers(-2, 3, size=(2, 5, 64, 2)).astype(np.int32)
        )
        levels = jnp.full((2, 5, 2), 200, jnp.uint8)
        return spec, codes, delta, levels

    def test_only_zero_codes_in_band_change(self):
        spec, codes, delta, levels = self._setup()
        out = np.asarray(nf.fill(spec, codes, delta, levels, 8, 3))
        diff = out != np.asarray(spec)
        assert not diff[:, :, :8, :].any()  # below band start untouched
        nz = np.asarray(codes)[:, :, 8:, :] != 0
        assert not (diff[:, :, 8:, :] & nz).any()
        zr = ~nz
        assert diff[:, :, 8:, :][zr].mean() > 0.9  # holes actually fill

    def test_deterministic(self):
        spec, codes, delta, levels = self._setup()
        a = np.asarray(nf.fill(spec, codes, delta, levels, 8, 3))
        b = np.asarray(nf.fill(spec, codes, delta, levels, 8, 3))
        assert np.array_equal(a, b)
        c = np.asarray(nf.fill(spec, codes, delta, levels, 8, 4))
        assert not np.array_equal(a, c)  # seed matters

    def test_chunking_invariance(self):
        """Filling frames [0:2] and [2:5] with matching offsets equals
        filling all five at once — the .acs == .acz guarantee."""
        spec, codes, delta, levels = self._setup()
        whole = np.asarray(nf.fill(spec, codes, delta, levels, 8, 3))
        p1 = nf.fill(spec[:, :2], codes[:, :2], delta[:, :2],
                     levels[:, :2], 8, 3, frame_offset=0)
        p2 = nf.fill(spec[:, 2:], codes[:, 2:], delta[:, 2:],
                     levels[:, 2:], 8, 3, frame_offset=2)
        np.testing.assert_array_equal(
            whole, np.concatenate([np.asarray(p1), np.asarray(p2)], axis=1)
        )

    def test_zero_level_is_identity(self):
        spec, codes, delta, _ = self._setup()
        levels = jnp.zeros((2, 5, 2), jnp.uint8)
        out = np.asarray(nf.fill(spec, codes, delta, levels, 8, 3))
        np.testing.assert_array_equal(out, np.asarray(spec))

    def test_batch_items_get_different_noise(self):
        spec, codes, delta, levels = self._setup()
        codes = jnp.zeros_like(codes)
        out = np.asarray(nf.fill(spec, codes, delta, levels, 8, 3))
        noise = out - np.asarray(spec)
        assert not np.array_equal(noise[0, :, 8:], noise[1, :, 8:])


class TestCodecIntegration:
    def test_restores_band_energy_at_high_scale(self, codec, signal):
        """At an aggressive threshold scale the whole band quantizes to
        zero; filling must restore the band's energy envelope (tens of dB
        better) at a bounded SNR cost (< 3 dB by construction)."""
        frames = codec.mdct.transform(signal)
        scale = 32.0
        codes, bark, nfl = codec.quantize_frames(
            frames, threshold_scale=scale, nf=True
        )
        w_nf = codec.decode_bitstream(codes, bark, threshold_scale=scale,
                                      nf_levels=nfl)
        w_off = codec.decode_bitstream(codes, bark, threshold_scale=scale)
        bs = codec.nf_band_start
        ref = np.asarray(frames)[:, :, bs:, :]

        def band_err(w):
            spec = np.asarray(codec.mdct.transform(w[:, 256:-256]))
            e_dec = (spec[:, :, bs:, :] ** 2).sum(axis=2)
            e_ref = (ref ** 2).sum(axis=2)
            return np.abs(
                10 * np.log10((e_dec + 1e-12) / (e_ref + 1e-12))
            ).mean()

        def snr(w):
            rec = np.asarray(w)[:, 256:-256]
            o = np.asarray(signal)
            return 10 * np.log10(
                (o ** 2).sum() / max(((o - rec) ** 2).sum(), 1e-30)
            )

        assert band_err(w_off) > 20.0  # holes without fill
        assert band_err(w_nf) < 5.0  # envelope restored
        assert snr(w_off) - snr(w_nf) < 3.0  # bounded SNR cost

    def test_tns_nf_combination(self, codec, signal):
        frames = codec.mdct.transform(signal)
        codes, bark, tns_idx, nfl = codec.quantize_frames_tns(
            frames, threshold_scale=16.0, nf=True
        )
        w = codec.decode_bitstream(codes, bark, threshold_scale=16.0,
                                   tns_idx=tns_idx, nf_levels=nfl)
        assert np.isfinite(np.asarray(w)).all()
        assert nfl.shape == (1, frames.shape[1], 1)

    def test_container_round_trip(self, codec, signal):
        frames = codec.mdct.transform(signal)
        codes, bark, nfl = codec.quantize_frames(
            frames, threshold_scale=16.0, nf=True
        )
        data = bitstream.pack(
            np.asarray(codes), np.asarray(bark),
            sample_rate=44100, filters_n=256, bark_bands_n=32, alpha=0.6,
            window_type="vorbis", threshold_scale=16.0,
            nf_levels=np.asarray(nfl), nf_band_start=codec.nf_band_start,
            nf_seed=11,
        )
        c2, b2, meta = bitstream.unpack(data)
        assert np.array_equal(c2, np.asarray(codes))
        assert np.array_equal(meta["nf_levels"], np.asarray(nfl))
        assert meta["nf_band_start"] == codec.nf_band_start
        assert meta["nf_seed"] == 11
        w1 = codec.decode_bitstream(
            jnp.asarray(c2), jnp.asarray(b2, jnp.bfloat16),
            threshold_scale=16.0, nf_levels=jnp.asarray(meta["nf_levels"]),
            nf_band_start=meta["nf_band_start"], nf_seed=meta["nf_seed"],
        )
        w2 = codec.decode_bitstream(
            codes, bark, threshold_scale=16.0, nf_levels=nfl, nf_seed=11
        )
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_nf_off_containers_unchanged(self, codec, signal):
        """All-zero levels must not grow the container (byte-identical
        to an nf-less encode)."""
        frames = codec.mdct.transform(signal)
        codes, bark = codec.quantize_frames(frames)
        kw = dict(
            sample_rate=44100, filters_n=256, bark_bands_n=32, alpha=0.6,
            window_type="vorbis",
        )
        plain = bitstream.pack(np.asarray(codes), np.asarray(bark), **kw)
        zeros = np.zeros((1, codes.shape[1], 1), np.uint8)
        with_nf = bitstream.pack(
            np.asarray(codes), np.asarray(bark), nf_levels=zeros,
            nf_band_start=16, **kw
        )
        assert plain == with_nf


class TestStream:
    def test_acs_matches_monolithic(self, codec, signal, tmp_path):
        path = str(tmp_path / "n.acs")
        scale = 24.0
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=scale, nf=True)
        with sc.StreamReader(path) as r:
            assert r.meta["nf"] == {
                "band_start": codec.nf_band_start, "seed": 0
            }
            chunk = r.read_chunk(0)
            assert chunk.nfl is not None and chunk.nfl.shape == (8, 1)
        streamed = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)], axis=1
        )
        codes, bark, nfl = codec.quantize_frames(
            codec.mdct.transform(signal), threshold_scale=scale, nf=True
        )
        mono = np.asarray(codec.decode_bitstream(
            codes, bark, threshold_scale=scale, nf_levels=nfl
        ))
        np.testing.assert_allclose(streamed, mono, atol=1e-5)

    def test_seek_reproduces_fill_noise(self, codec, signal, tmp_path):
        path = str(tmp_path / "k.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=24.0, nf=True, nf_seed=5)
        full = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)], axis=1
        )
        seek = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path,
                                                     start_chunk=3)],
            axis=1,
        )
        np.testing.assert_allclose(
            seek, full[:, -seek.shape[1]:], atol=1e-5
        )

    def test_append_level_contract(self, codec, tmp_path):
        w = sc.StreamWriter(
            str(tmp_path / "c.acs"), sample_rate=44100, filters_n=256,
            bark_bands_n=32, alpha=0.6, window_type="vorbis", channels=1,
            nf=True, nf_band_start=16, nf_seed=0,
        )
        codes = np.zeros((4, 256, 1), np.int32)
        bark = np.zeros((4, 32, 1), np.float32).astype(jnp.bfloat16)
        with pytest.raises(ValueError, match="noise-fill levels"):
            w.append(codes, bark)  # header declares nf, levels missing
        w.append(codes, bark, nf_levels=np.zeros((4, 1), np.uint8))
        w.close()

    def test_header_validation(self, codec, tmp_path):
        import json
        import struct

        path = str(tmp_path / "bad.acs")
        w = sc.StreamWriter(
            path, sample_rate=44100, filters_n=256, bark_bands_n=32,
            alpha=0.6, window_type="vorbis", channels=1,
            nf=True, nf_band_start=16, nf_seed=0,
        )
        w.append(np.zeros((4, 256, 1), np.int32),
                 np.zeros((4, 32, 1), np.float32).astype(jnp.bfloat16),
                 nf_levels=np.zeros((4, 1), np.uint8))
        w.close()
        raw = open(path, "rb").read()
        hlen = struct.unpack("<I", raw[4:8])[0]
        meta = json.loads(raw[8 : 8 + hlen])
        meta["nf"]["band_start"] = -5  # negative = invalid
        bad = json.dumps(meta).encode()
        # pad to the original header length so every offset stays valid
        assert len(bad) <= hlen
        bad = bad + b" " * (hlen - len(bad))
        with open(str(tmp_path / "bad2.acs"), "wb") as f:
            f.write(raw[:8] + bad + raw[8 + hlen:])
        with pytest.raises(ValueError, match="nf"):
            sc.StreamReader(str(tmp_path / "bad2.acs"))


class TestRateControl:
    def test_rate_control_with_nf(self, codec, signal):
        from audiocodec_tpu import rate

        res = rate.encode_with_target_bitrate(
            codec, signal, 24.0, nf=True
        )
        assert res.nf_levels is not None
        assert res.nf_band_start == codec.nf_band_start
        codes, bark, meta = bitstream.unpack(res.packed)
        if meta["nf_levels"] is not None:  # all-zero levels are elided
            assert np.array_equal(meta["nf_levels"], res.nf_levels)
        w = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
            dz_recon=meta["dz_recon"],
            nf_levels=(None if meta["nf_levels"] is None
                       else jnp.asarray(meta["nf_levels"])),
            nf_band_start=meta["nf_band_start"] or None,
            nf_seed=meta["nf_seed"],
        )
        assert np.isfinite(np.asarray(w)).all()


class TestDtypes:
    """The fill must hold across the compute-dtype whitelist: f64 (x64
    test config — no silent narrowing) and bf16 (fast deployment)."""

    @pytest.mark.parametrize("dtype", ["float64", "bfloat16"])
    def test_round_trip_in_dtype(self, dtype):
        dt = jnp.dtype(dtype)
        codec = act.Codec.create(
            sample_rate=44100, filters_n=256, bark_bands_n=32,
            compute_dtype=dt,
        )
        rng = np.random.default_rng(5)
        t = np.arange(256 * 16) / 44100
        w = (0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * rng.standard_normal(t.size))
        x = jnp.asarray(w.astype(np.float64)[None, :, None], dtype=dt)
        frames = codec.mdct.transform(x)
        codes, bark, nfl = codec.quantize_frames(
            frames, threshold_scale=16.0, nf=True
        )
        assert nfl.dtype == jnp.uint8
        out = codec.decode_bitstream(
            codes, bark, threshold_scale=16.0, nf_levels=nfl
        )
        arr = np.asarray(out.astype(jnp.float32))
        assert out.dtype == dt
        assert np.isfinite(arr).all()
        # determinism holds in every dtype
        out2 = codec.decode_bitstream(
            codes, bark, threshold_scale=16.0, nf_levels=nfl
        )
        np.testing.assert_array_equal(arr, np.asarray(
            out2.astype(jnp.float32)
        ))
