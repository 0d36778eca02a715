"""Intensity stereo (intensity.py): gain grid, forced side-band
zeroing, projection analysis, decoder fill, nf/bwe exclusion, wire
format, stream chunking/seek, and rate-control integration."""

import numpy as np
import jax.numpy as jnp
import pytest

import audiocodec_tpu as act
from audiocodec_tpu import intensity as isx
from audiocodec_tpu import nf
from audiocodec_tpu import quantize as q
from audiocodec_tpu.io import bitstream
from audiocodec_tpu.io import stream_container as sc

F32 = jnp.float32
N = 256


@pytest.fixture(scope="module")
def codec():
    return act.Codec.create(
        sample_rate=44100, filters_n=N, bark_bands_n=32,
        compute_dtype=F32,
    )


@pytest.fixture(scope="module")
def signal():
    """Hard-panned harmonic content above the crossover — the class
    intensity coding exists for — over a shared (centered) bass."""
    rng = np.random.default_rng(11)
    t = np.arange(N * 48) / 44100
    bass = 0.3 * np.sin(2 * np.pi * 220 * t)
    left = sum(0.2 / k * np.sin(2 * np.pi * 6100 * k * t)
               for k in (1, 2, 3))
    right = 0.25 * np.sin(2 * np.pi * 9800 * t)
    amb = 0.01 * rng.standard_normal((2, t.size))
    L = bass + 1.0 * left + 0.2 * right + amb[0]
    R = bass + 0.25 * left + 0.9 * right + amb[1]
    x = np.stack([L, R], axis=-1).astype(np.float32)
    return jnp.asarray(x[None])


def _pack_kw(codec):
    return dict(
        sample_rate=44100, filters_n=N, bark_bands_n=32,
        alpha=codec.psycho.alpha, window_type="vorbis", ms=True,
        sidecar_grid=codec.sidecar_grid,
    )


class TestGrid:
    def test_default_start_legal(self):
        for n, sr in ((256, 44100), (1024, 44100), (1024, 16000),
                      (64, 16000), (512, 48000)):
            isx.validate_start(n, isx.default_start(n, sr))

    def test_gain_grid_round_trip_signed(self):
        # every usable wire byte maps to a distinct signed amplitude,
        # and the analyzer's quantization is its own fixed point
        for sign in (1.0, -1.0):
            for lvl in (1, 40, 64, 88, isx.LEVEL_MAX):
                g = sign * 2.0 ** ((lvl - isx.LEVEL_BIAS) / isx.LEVEL_K)
                byte = lvl + (128 if sign < 0 else 0)
                amp = float(isx.gain_to_amp(
                    jnp.asarray([byte], jnp.uint8), np.dtype(np.float32)
                )[0])
                assert amp == pytest.approx(g, rel=1e-6)
        assert float(isx.gain_to_amp(
            jnp.asarray([0], jnp.uint8), np.dtype(np.float32)
        )[0]) == 0.0

    def test_gain_ceiling_bounds_injection(self):
        # levels past LEVEL_MAX (never produced by analyze) decode as
        # the GAIN_CEIL — a corrupt container cannot inject a blast
        for byte in (isx.LEVEL_MAX + 1, 127, 127 + 128):
            amp = float(isx.gain_to_amp(
                jnp.asarray([byte], jnp.uint8), np.dtype(np.float32)
            )[0])
            assert abs(amp) == pytest.approx(isx.GAIN_CEIL, rel=1e-6)

    def test_owned_mask(self):
        m = isx.owned_mask(N, 128)
        assert m.shape == (N, 2)
        assert not m[:, 0].any()          # mid never owned
        assert not m[:128, 1].any()       # below crossover untouched
        assert m[128:, 1].all()

    def test_validate_rejects(self):
        for bad in (0, 8, 250, N, N + 16, 100):
            with pytest.raises(ValueError):
                isx.validate_start(N, bad)


class TestForceCodes:
    def test_zeroes_owned_region_only(self):
        rng = np.random.default_rng(0)
        codes = jnp.asarray(
            rng.integers(-5, 6, size=(1, 4, N, 2)).astype(np.int32)
        )
        out = np.asarray(isx.force_codes(codes, 128))
        assert (out[..., 128:, 1] == 0).all()
        np.testing.assert_array_equal(out[..., :128, :],
                                      np.asarray(codes)[..., :128, :])
        np.testing.assert_array_equal(out[..., 0],
                                      np.asarray(codes)[..., 0])

    def test_short_blockswitch_frames_keep_codes(self):
        rng = np.random.default_rng(1)
        codes = jnp.asarray(
            rng.integers(1, 6, size=(1, 4, N, 2)).astype(np.int32)
        )
        bs = jnp.asarray([[False, True, False, True]])
        out = np.asarray(isx.force_codes(codes, 128, bs))
        assert (out[:, 0, 128:, 1] == 0).all()
        assert (out[:, 1, 128:, 1] != 0).all()  # short frame untouched

    def test_mono_rejected(self):
        codes = jnp.zeros((1, 2, N, 1), jnp.int32)
        with pytest.raises(ValueError, match="2 channels"):
            isx.force_codes(codes, 128)


class TestAnalyzeFill:
    def _setup(self, pan):
        """Mid with structure; side = pan * mid exactly (level-panned
        content in the rotated domain)."""
        rng = np.random.default_rng(3)
        mid = rng.normal(size=(1, 6, N)).astype(np.float32) * 4.0
        spec = np.stack([mid, pan * mid], axis=-1)
        delta = np.full(spec.shape, 0.25, np.float32)
        spec_j = jnp.asarray(spec)
        codes, d = q.quantize(spec_j, jnp.asarray(delta) * np.sqrt(3.0))
        codes = isx.force_codes(codes, 128)
        return spec_j, codes, d

    @pytest.mark.parametrize("pan", [0.5, -0.7, 1.0])
    def test_panned_side_restored(self, pan):
        spec, codes, delta = self._setup(pan)
        gains = isx.analyze(spec, codes, delta, 128)
        filled = np.asarray(isx.fill(
            q.dequantize(codes, delta, dtype=jnp.float32),
            codes, delta, gains, 128,
        ))
        mid_hat = np.asarray(codes)[..., 0] * np.asarray(delta)[..., 0]
        want = pan * mid_hat[..., 128:]
        got = filled[..., 128:, 1]
        # gains are on a 1.5 dB grid: the rebuilt side must match the
        # pan model within one grid step everywhere the mid is live
        live = np.abs(mid_hat[..., 128:]) > 0
        ratio = got[live] / want[live]
        assert np.all(ratio > 2 ** (-1 / isx.LEVEL_K) * 0.999)
        assert np.all(ratio < 2 ** (1 / isx.LEVEL_K) * 1.001)

    def test_silent_mid_transmits_zero(self):
        spec = jnp.zeros((1, 2, N, 2), F32)
        codes = jnp.zeros((1, 2, N, 2), jnp.int32)
        delta = jnp.ones((1, 2, N, 2), F32)
        gains = isx.analyze(spec, codes, delta, 128)
        assert int(np.asarray(gains).max()) == 0

    def test_decorrelated_side_projects_to_zero(self):
        rng = np.random.default_rng(4)
        mid = rng.normal(size=(1, 4, N)).astype(np.float32)
        side = rng.normal(size=(1, 4, N)).astype(np.float32)
        spec = jnp.asarray(np.stack([mid, side], axis=-1))
        delta = jnp.full((1, 4, N, 2), 0.1, F32)
        codes = isx.force_codes(
            q.quantize(spec, delta * np.sqrt(3.0))[0], 128
        )
        gains = isx.analyze(spec, codes, delta, 128)
        amps = np.abs(np.asarray(
            isx.gain_to_amp(gains, np.dtype(np.float32))
        ))
        # random projections over 16-bin groups concentrate near 0
        assert np.median(amps) < 0.5

    def test_nonzero_side_codes_pass_through(self):
        """fill only writes zero-coded bins — transmitted side detail
        survives."""
        rng = np.random.default_rng(5)
        codes = np.zeros((1, 2, N, 2), np.int32)
        codes[0, :, 130, 1] = 7  # one live side bin above the crossover
        codes[0, :, 128:, 0] = rng.integers(1, 5, (2, N - 128))
        codes = jnp.asarray(codes)
        delta = jnp.ones((1, 2, N, 2), F32)
        gains = jnp.full((1, 2, (N - 128) // 16), 64, jnp.uint8)
        spec = q.dequantize(codes, delta, dtype=jnp.float32)
        filled = np.asarray(isx.fill(spec, codes, delta, gains, 128))
        assert filled[0, 0, 130, 1] == 7.0


class TestExclusion:
    def test_nf_excludes_owned_band(self, codec, signal):
        """With intensity active the noise fill must neither METER the
        forced side band nor WRITE noise into it."""
        frames = codec.mdct.transform(signal)
        enc = codec.encode_frames(frames, threshold_scale=8.0, ms=True,
                                  nf=True, intensity=True)
        thr = codec._ms_threshold(enc.bark16) * jnp.asarray(8.0, F32)
        delta = q.step_size(thr)
        spec = q.dequantize(enc.codes, delta, dtype=F32)
        filled = nf.fill(
            spec, enc.codes, delta, enc.nf_levels,
            codec.nf_band_start, 0,
            exclude=jnp.asarray(isx.owned_mask(N, codec.is_start)),
        )
        d = np.asarray(filled) - np.asarray(spec)
        assert (d[..., codec.is_start:, 1] == 0).all()

    def test_decode_matches_manual_composition(self, codec, signal):
        frames = codec.mdct.transform(signal)
        enc = codec.encode_frames(frames, threshold_scale=8.0, ms=True,
                                  nf=True, intensity=True)
        y = codec.decode_bitstream_ms(
            enc.codes, enc.bark16, threshold_scale=8.0,
            nf_levels=enc.nf_levels, is_gains=enc.is_gains,
        )
        assert bool(jnp.isfinite(y).all())


class TestCodecIntegration:
    # scale 2: the module fixture is only ~0.28 s, and at coarser
    # scales the side band above the crossover quantizes mostly to
    # zero on its own — the zip-member overhead of isg/ismeta then
    # cancels the saving (measured 6506 vs 6509 B at scale 6; 6.7%
    # saved at scale 2, 7-12% on 4x longer clips at either scale)
    SCALE = 2.0

    def test_requires_ms(self, codec, signal):
        with pytest.raises(ValueError, match="ms=True"):
            codec.encode_frames(codec.mdct.transform(signal),
                                intensity=True)

    def test_bytes_saved_and_image_kept(self, codec, signal):
        frames = codec.mdct.transform(signal)
        kw = _pack_kw(codec)
        enc0 = codec.encode_frames(frames, threshold_scale=self.SCALE,
                                   ms=True)
        p0 = bitstream.pack(np.asarray(enc0.codes),
                            np.asarray(enc0.bark16),
                            threshold_scale=self.SCALE, **kw)
        enc1 = codec.encode_frames(frames, threshold_scale=self.SCALE,
                                   ms=True, intensity=True)
        p1 = bitstream.pack(np.asarray(enc1.codes),
                            np.asarray(enc1.bark16),
                            threshold_scale=self.SCALE,
                            is_gains=np.asarray(enc1.is_gains),
                            is_start=codec.is_start, **kw)
        assert len(p1) < len(p0)  # the point: side bits -> pan gains

        st = codec.is_start
        y = codec.decode_bitstream_ms(enc1.codes, enc1.bark16,
                                      threshold_scale=self.SCALE,
                                      is_gains=enc1.is_gains)
        ref = np.asarray(signal)
        yn = np.asarray(y)[:, N:-N]
        def side_band(w):
            f = codec.mdct.transform(jnp.asarray(w.astype(np.float32)))
            return np.asarray(codec.to_mid_side(f))[..., st:, 1]
        s_ref = side_band(ref[:, : yn.shape[1]])
        s_got = side_band(yn)
        corr = (s_ref * s_got).sum() / np.sqrt(
            (s_ref ** 2).sum() * (s_got ** 2).sum() + 1e-30
        )
        assert corr > 0.9  # the rebuilt image tracks the original

    def test_bwe_composition_keeps_image_above_crossover(self, codec):
        """With bwe active both sides project/scale the bwe-RECONSTRUCTED
        mid: above bwe_start the plain codes*delta mid is ~0, and without
        the shared reference the top band's image collapses to center."""
        # panned tone ABOVE the bwe crossover; aggressive scale zeroes
        # its codes so bwe must rebuild the mid there
        sr = 44100
        bstart = codec.bwe_start  # 176 for N=256 @ 44.1k
        f_hi = (bstart + 24) * sr / (2 * N)
        t = np.arange(N * 48) / sr
        rng = np.random.default_rng(8)
        base = sum(0.25 / k * np.sin(2 * np.pi * 1000 * k * t)
                   for k in range(1, 9))
        hi = 0.2 * np.sin(2 * np.pi * f_hi * t)
        L = (base + 1.0 * hi + 0.01 * rng.standard_normal(t.size))
        R = (base + 0.25 * hi + 0.01 * rng.standard_normal(t.size))
        x = jnp.asarray(np.stack([L, R], -1).astype(np.float32)[None])
        frames = codec.mdct.transform(x)
        enc = codec.encode_frames(frames, threshold_scale=24.0, ms=True,
                                  bwe=True, intensity=True)
        # the high tone's codes must actually be zeroed for this test
        # to exercise the composition
        hi_bin = bstart + 24
        assert (np.asarray(enc.codes)[..., hi_bin - 2 : hi_bin + 3, :]
                == 0).any()
        y = codec.decode_bitstream_ms(
            enc.codes, enc.bark16, threshold_scale=24.0,
            bwe_gains=enc.bwe_gains, is_gains=enc.is_gains,
        )
        yn = np.asarray(y)[:, N:-N]
        ref = np.asarray(x)[:, : yn.shape[1]]

        def side_top(w):
            f = codec.mdct.transform(jnp.asarray(w.astype(np.float32)))
            return np.asarray(codec.to_mid_side(f))[..., bstart:, 1]

        s_ref = side_top(ref)
        s_got = side_top(yn)
        # the rebuilt top-band side must carry real, correlated energy
        # (without the shared mid reference it measures ~0)
        e = (s_got ** 2).sum() / ((s_ref ** 2).sum() + 1e-30)
        corr = (s_ref * s_got).sum() / np.sqrt(
            (s_ref ** 2).sum() * (s_got ** 2).sum() + 1e-30
        )
        assert e > 0.25
        assert corr > 0.6

    def test_full_ladder_finite(self, codec, signal):
        frames = codec.mdct.transform(signal)
        enc = codec.encode_frames(
            frames, threshold_scale=self.SCALE, ms=True, tns=True,
            nf=True, bwe=True, bs=True, tmask=130.0, intensity=True,
        )
        y = codec.decode_bitstream_ms(
            enc.codes, enc.bark16, threshold_scale=self.SCALE,
            tns_idx=enc.tns_idx, nf_levels=enc.nf_levels,
            bs_flags=enc.bs_flags, bwe_gains=enc.bwe_gains,
            is_gains=enc.is_gains,
        )
        assert bool(jnp.isfinite(y).all())


class TestWire:
    SCALE = 6.0

    def _encode(self, codec, signal):
        return codec.encode_frames(codec.mdct.transform(signal),
                                   threshold_scale=self.SCALE, ms=True,
                                   intensity=True)

    def test_acz_round_trip_bit_exact(self, codec, signal):
        enc = self._encode(codec, signal)
        p = bitstream.pack(
            np.asarray(enc.codes), np.asarray(enc.bark16),
            threshold_scale=self.SCALE,
            is_gains=np.asarray(enc.is_gains),
            is_start=codec.is_start, **_pack_kw(codec),
        )
        codes2, bark2, meta = bitstream.unpack(p)
        assert meta["is_start"] == codec.is_start
        np.testing.assert_array_equal(np.asarray(enc.codes), codes2)
        np.testing.assert_array_equal(np.asarray(enc.is_gains),
                                      meta["is_gains"])
        y0 = codec.decode_bitstream_ms(enc.codes, enc.bark16,
                                       threshold_scale=self.SCALE,
                                       is_gains=enc.is_gains)
        y1 = codec.decode_bitstream_ms(
            jnp.asarray(codes2), jnp.asarray(bark2, jnp.bfloat16),
            threshold_scale=self.SCALE,
            is_gains=jnp.asarray(meta["is_gains"]),
            is_start=meta["is_start"],
        )
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def test_isg_without_ms_rejected(self, codec, signal):
        enc = self._encode(codec, signal)
        kw = _pack_kw(codec)
        kw["ms"] = False
        with pytest.raises(ValueError, match="ms=True"):
            bitstream.pack(
                np.asarray(enc.codes), np.asarray(enc.bark16),
                threshold_scale=self.SCALE,
                is_gains=np.asarray(enc.is_gains),
                is_start=codec.is_start, **kw,
            )

    def test_corrupt_members_rejected(self, codec, signal):
        import io as _io
        import zipfile

        enc = self._encode(codec, signal)
        p = bitstream.pack(
            np.asarray(enc.codes), np.asarray(enc.bark16),
            threshold_scale=self.SCALE,
            is_gains=np.asarray(enc.is_gains),
            is_start=codec.is_start, **_pack_kw(codec),
        )
        src = zipfile.ZipFile(_io.BytesIO(p))

        def tamper(name, arr):
            buf = _io.BytesIO()
            with zipfile.ZipFile(buf, "w") as dst:
                for nm in src.namelist():
                    data = src.read(nm)
                    if nm == name:
                        a = _io.BytesIO()
                        np.save(a, arr)
                        data = a.getvalue()
                    dst.writestr(nm, data)
            return buf.getvalue()

        # wrong group width, illegal start, wrong gains shape
        with pytest.raises(ValueError):
            bitstream.unpack(tamper(
                "ismeta.npy", np.asarray([codec.is_start, 8], np.int64)
            ))
        with pytest.raises(ValueError):
            bitstream.unpack(tamper(
                "ismeta.npy", np.asarray([13, 16], np.int64)
            ))
        with pytest.raises(ValueError):
            bitstream.unpack(tamper(
                "isg.npy", np.zeros((1, 2, 3), np.uint8)
            ))

    def test_acs_matches_acz_and_seeks(self, codec, signal, tmp_path):
        path = str(tmp_path / "i.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=self.SCALE, ms=True,
                         intensity=True)
        with sc.StreamReader(path) as r:
            assert r.meta["isf"]["start"] == codec.is_start
            c0 = r.read_chunk(0)
            assert c0.isg is not None and c0.isg.dtype == np.uint8
        streamed = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )
        enc = self._encode(codec, signal)
        mono = codec.decode_bitstream_ms(enc.codes, enc.bark16,
                                         threshold_scale=self.SCALE,
                                         is_gains=enc.is_gains)
        np.testing.assert_allclose(streamed, np.asarray(mono),
                                   atol=1e-5)
        part = np.concatenate(
            [np.asarray(c)
             for c in sc.decode_stream(codec, path, start_chunk=1)],
            axis=1,
        )
        np.testing.assert_allclose(
            part, streamed[:, streamed.shape[1] - part.shape[1]:],
            atol=1e-6,
        )

    def test_stream_header_validation(self, codec, signal, tmp_path):
        import json
        import struct

        path = str(tmp_path / "h.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=self.SCALE, ms=True,
                         intensity=True)
        raw = open(path, "rb").read()
        (hlen,) = struct.unpack("<I", raw[4:8])
        header = json.loads(raw[8 : 8 + hlen])
        for mutate in (
            lambda m: m.__setitem__("isf", {"start": 13, "group": 16}),
            lambda m: m.__setitem__(
                "isf", {"start": codec.is_start, "group": 8}),
            lambda m: m.__setitem__("isf", "bogus"),
            lambda m: m.__setitem__("ms", False),
        ):
            m = dict(header)
            mutate(m)
            hdr = json.dumps(m).encode()
            blob = raw[:4] + struct.pack("<I", len(hdr)) + hdr
            blob += raw[8 + hlen:]
            p2 = str(tmp_path / "h2.acs")
            open(p2, "wb").write(blob)
            with pytest.raises(ValueError):
                sc.StreamReader(p2)


class TestRateControl:
    def test_rate_search_carries_gains(self, codec):
        from audiocodec_tpu import rate

        # the module fixture is ~0.28 s — container overhead alone puts
        # its floor above 100 kbps, so rate control needs a longer clip
        # for a 48 kbps stereo target to be reachable at all
        rng = np.random.default_rng(17)
        t = np.arange(N * 480) / 44100
        mono = sum(0.3 / k * np.sin(2 * np.pi * 330 * k * t)
                   for k in range(1, 40))
        mono += 0.02 * rng.standard_normal(t.size)
        mono = 0.5 * mono / np.abs(mono).max()
        x = np.stack([mono, 0.4 * mono], axis=-1).astype(np.float32)
        signal = jnp.asarray(x[None])
        res = rate.encode_with_target_bitrate(
            codec, signal, 48.0, ms=True, intensity=True,
            tolerance=0.1,
        )
        assert res.is_gains is not None
        assert res.is_start == codec.is_start
        codes, bark, meta = bitstream.unpack(res.packed)
        assert meta["is_gains"] is not None
        assert (np.asarray(codes)[..., codec.is_start:, 1] == 0).all()
        assert abs(res.kbps - 48.0) < 0.2 * 48.0

    def test_requires_ms(self, codec, signal):
        from audiocodec_tpu import rate

        with pytest.raises(ValueError, match="ms"):
            rate.encode_with_target_bitrate(
                codec, signal, 48.0, intensity=True
            )
