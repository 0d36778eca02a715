"""Block switching (blockswitch.py): the orthogonal long<->short basis
change, transient detection, threshold pooling, and the property the
feature exists for — time-localized quantization noise (pre-echo)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import audiocodec_tpu as act
from audiocodec_tpu import blockswitch as bs
from audiocodec_tpu.mdct import MDCT

F32 = jnp.float32
F64 = jnp.float64


class TestBasis:
    def test_transition_matrix_is_orthogonal(self):
        for n, factor in ((64, 8), (256, 8), (1024, 8), (256, 4)):
            t = bs._transition_matrix_f64(n, factor)
            np.testing.assert_allclose(
                t @ t.T, np.eye(n), atol=1e-12
            )

    def test_rejects_indivisible(self):
        with pytest.raises(ValueError):
            bs._transition_matrix_f64(100, 8)

    def test_split_merge_roundtrip_f64(self):
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.normal(size=(2, 9, 64, 2)))
        flags = jnp.asarray(rng.random((2, 9)) > 0.5)
        back = bs.merge_spectrum(bs.split_spectrum(y, flags), flags)
        np.testing.assert_allclose(np.asarray(back), np.asarray(y),
                                   atol=1e-12)

    def test_split_merge_roundtrip_f32(self):
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.normal(size=(1, 7, 256, 1)), dtype=F32)
        flags = jnp.asarray(rng.random((1, 7)) > 0.5)
        back = bs.merge_spectrum(bs.split_spectrum(y, flags), flags)
        np.testing.assert_allclose(np.asarray(back), np.asarray(y),
                                   atol=1e-5)

    def test_long_frames_pass_through_bitexact(self):
        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.normal(size=(1, 5, 64, 1)), dtype=F32)
        flags = jnp.zeros((1, 5), dtype=bool)
        out = bs.split_spectrum(y, flags)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(y))

    def test_energy_preserved(self):
        """T orthogonal => per-frame energy identical in either basis."""
        rng = np.random.default_rng(3)
        y = jnp.asarray(rng.normal(size=(1, 6, 128, 1)))
        flags = jnp.ones((1, 6), dtype=bool)
        sw = bs.split_spectrum(y, flags)
        np.testing.assert_allclose(
            np.sum(np.asarray(sw) ** 2, axis=2),
            np.sum(np.asarray(y) ** 2, axis=2),
            rtol=1e-12,
        )

    def test_short_basis_localizes_folded_segments(self):
        """Sub-spectrum s of a short frame depends ONLY on segment s of
        the folded frame: a frame whose long spectrum encodes an impulse
        in folded-segment s has all its short-basis energy in sub-block
        s."""
        n, factor = 64, 8
        m = n // factor
        o_n = bs._dct.dct4_matrix(n)
        for s in (0, 3, 7):
            f = np.zeros((1, 1, n, 1))
            f[0, 0, s * m + 2, 0] = 1.0  # impulse in folded segment s
            y_long = jnp.asarray(np.einsum("bfnc,nk->bfkc", f, o_n))
            sw = np.asarray(bs.split_spectrum(
                y_long, jnp.ones((1, 1), dtype=bool)
            ))
            e = (sw.reshape(factor, m) ** 2).sum(axis=1)
            assert e[s] / e.sum() > 0.999


class TestDetect:
    def make(self, kind, n=256, frames=16, sr=44100):
        rng = np.random.default_rng(4)
        t = np.arange(frames * n) / sr
        if kind == "tone":
            x = 0.5 * np.sin(2 * np.pi * 441 * t)
        elif kind == "noise":
            x = 0.3 * rng.standard_normal(t.size)
        else:  # click at a known sample
            x = 0.02 * np.sin(2 * np.pi * 330 * t)
            x[5 * n + n // 2] += 0.9
        return jnp.asarray(x.astype(np.float32)[None, :, None])

    def test_stationary_fires_at_most_at_the_edges(self):
        """Detection is a pure per-frame function (chunk-parity); the
        zero-padded boundary frames may legitimately read as attacks,
        but no interior frame of stationary content ever fires."""
        mdct = MDCT.create(256)
        for kind in ("tone", "noise"):
            y = mdct.transform(self.make(kind))
            flags = np.asarray(bs.detect(y))
            assert not flags[:, 1:-1].any(), kind

    def test_click_fires_near_the_attack(self):
        mdct = MDCT.create(256)
        y = mdct.transform(self.make("click"))
        flags = np.asarray(bs.detect(y))[0]
        # the click at block 5 lands in frames 5 and/or 6 (each frame
        # spans blocks k-1..k)
        assert flags[5] or flags[6]
        # and no interior frame far from it (edges are structural)
        assert not flags[1:4].any() and not flags[8:-1].any()

    def test_silence_never_fires(self):
        mdct = MDCT.create(256)
        x = jnp.zeros((1, 16 * 256, 1), dtype=F32)
        flags = np.asarray(bs.detect(mdct.transform(x)))
        assert not flags.any()

    def test_chunk_parity_of_flags(self):
        """detect() is a pure per-frame function: evaluating it on any
        frame slice gives the slice of the whole-signal flags — even
        when the chunk's loudness distribution differs wildly from the
        file's (the loud gate must be ABSOLUTE, not batch-relative)."""
        mdct = MDCT.create(256)
        rng = np.random.default_rng(13)
        n = 256 * 24
        x = 0.5 * rng.standard_normal(n).astype(np.float32)  # loud half
        quiet = 2e-6 * rng.standard_normal(n).astype(np.float32)
        quiet[n // 2 : n // 2 + 64] += 2e-4  # contrasty but inaudible
        sig = np.concatenate([x, quiet])
        y = mdct.transform(jnp.asarray(sig[None, :, None]))
        whole = np.asarray(bs.detect(y))[0]
        for split in (8, 24, 40):
            a = np.asarray(bs.detect(y[:, :split]))[0]
            b = np.asarray(bs.detect(y[:, split:]))[0]
            np.testing.assert_array_equal(
                np.concatenate([a, b]), whole, err_msg=f"split={split}"
            )


class TestThresholdPool:
    def test_min_pooled_conservative(self):
        """Min pooling: every short-basis bin's threshold is the MIN of
        its group — noise stays below every covered band's own
        threshold (never above, the conservative direction)."""
        rng = np.random.default_rng(5)
        thr = jnp.asarray(10.0 ** rng.uniform(-6, 0, (2, 4, 64, 2)))
        flags = jnp.asarray([[True, False, True, True],
                             [False, True, False, True]])
        pooled = np.asarray(bs.pool_threshold(thr, flags))
        t = np.asarray(thr)
        grouped = t.reshape(2, 4, 8, 8, 2).min(axis=3)  # [B,F,M,C]
        expect = np.tile(grouped, (1, 1, 8, 1))
        sel = np.asarray(flags)
        np.testing.assert_array_equal(pooled[sel], expect[sel])
        # short-basis bin (s, j) sits at frequency group j: its pooled
        # threshold never exceeds ANY member of that group
        m = 64 // 8
        short = pooled[sel].reshape(-1, 8, m, 2)  # [rows, s, j, C]
        groups = t[sel].reshape(-1, m, 8, 2)  # [rows, j, i, C]
        assert (
            short <= groups.min(axis=2)[:, None] + 1e-300
        ).all()

    def test_long_rows_untouched(self):
        rng = np.random.default_rng(6)
        thr = jnp.asarray(rng.uniform(0.1, 1, (1, 3, 32, 1)))
        flags = jnp.asarray([[False, True, False]])
        pooled = np.asarray(bs.pool_threshold(thr, flags))
        np.testing.assert_array_equal(pooled[0, 0], np.asarray(thr)[0, 0])
        np.testing.assert_array_equal(pooled[0, 2], np.asarray(thr)[0, 2])

    def test_pooled_rows_tile_per_subblock(self):
        rng = np.random.default_rng(7)
        thr = jnp.asarray(rng.uniform(0.1, 1, (1, 1, 64, 1)))
        flags = jnp.ones((1, 1), dtype=bool)
        pooled = np.asarray(bs.pool_threshold(thr, flags))[0, 0, :, 0]
        m = 64 // 8
        for s in range(1, 8):
            np.testing.assert_array_equal(pooled[s * m : (s + 1) * m],
                                          pooled[:m])


class TestFlagsWire:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(8)
        for frames in (1, 7, 8, 9, 33):
            flags = rng.random((3, frames)) > 0.5
            bits = bs.pack_flags(flags)
            assert bits.dtype == np.uint8
            back = bs.unpack_flags(bits, frames)
            np.testing.assert_array_equal(back, flags)

    def test_unpack_short_bitmap_raises(self):
        with pytest.raises(ValueError):
            bs.unpack_flags(np.zeros((1, 1), np.uint8), 9)



class TestPreEcho:
    def test_short_basis_localizes_quantization_noise(self):
        """The reason this module exists: uniform quantization noise in
        the short basis stays near the attack; in the long basis it
        smears over the whole frame span (pre-echo). Measured through
        the REAL inverse transform."""
        n, sr = 256, 44100
        mdct = MDCT.create(n, compute_dtype=F64)
        rng = np.random.default_rng(9)
        frames_n = 16
        x = np.zeros(frames_n * n)
        click_at = 5 * n + n // 2
        x[click_at : click_at + 40] = 0.9 * np.exp(
            -np.arange(40) / 8.0
        ) * rng.standard_normal(40)
        xs = jnp.asarray(x[None, :, None])
        y = mdct.transform(xs)
        flags = bs.detect(y)
        assert np.asarray(flags).any()

        def roundtrip(spec_q, flags_used):
            merged = bs.merge_spectrum(spec_q, flags_used)
            out = mdct.inverse_transform(merged)[:, n:-n]
            return np.asarray(out)[0, :, 0]

        step = 0.003

        def quantize(spec):
            return jnp.round(spec / step) * step

        # long-basis quantization
        out_long = roundtrip(quantize(y), jnp.zeros_like(flags))
        # short-basis quantization on detected frames
        out_short = roundtrip(quantize(bs.split_spectrum(y, flags)),
                              flags)
        # noise BEFORE the click. Short-basis noise is confined to the
        # click's own folded segments (~2M = 64 output samples), so the
        # window ending 2M before the attack must be nearly clean, and
        # even the window running right up to the attack (which includes
        # that irreducible segment) must improve strongly.
        w = int(0.008 * sr)
        m2 = 2 * (n // 8)

        def pre_energy(out, gap):
            pre = slice(click_at - w - gap, click_at - gap)
            return ((out[pre] - x[pre]) ** 2).sum()

        assert pre_energy(out_short, m2) < pre_energy(out_long, m2) / 30
        assert pre_energy(out_short, 8) < pre_energy(out_long, 8) / 5
        # and the overall error budget did not blow up
        tot_long = ((out_long - x) ** 2).sum()
        tot_short = ((out_short - x) ** 2).sum()
        assert tot_short < 3 * tot_long


@pytest.fixture(scope="module")
def codec():
    return act.Codec.create(
        sample_rate=44100, filters_n=256, bark_bands_n=32,
        compute_dtype=F32,
    )


@pytest.fixture(scope="module")
def click_signal():
    rng = np.random.default_rng(10)
    n = 256 * 48
    t = np.arange(n) / 44100
    x = 0.02 * np.sin(2 * np.pi * 330 * t)
    x += 0.002 * rng.standard_normal(n)
    for s0 in (6 * 256, 20 * 256 + 64, 37 * 256 + 190):
        dt = np.arange(250)
        burst = np.exp(-dt / 40.0) * rng.standard_normal(250)
        x[s0 : s0 + 250] += 0.8 * burst / np.abs(burst).max()
    return jnp.asarray(x.astype(np.float32)[None, :, None])


class TestCodecIntegration:
    def test_flags_fire_on_clicks_only(self, codec, click_signal):
        frames = codec.mdct.transform(click_signal)
        enc = codec.encode_frames(frames, bs=True)
        flags = np.asarray(enc.bs_flags)[0]
        assert flags.any()
        # every fired INTERIOR frame is adjacent to a click block
        # (6, 20, 37); the zero-padded edge frames are structural
        fired = np.nonzero(flags[1:-1])[0] + 1
        assert len(fired) > 0
        assert all(
            min(abs(f - c) for c in (6, 20, 37)) <= 1 for f in fired
        )

    def test_roundtrip_decodes_and_helps_pre_echo(self, codec,
                                                  click_signal):
        n = 256
        frames = codec.mdct.transform(click_signal)
        base = codec.encode_frames(frames)
        out0 = np.asarray(codec.decode_bitstream(
            base.codes, base.bark16))[0, n:-n, 0]
        enc = codec.encode_frames(frames, bs=True)
        out1 = np.asarray(codec.decode_bitstream(
            enc.codes, enc.bark16, bs_flags=enc.bs_flags))[0, n:-n, 0]
        x = np.asarray(click_signal)[0, :, 0]
        # pre-echo: error in the 4 ms ending 64 samples before each click
        w = int(0.004 * 44100)

        def pre(out):
            return sum(
                ((out[s - w - 64 : s - 64] - x[s - w - 64 : s - 64]) ** 2)
                .sum()
                for s in (6 * 256, 20 * 256 + 64, 37 * 256 + 190)
            )

        assert pre(out1) < pre(out0) / 3, (pre(out0), pre(out1))
        # and overall quality stays comparable
        snr0 = 10 * np.log10((x**2).sum() / ((x - out0) ** 2).sum())
        snr1 = 10 * np.log10((x**2).sum() / ((x - out1) ** 2).sum())
        assert snr1 > snr0 - 3.0

    def test_bs_false_matches_no_bs_bitexact(self, codec, click_signal):
        frames = codec.mdct.transform(click_signal)
        a = codec.encode_frames(frames)
        b = codec.encode_frames(frames, bs=False)
        np.testing.assert_array_equal(np.asarray(a.codes),
                                      np.asarray(b.codes))

    def test_composes_with_tns_nf_tmask_deadzone(self, codec,
                                                 click_signal):
        frames = codec.mdct.transform(click_signal)
        enc = codec.encode_frames(
            frames, bs=True, tns=True, nf=True, tmask=130.0,
            deadzone=1.0,
        )
        assert enc.bs_flags is not None
        flags = np.asarray(enc.bs_flags)
        # short frames carry no TNS filter and no fill levels
        ti = np.asarray(enc.tns_idx)
        nfl = np.asarray(enc.nf_levels)
        assert (ti[flags] == 0).all()
        assert (nfl[flags] == 0).all()
        out = codec.decode_bitstream(
            enc.codes, enc.bark16, dz_recon=0.45, tns_idx=enc.tns_idx,
            nf_levels=enc.nf_levels, bs_flags=enc.bs_flags,
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_ms_stereo_roundtrip(self, codec):
        rng = np.random.default_rng(11)
        n = 256 * 16
        x = np.zeros((1, n, 2), np.float32)
        x[0, :, 0] = 0.01 * rng.standard_normal(n)
        x[0, :, 1] = x[0, :, 0] + 0.004 * rng.standard_normal(n)
        x[0, 5 * 256 + 100 : 5 * 256 + 260, 0] += 0.8
        xs = jnp.asarray(x)
        frames = codec.mdct.transform(xs)
        enc = codec.encode_frames(frames, ms=True, bs=True)
        assert np.asarray(enc.bs_flags).any()
        out = codec.decode_bitstream_ms(enc.codes, enc.bark16,
                                        bs_flags=enc.bs_flags)
        assert np.isfinite(np.asarray(out)).all()
        assert out.shape[2] == 2

    def test_decoder_without_flags_decodes_wrong(self, codec,
                                                 click_signal):
        """The flags are bitstream-critical: dropping them yields a
        DIFFERENT (worse) waveform — guards against silently ignoring
        the member."""
        frames = codec.mdct.transform(click_signal)
        enc = codec.encode_frames(frames, bs=True)
        n = 256
        x = np.asarray(click_signal)[0, :, 0]
        good = np.asarray(codec.decode_bitstream(
            enc.codes, enc.bark16, bs_flags=enc.bs_flags))[0, n:-n, 0]
        bad = np.asarray(codec.decode_bitstream(
            enc.codes, enc.bark16))[0, n:-n, 0]
        snr_good = 10 * np.log10((x**2).sum() / ((x - good) ** 2).sum())
        snr_bad = 10 * np.log10((x**2).sum() / ((x - bad) ** 2).sum())
        assert snr_good > snr_bad + 3.0


class TestDtypes:
    """bf16 and f64 pipelines: the basis change casts around its f32/f64
    matrix and must round-trip deterministically in each compute dtype
    (the same coverage contract the nf suite keeps)."""

    def test_bf16_pipeline(self):
        codec = act.Codec.create(
            44100, filters_n=256, bark_bands_n=32,
            compute_dtype=jnp.bfloat16,
        )
        rng = np.random.default_rng(30)
        x = 0.02 * rng.standard_normal(256 * 16).astype(np.float32)
        x[800:900] += 0.7
        xs = jnp.asarray(x[None, :, None], dtype=jnp.bfloat16)
        frames = codec.mdct.transform(xs)
        enc = codec.encode_frames(frames, bs=True)
        assert np.asarray(enc.bs_flags).any()
        out = codec.decode_bitstream(enc.codes, enc.bark16,
                                     bs_flags=enc.bs_flags)
        assert out.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(out, np.float32)).all()
        # deterministic: same input -> identical codes
        enc2 = codec.encode_frames(frames, bs=True)
        np.testing.assert_array_equal(np.asarray(enc.codes),
                                      np.asarray(enc2.codes))

    def test_f64_pipeline(self):
        codec = act.Codec.create(
            44100, filters_n=256, bark_bands_n=32,
            compute_dtype=jnp.float64,
        )
        rng = np.random.default_rng(31)
        x = 0.02 * rng.standard_normal(256 * 16)
        x[800:900] += 0.7
        xs = jnp.asarray(x[None, :, None], dtype=jnp.float64)
        frames = codec.mdct.transform(xs)
        enc = codec.encode_frames(frames, bs=True)
        assert np.asarray(enc.bs_flags).any()
        out = codec.decode_bitstream(enc.codes, enc.bark16,
                                     bs_flags=enc.bs_flags)
        assert out.dtype == jnp.float64
        w = x
        o = np.asarray(out)[0, 256:-256, 0]
        snr = 10 * np.log10((w**2).sum() / ((w - o) ** 2).sum())
        assert snr > 8.0


class TestContainers:
    def test_acz_roundtrip_carries_flags(self, codec, click_signal,
                                         tmp_path):
        from audiocodec_tpu.io import bitstream

        frames = codec.mdct.transform(click_signal)
        enc = codec.encode_frames(frames, bs=True)
        meta_kw = dict(
            sample_rate=44100, filters_n=256, bark_bands_n=32,
            alpha=codec.psycho.alpha, window_type="vorbis",
        )
        data = bitstream.pack(
            np.asarray(enc.codes), np.asarray(enc.bark16),
            bs_flags=np.asarray(enc.bs_flags), **meta_kw,
        )
        codes2, bark2, meta = bitstream.unpack(data)
        np.testing.assert_array_equal(meta["bs_flags"],
                                      np.asarray(enc.bs_flags))
        assert meta["bs_factor"] == bs.FACTOR
        direct = np.asarray(codec.decode_bitstream(
            enc.codes, enc.bark16, bs_flags=enc.bs_flags))
        via = np.asarray(codec.decode_bitstream(
            jnp.asarray(codes2), jnp.asarray(bark2, jnp.bfloat16),
            bs_flags=jnp.asarray(meta["bs_flags"])))
        np.testing.assert_array_equal(direct, via)

    def test_acz_no_flags_byte_identical(self, codec, click_signal):
        """bs-off containers must not grow a bsw member."""
        from audiocodec_tpu.io import bitstream

        frames = codec.mdct.transform(click_signal)
        c, b = codec.quantize_frames(frames)
        meta_kw = dict(
            sample_rate=44100, filters_n=256, bark_bands_n=32,
            alpha=codec.psycho.alpha, window_type="vorbis",
        )
        plain = bitstream.pack(np.asarray(c), np.asarray(b), **meta_kw)
        with_none = bitstream.pack(np.asarray(c), np.asarray(b),
                                   bs_flags=None, **meta_kw)
        allfalse = bitstream.pack(
            np.asarray(c), np.asarray(b),
            bs_flags=np.zeros(c.shape[:2], bool), **meta_kw,
        )
        assert plain == with_none == allfalse
        _, _, meta = bitstream.unpack(plain)
        assert meta["bs_flags"] is None

    def test_rate_control_with_bs(self, codec, click_signal):
        from audiocodec_tpu import rate as _rate
        from audiocodec_tpu.io import bitstream

        res = _rate.encode_with_target_bitrate(
            codec, click_signal, 96.0, tolerance=0.1, bs=True
        )
        assert res.bs_flags is not None and res.bs_flags.any()
        codes, bark, meta = bitstream.unpack(res.packed)
        np.testing.assert_array_equal(meta["bs_flags"], res.bs_flags)
        out = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, jnp.bfloat16),
            threshold_scale=res.threshold_scale,
            dz_recon=meta["dz_recon"],
            bs_flags=jnp.asarray(meta["bs_flags"]),
        )
        assert np.isfinite(np.asarray(out)).all()


class TestStream:
    def test_stream_codes_and_flags_match_batch(self, codec,
                                                click_signal, tmp_path):
        """Chunked encode == whole-file encode bit-exactly, including the
        flags (detection is a pure per-frame function)."""
        from audiocodec_tpu.io import stream_container as sc

        frames = codec.mdct.transform(click_signal)
        codes_b, bark_b, flags_b = codec.quantize_frames(frames, bs=True)
        path = str(tmp_path / "b.acs")
        sc.encode_stream(codec, click_signal, path, chunk_blocks=8,
                         bs=True)
        got_codes, got_flags = [], []
        with sc.StreamReader(path) as r:
            assert r.meta["bs"] == {"factor": bs.FACTOR}
            for k in range(r.n_chunks):
                c = r.read_chunk(k)
                got_codes.append(c.codes)
                got_flags.append(c.bsw)
        np.testing.assert_array_equal(
            np.concatenate(got_codes, axis=0), np.asarray(codes_b[0])
        )
        np.testing.assert_array_equal(
            np.concatenate(got_flags, axis=0), np.asarray(flags_b[0])
        )

    def test_stream_decode_matches_monolithic(self, codec, click_signal,
                                              tmp_path):
        from audiocodec_tpu.io import stream_container as sc

        path = str(tmp_path / "d.acs")
        sc.encode_stream(codec, click_signal, path, chunk_blocks=8,
                         bs=True)
        streamed = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )
        frames = codec.mdct.transform(click_signal)
        enc = codec.encode_frames(frames, bs=True)
        mono = np.asarray(codec.decode_bitstream(
            enc.codes, enc.bark16, bs_flags=enc.bs_flags))
        np.testing.assert_allclose(streamed, mono, atol=1e-5)

    def test_stream_seek_with_bs(self, codec, click_signal, tmp_path):
        from audiocodec_tpu.io import stream_container as sc

        path = str(tmp_path / "s.acs")
        sc.encode_stream(codec, click_signal, path, chunk_blocks=8,
                         bs=True)
        full = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )
        part = np.concatenate(
            [np.asarray(c)
             for c in sc.decode_stream(codec, path, start_chunk=2)],
            axis=1,
        )
        np.testing.assert_allclose(part, full[:, 16 * 256 :], atol=1e-6)

    def test_stream_composes_tns_nf(self, codec, click_signal, tmp_path):
        from audiocodec_tpu.io import stream_container as sc

        path = str(tmp_path / "c.acs")
        sc.encode_stream(codec, click_signal, path, chunk_blocks=8,
                         bs=True, tns=True, nf=True, nf_seed=3)
        out = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )
        frames = codec.mdct.transform(click_signal)
        enc = codec.encode_frames(frames, bs=True, tns=True, nf=True)
        ref = np.asarray(codec.decode_bitstream(
            enc.codes, enc.bark16, tns_idx=enc.tns_idx,
            nf_levels=enc.nf_levels, nf_seed=3, bs_flags=enc.bs_flags))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestCLIFlag:
    def test_cli_bs_roundtrip(self, tmp_path, capsys):
        import audiocodec_tpu.__main__ as cli
        from audiocodec_tpu.io import bitstream as _bitstream
        from audiocodec_tpu.io.wav import read_wav, write_wav

        rate = 16000
        rng = np.random.default_rng(12)
        x = 0.01 * rng.standard_normal(8 * 2048).astype(np.float32)
        x[4096:4196] += 0.8
        wav_path = str(tmp_path / "c.wav")
        write_wav(wav_path, np.clip(x, -1, 1)[:, None], rate)
        acz = str(tmp_path / "c.acz")
        assert cli.main(["encode", wav_path, acz,
                         "--filters-n", "256", "--bs"]) == 0
        _, _, meta = _bitstream.load(acz)
        assert meta["bs_flags"] is not None and meta["bs_flags"].any()
        rec = str(tmp_path / "c_rec.wav")
        assert cli.main(["decode", acz, rec]) == 0
        capsys.readouterr()
        y, _ = read_wav(rec)
        assert np.isfinite(y).all() and np.abs(y).max() > 0.05
