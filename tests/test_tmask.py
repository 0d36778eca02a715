"""Temporal (forward/post-)masking: the log-doubling decayed running max
(psycho.temporal_masking), its window accounting, codec integration, and
the streaming context carry that keeps .acs bit-identical to .acz."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import audiocodec_tpu as act
from audiocodec_tpu import psycho
from audiocodec_tpu.io import stream_container as sc

F32 = jnp.float32


def naive_tmask(intensity, decay_db_per_frame, window):
    """O(T*W) reference: I'_t = max_{0<=k<=W} lambda^k I_{t-k}."""
    lam = 10.0 ** (-decay_db_per_frame / 10.0)
    out = np.array(intensity, dtype=np.float64)
    src = np.array(intensity, dtype=np.float64)
    for t in range(src.shape[1]):
        for k in range(1, min(window, t) + 1):
            out[:, t] = np.maximum(out[:, t], (lam**k) * src[:, t - k])
    return out


class TestTemporalMasking:
    def test_matches_naive_reference(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            10.0 ** rng.uniform(-14, 2, (2, 37, 24, 3)), dtype=jnp.float64
        )
        decay = 2.7
        w = psycho.temporal_masking_window(decay)
        out = np.asarray(psycho.temporal_masking(x, decay))
        ref = naive_tmask(np.asarray(x), decay, w)
        np.testing.assert_allclose(out, ref, rtol=1e-12)

    def test_pointwise_dominates_input(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            10.0 ** rng.uniform(-14, 2, (1, 64, 24, 1)), dtype=jnp.float64
        )
        out = np.asarray(psycho.temporal_masking(x, 3.0))
        assert (out >= np.asarray(x) - 1e-300).all()

    def test_isolated_impulse_decays_exponentially(self):
        """A single loud frame's shadow is exactly lambda^k along the
        following frames (until other frames' floor wins)."""
        x = np.full((1, 20, 8, 1), 1e-14)
        x[0, 3] = 1.0
        decay = 3.0
        out = np.asarray(
            psycho.temporal_masking(jnp.asarray(x), decay)
        )
        w = psycho.temporal_masking_window(decay)
        lam = 10.0 ** (-decay / 10.0)
        for k in range(1, min(w, 16) + 1):
            np.testing.assert_allclose(
                out[0, 3 + k, :, 0], lam**k, rtol=1e-6
            )
        # outside the window the shadow is gone (horizon truncation)
        if 3 + w + 1 < 20:
            np.testing.assert_allclose(
                out[0, 3 + w + 1 :, :, 0], 1e-14, rtol=1e-6
            )

    def test_window_covers_horizon(self):
        """The doubling window always covers the 30 dB horizon."""
        for decay in (0.5, 1.0, 2.7, 3.0, 7.5, 31.0):
            w = psycho.temporal_masking_window(decay)
            assert decay * w >= 30.0 - decay  # >= ceil(30/decay)
            # and is of the exact doubling form 2^m - 1
            assert ((w + 1) & w) == 0

    def test_rejects_nonpositive_decay(self):
        with pytest.raises(ValueError):
            psycho.temporal_masking_window(0.0)
        with pytest.raises(ValueError):
            psycho.temporal_masking(jnp.ones((1, 4, 2, 1)), -1.0)

    def test_context_continuity(self):
        """Split processing with a carried context == whole-signal
        processing, bit-exactly, at any split point."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(
            10.0 ** rng.uniform(-14, 2, (1, 50, 16, 2)), dtype=jnp.float64
        )
        decay = 2.0
        w = psycho.temporal_masking_window(decay)
        whole = np.asarray(psycho.temporal_masking(x, decay))
        for split in (1, 7, 25, 49):
            a, b = x[:, :split], x[:, split:]
            out_a = psycho.temporal_masking(a, decay)
            ctx = a[:, max(0, split - w) :]
            out_b = psycho.temporal_masking(b, decay, context=ctx)
            got = np.concatenate(
                [np.asarray(out_a), np.asarray(out_b)], axis=1
            )
            np.testing.assert_array_equal(got, whole)

    def test_tiny_decay_is_bounded(self):
        """A near-zero decay implies an astronomical window; the
        log-doubling loop must cap its shifts at the frame count (a
        shift past the array is an exact no-op) instead of building
        2^1000-wide pads."""
        x = jnp.asarray(
            10.0 ** np.random.default_rng(3).uniform(-14, 0, (1, 16, 8, 1))
        )
        out = psycho.temporal_masking(x, 1e-12)  # window ~ 3e13
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        # decay ~0 over 16 frames: the spread is the running max
        ref = np.maximum.accumulate(np.asarray(x), axis=1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9)

    def test_context_rank_mismatch_raises(self):
        with pytest.raises(ValueError):
            psycho.temporal_masking(
                jnp.ones((1, 4, 2, 1)), 1.0, context=jnp.ones((4, 2, 1))
            )


@pytest.fixture(scope="module")
def codec():
    return act.Codec.create(
        sample_rate=44100, filters_n=256, bark_bands_n=32,
        compute_dtype=F32,
    )


@pytest.fixture(scope="module")
def transient(codec):
    """A loud attack followed by quiet decay — the case temporal masking
    exists for."""
    rng = np.random.default_rng(3)
    n = 256 * 64
    t = np.arange(n) / 44100
    x = 0.02 * np.sin(2 * np.pi * 330 * t)
    x += 0.004 * rng.standard_normal(n)
    burst = slice(4 * 256, 8 * 256)
    x[burst] += 0.9 * np.sin(2 * np.pi * 1000 * t[burst])
    return jnp.asarray(x.astype(np.float32)[None, :, None])


TMASK = 130.0  # dB/s; at N=256/44.1 kHz that is ~0.75 dB/frame


class TestCodecIntegration:
    def test_zero_tmask_is_identity(self, codec, transient):
        base = codec.encode_bitstream(transient)
        off = codec.encode_bitstream(transient, tmask=0.0)
        np.testing.assert_array_equal(
            np.asarray(base[0]), np.asarray(off[0])
        )
        np.testing.assert_array_equal(
            np.asarray(base[1], np.float32), np.asarray(off[1], np.float32)
        )

    def test_raises_thresholds_after_attack_only(self, codec, transient):
        """tmask raises the sidecar (never lowers it), and strictly after
        the burst — codes get smaller there, bits get cheaper."""
        codes0, bark0 = codec.encode_bitstream(transient)
        codes1, bark1 = codec.encode_bitstream(transient, tmask=TMASK)
        b0 = np.asarray(bark0, np.float32)
        b1 = np.asarray(bark1, np.float32)
        assert (b1 >= b0).all()
        assert (b1 > b0).any()
        # the first frame has no predecessors — never touched
        np.testing.assert_array_equal(b1[:, 0], b0[:, 0])
        # the burst's forward shadow dwarfs any background spread: the
        # largest post-burst raise is orders of magnitude above the
        # largest pre-burst raise (no backward masking of the burst)
        pre = (b1[:, 1:4] - b0[:, 1:4]).max()
        post = (b1[:, 8:12] - b0[:, 8:12]).max()
        assert post > 1e3 * max(pre, 1e-30)
        # fewer/equal quantization levels everywhere it acted
        c0 = np.abs(np.asarray(codes0))
        c1 = np.abs(np.asarray(codes1))
        assert c1.sum() < c0.sum()

    def test_decoder_needs_no_flag(self, codec, transient):
        """The tmask'd bitstream decodes with the plain decoder — the
        effect rides the sidecar, not the format."""
        codes, bark = codec.encode_bitstream(transient, tmask=TMASK)
        out = codec.decode_bitstream(codes, bark)
        # blocks+1 framing: N-sample padding on each end
        assert out.shape[1] == transient.shape[1] + 2 * 256
        rec = np.asarray(out)[:, 256:-256]
        orig = np.asarray(transient)
        snr = 10 * np.log10(
            (orig**2).sum() / ((orig - rec) ** 2).sum()
        )
        assert snr > 8.0  # still a sane codec, just coarser in shadows

    def test_saves_bits_on_transients(self, codec, transient):
        from audiocodec_tpu.io import bitstream

        meta = dict(
            sample_rate=44100, filters_n=256, bark_bands_n=32,
            alpha=codec.psycho.alpha, window_type="vorbis",
        )
        enc0 = codec.encode_bitstream(transient)
        enc1 = codec.encode_bitstream(transient, tmask=TMASK)
        s0 = len(bitstream.pack(
            np.asarray(enc0[0]), np.asarray(enc0[1]), **meta))
        s1 = len(bitstream.pack(
            np.asarray(enc1[0]), np.asarray(enc1[1]), **meta))
        assert s1 < s0

    def test_ms_path(self, codec):
        """Joint stereo: tmask applies to the pre-min L/R intensities."""
        rng = np.random.default_rng(5)
        n = 256 * 16
        x = np.zeros((1, n, 2), np.float32)
        x[0, :, 0] = 0.01 * rng.standard_normal(n)
        x[0, :, 1] = x[0, :, 0] + 0.003 * rng.standard_normal(n)
        x[0, 2 * 256 : 4 * 256] += 0.8
        xs = jnp.asarray(x)
        codes0, bark0 = codec.encode_bitstream_ms(xs)
        codes1, bark1 = codec.encode_bitstream_ms(xs, tmask=TMASK)
        b0 = np.asarray(bark0, np.float32)
        b1 = np.asarray(bark1, np.float32)
        assert (b1 >= b0).all() and (b1 > b0).any()
        out = codec.decode_bitstream_ms(codes1, bark1)
        assert out.shape[1] == xs.shape[1] + 2 * 256
        assert out.shape[2] == 2

    def test_context_frames_accessor(self, codec):
        w = codec.tmask_context_frames(TMASK)
        assert w == psycho.temporal_masking_window(
            codec._tmask_db_per_frame(TMASK)
        )
        assert 1 <= w <= 127


class TestStreamParity:
    """The .acs chunked encoder carries a rolling pre-spread context —
    chunk boundaries must spread identically to the whole-file .acz."""

    @pytest.mark.parametrize("chunk_blocks", [16, 4])
    def test_stream_matches_batch(self, codec, transient, tmp_path,
                                  chunk_blocks):
        # batch (.acz-style) encode over the same frames the stream sees
        frames = codec.mdct.transform(transient)
        codes_b, bark_b = codec.quantize_frames(frames, tmask=TMASK)
        path = str(tmp_path / f"t{chunk_blocks}.acs")
        sc.encode_stream(
            codec, transient, path, chunk_blocks=chunk_blocks,
            tmask=TMASK,
        )
        chunks = []
        with sc.StreamReader(path) as r:
            for k in range(r.n_chunks):
                chunks.append(r.read_chunk(k).codes)
        got = np.concatenate(chunks, axis=0)
        np.testing.assert_array_equal(
            got, np.asarray(codes_b[0])
        )

    def test_chunk_smaller_than_window(self, codec, tmp_path):
        """chunk_blocks < the masking window forces the rolling-context
        concat path; parity must still be exact."""
        rng = np.random.default_rng(6)
        n = 256 * 12
        x = 0.01 * rng.standard_normal(n).astype(np.float32)
        x[2 * 256 : 3 * 256] += 0.7
        xs = jnp.asarray(x[None, :, None])
        # big decay -> small per-frame decay -> wide window vs 2-block chunks
        tm = 60.0
        w = codec.tmask_context_frames(tm)
        assert w > 2  # the premise of this test
        frames = codec.mdct.transform(xs)
        codes_b, _ = codec.quantize_frames(frames, tmask=tm)
        path = str(tmp_path / "small.acs")
        sc.encode_stream(codec, xs, path, chunk_blocks=2, tmask=tm)
        chunks = []
        with sc.StreamReader(path) as r:
            for k in range(r.n_chunks):
                chunks.append(r.read_chunk(k).codes)
        got = np.concatenate(chunks, axis=0)
        np.testing.assert_array_equal(got, np.asarray(codes_b[0]))

    def test_stream_with_tns_nf(self, codec, transient, tmp_path):
        """tmask composes with TNS + NF in the stream; decode round-trips."""
        path = str(tmp_path / "combo.acs")
        sc.encode_stream(
            codec, transient, path, chunk_blocks=16, tmask=TMASK,
            tns=True, nf=True, nf_seed=9,
        )
        out = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)], axis=1
        )
        frames = codec.mdct.transform(transient)
        enc = codec.encode_frames(frames, tns=True, nf=True, tmask=TMASK)
        ref = np.asarray(codec.decode_bitstream(
            enc.codes, enc.bark16, tns_idx=enc.tns_idx,
            nf_levels=enc.nf_levels, nf_seed=9,
        ))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestMetricsLens:
    def test_spread_threshold_nmr_is_leq(self, codec, transient):
        """nmr(tmask=) judges against the spread (>=) threshold, so it
        reads <= the simultaneous-only NMR, and a tmask'd encode that
        looks noisy to the strict lens passes its own model's lens."""
        from audiocodec_tpu import metrics

        codes, bark = codec.encode_bitstream(transient, tmask=TMASK)
        out = codec.decode_bitstream(codes, bark)[:, 256:-256]
        strict = float(metrics.nmr(codec, transient, out))
        own = float(metrics.nmr(codec, transient, out, tmask=TMASK))
        assert own <= strict
        # the codec's quantizer calibration: noise lands well under the
        # threshold it was shaped by (~1/36 nominal)
        assert own < 0.2

    def test_zero_tmask_unchanged(self, codec, transient):
        from audiocodec_tpu import metrics

        codes, bark = codec.encode_bitstream(transient)
        out = codec.decode_bitstream(codes, bark)[:, 256:-256]
        a = float(metrics.nmr(codec, transient, out))
        b = float(metrics.nmr(codec, transient, out, tmask=0.0))
        assert a == b


class TestRateControl:
    def test_rate_search_honors_tmask(self, codec, transient):
        from audiocodec_tpu import rate as _rate

        target = 128.0  # the 0.37 s fixture floors out below ~96 kbps
        r0 = _rate.encode_with_target_bitrate(
            codec, transient, target, tolerance=0.1
        )
        r1 = _rate.encode_with_target_bitrate(
            codec, transient, target, tolerance=0.1, tmask=TMASK
        )
        # same rate target, but the tmask encode needs a WEAKER global
        # scale (temporal masking already freed bits on the transient)
        assert r1.threshold_scale <= r0.threshold_scale * 1.01
        assert np.isfinite(r1.kbps) and r1.kbps > 0
