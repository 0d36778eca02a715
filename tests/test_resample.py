"""Polyphase sample-rate conversion (resample.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu.resample import Resampler, resample_waveform


def _snr(ref, got):
    err = np.asarray(ref) - np.asarray(got)
    return 10 * np.log10(
        np.sum(np.asarray(ref) ** 2) / max(np.sum(err**2), 1e-30)
    )


def _tone(freq, sr, seconds=1.0, dtype=np.float32):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(dtype)[None, :, None]


class TestConstruction:
    def test_ratio_reduction(self):
        r = Resampler.create(44100, 16000)
        assert (r.up, r.down) == (160, 441)
        r2 = Resampler.create(16000, 48000)
        assert (r2.up, r2.down) == (3, 1)

    def test_identity_rates(self):
        r = Resampler.create(44100, 44100)
        assert (r.up, r.down) == (1, 1)
        x = _tone(440, 44100)
        out = r.resample(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(out), x)

    def test_rejects_unrelated_rates(self):
        # 44100 vs 44101 are coprime: 44101 phases is out of range
        with pytest.raises(ValueError, match="phases"):
            Resampler.create(44101, 44100)

    def test_rejects_nonpositive_rates(self):
        with pytest.raises(ValueError, match="positive"):
            Resampler.create(0, 44100)

    def test_rejects_bad_precision(self):
        with pytest.raises(ValueError, match="precision"):
            Resampler.create(16000, 48000, precision="sloppy")

    def test_out_length(self):
        r = Resampler.create(44100, 16000)
        assert r.out_length(44100) == 16000
        assert r.out_length(441) == 160
        r2 = Resampler.create(16000, 48000)
        assert r2.out_length(16000) == 48000

    def test_is_a_pytree(self):
        r = Resampler.create(16000, 48000)
        leaves = jax.tree.leaves(r)
        assert len(leaves) == 1  # just the kernel
        # passes through jit as an argument without retracing trouble
        out = jax.jit(lambda rr, x: rr.resample(x))(
            r, jnp.asarray(_tone(440, 16000, 0.1))
        )
        assert out.shape[1] == r.out_length(1600)


class TestQuality:
    def test_upsample_tone_matches_analytic(self):
        """1 kHz tone 16k->48k against the analytically generated 48k
        tone: group delay is compensated, so the interior aligns to
        > 90 dB (filter design: ~90 dB stopband Kaiser)."""
        r = Resampler.create(16000, 48000)
        y = np.asarray(r.resample(jnp.asarray(_tone(1000, 16000))))[0, :, 0]
        ref = np.sin(2 * np.pi * 1000 * np.arange(y.size) / 48000)
        m = slice(2000, y.size - 2000)
        assert _snr(ref[m], y[m]) > 90.0

    def test_downsample_tone_matches_analytic(self):
        """1 kHz tone 44.1k->16k (the 160/441 hard case)."""
        r = Resampler.create(44100, 16000)
        y = np.asarray(r.resample(jnp.asarray(_tone(1000, 44100))))[0, :, 0]
        ref = np.sin(2 * np.pi * 1000 * np.arange(y.size) / 16000)
        m = slice(2000, y.size - 2000)
        assert _snr(ref[m], y[m]) > 90.0

    def test_antialiasing(self):
        """A 10 kHz tone downsampled to 16 kHz (Nyquist 8 kHz) must be
        rejected by the anti-aliasing filter, not folded into band."""
        r = Resampler.create(44100, 16000)
        y = np.asarray(r.resample(jnp.asarray(_tone(10000, 44100))))[0, :, 0]
        m = slice(2000, y.size - 2000)
        atten_db = 10 * np.log10(np.mean(y[m] ** 2) / 0.5)
        assert atten_db < -80.0

    def test_dc_preserved(self):
        r = Resampler.create(44100, 16000)
        x = jnp.full((1, 44100, 1), 0.5, jnp.float32)
        y = np.asarray(r.resample(x))[0, :, 0]
        m = slice(2000, y.size - 2000)
        assert np.abs(y[m] - 0.5).max() < 1e-4

    def test_round_trip(self):
        """16k -> 48k -> 16k returns the original tone to filter
        precision (two passes of ~90 dB filtering)."""
        x = _tone(2000, 16000)
        up = Resampler.create(16000, 48000)
        down = Resampler.create(48000, 16000)
        y = np.asarray(down.resample(up.resample(jnp.asarray(x))))
        m = slice(2000, y.shape[1] - 2000)
        assert _snr(x[0, m, 0], y[0, m, 0]) > 85.0

    def test_quality_scales_with_zeros(self):
        """More sinc zero-crossings -> better reconstruction (monotone
        quality knob)."""
        x = _tone(3000, 16000)
        snrs = []
        for zeros in (4, 16):
            r = Resampler.create(16000, 48000, zeros=zeros)
            y = np.asarray(r.resample(jnp.asarray(x)))[0, :, 0]
            ref = np.sin(2 * np.pi * 3000 * np.arange(y.size) / 48000)
            m = slice(2000, y.size - 2000)
            snrs.append(_snr(ref[m], y[m]))
        assert snrs[1] > snrs[0] + 10.0


class TestContract:
    def test_channels_independent(self):
        r = Resampler.create(16000, 48000)
        left = _tone(500, 16000, 0.25)
        right = _tone(1500, 16000, 0.25)
        stereo = np.concatenate([left, right], axis=-1)
        y = np.asarray(r.resample(jnp.asarray(stereo)))
        y_l = np.asarray(r.resample(jnp.asarray(left)))
        np.testing.assert_allclose(y[:, :, :1], y_l, atol=1e-6)

    def test_batch_independent(self):
        r = Resampler.create(16000, 48000)
        a = _tone(500, 16000, 0.25)
        b = _tone(1500, 16000, 0.25)
        y = np.asarray(r.resample(jnp.asarray(np.concatenate([a, b]))))
        ya = np.asarray(r.resample(jnp.asarray(a)))
        np.testing.assert_allclose(y[:1], ya, atol=1e-6)

    def test_rejects_wrong_dtype(self):
        r = Resampler.create(16000, 48000)
        with pytest.raises(TypeError, match="never casts implicitly"):
            r.resample(jnp.zeros((1, 160, 1), jnp.float64))

    def test_rejects_wrong_rank(self):
        r = Resampler.create(16000, 48000)
        with pytest.raises(ValueError, match="channels"):
            r.resample(jnp.zeros((160,), jnp.float32))

    def test_float16_banned(self):
        with pytest.raises(TypeError, match="float16"):
            Resampler.create(16000, 48000, compute_dtype=jnp.float16)

    def test_differentiable(self):
        r = Resampler.create(16000, 48000)
        x = jnp.asarray(_tone(440, 16000, 0.05))

        def f(x):
            return jnp.sum(r.resample(x) ** 2)

        g = jax.grad(f)(x)
        assert g.shape == x.shape
        assert float(jnp.sum(jnp.abs(g))) > 0.0

    def test_bf16_compute(self):
        r = Resampler.create(16000, 48000, compute_dtype=jnp.bfloat16)
        x = jnp.asarray(_tone(440, 16000, 0.1)).astype(jnp.bfloat16)
        y = r.resample(x)
        assert y.dtype == jnp.bfloat16
        assert y.shape[1] == r.out_length(x.shape[1])

    def test_one_shot_helper(self):
        x = jnp.asarray(_tone(440, 16000, 0.1))
        y = resample_waveform(x, 16000, 32000)
        assert y.shape == (1, 3200, 1)

    def test_short_input(self):
        """Inputs shorter than the filter window still work (zero-padded
        transient, exact output length)."""
        r = Resampler.create(44100, 16000)
        x = jnp.zeros((1, 441, 1), jnp.float32)
        y = r.resample(x)
        assert y.shape == (1, 160, 1)


class TestStreamingResampler:
    def _stream(self, r, x, chunk):
        from audiocodec_tpu.resample import StreamingResampler

        s = StreamingResampler(r)
        outs = []
        for i in range(0, x.shape[1], chunk):
            outs.append(np.asarray(s.step(x[:, i : i + chunk])))
        outs.append(np.asarray(s.flush()))
        return np.concatenate([o for o in outs if o.size], axis=1)

    def test_chunked_equals_batch(self):
        """Chunk-fed output == one-shot resample, for chunk sizes with
        no relation to the rational phase (the buffer carries it)."""
        r = Resampler.create(44100, 16000)
        x = jnp.asarray(_tone(1000, 44100, seconds=0.5))
        want = np.asarray(r.resample(x))
        for chunk in (441, 1000, 4410, 7777):
            got = self._stream(r, x, chunk)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_chunked_upsample(self):
        r = Resampler.create(16000, 48000)
        x = jnp.asarray(_tone(700, 16000, seconds=0.3))
        want = np.asarray(r.resample(x))
        got = self._stream(r, x, 1234)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_identity_streams_through(self):
        from audiocodec_tpu.resample import StreamingResampler

        r = Resampler.create(16000, 16000)
        s = StreamingResampler(r)
        x = jnp.asarray(_tone(700, 16000, seconds=0.1))
        out = s.step(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        assert np.asarray(s.flush()).size == 0

    def test_small_chunks_eventually_emit(self):
        """Chunks smaller than one polyphase block buffer up and emit
        once a window completes; totals still match."""
        r = Resampler.create(44100, 16000)
        x = jnp.asarray(_tone(1000, 44100, seconds=0.2))
        want = np.asarray(r.resample(x))
        got = self._stream(r, x, 100)  # << down=441
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_flush_resets_for_reuse(self):
        from audiocodec_tpu.resample import StreamingResampler

        r = Resampler.create(16000, 32000)
        s = StreamingResampler(r)
        x = jnp.asarray(_tone(500, 16000, seconds=0.1))
        first = np.concatenate(
            [np.asarray(s.step(x)), np.asarray(s.flush())], axis=1
        )
        second = np.concatenate(
            [np.asarray(s.step(x)), np.asarray(s.flush())], axis=1
        )
        np.testing.assert_array_equal(first, second)
