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

    def test_stationary_never_fires(self):
        mdct = MDCT.create(256)
        for kind in ("tone", "noise"):
            y = mdct.transform(self.make(kind))
            flags = np.asarray(bs.detect(y))
            assert not flags.any(), kind

    def test_click_fires_near_the_attack(self):
        mdct = MDCT.create(256)
        y = mdct.transform(self.make("click"))
        flags = np.asarray(bs.detect(y))[0]
        # the click at block 5 lands in frames 5 and/or 6 (each frame
        # spans blocks k-1..k)
        assert flags[5] or flags[6]
        # and nowhere far from it
        assert not flags[:4].any() and not flags[8:].any()

    def test_silence_never_fires(self):
        mdct = MDCT.create(256)
        x = jnp.zeros((1, 16 * 256, 1), dtype=F32)
        flags = np.asarray(bs.detect(mdct.transform(x)))
        assert not flags.any()


class TestThresholdPool:
    def test_budget_preserved(self):
        """RMS pooling keeps the total squared-threshold budget of every
        frame exactly (the noise-power calibration invariant)."""
        rng = np.random.default_rng(5)
        thr = jnp.asarray(10.0 ** rng.uniform(-6, 0, (2, 4, 64, 2)))
        flags = jnp.asarray([[True, False, True, True],
                             [False, True, False, True]])
        pooled = np.asarray(bs.pool_threshold(thr, flags))
        np.testing.assert_allclose(
            (pooled**2).sum(axis=2), (np.asarray(thr) ** 2).sum(axis=2),
            rtol=1e-12,
        )

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

    def test_frequency_index(self):
        flags = jnp.asarray([[False, True]])
        idx = np.asarray(bs.frequency_index(flags, 64))
        np.testing.assert_array_equal(idx[0, 0], np.arange(64))
        m = 64 // 8
        expect = np.tile(np.arange(m) * 8, 8)
        np.testing.assert_array_equal(idx[0, 1], expect)


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
