"""Numerical parity against the TF reference implementation.

These tests import the actual reference (read-only at /root/reference) and
compare outputs tensor-by-tensor. They are skipped automatically when the
reference or TensorFlow is unavailable, so the suite stays self-contained.

Parity targets (BASELINE.md): round-trip SNR within 0.1 dB; here we check
the stronger property that every intermediate matches to float32 precision.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"

tf = pytest.importorskip("tensorflow")
if not os.path.isdir(os.path.join(REFERENCE_PATH, "audiocodec")):
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, REFERENCE_PATH)

from audiocodec.mdctransformer import MDCTransformer as RefMDCT  # noqa: E402
from audiocodec.psychoacoustic import PsychoacousticModel as RefPsycho  # noqa: E402

from audiocodec_tpu.mdct import MDCT  # noqa: E402
from audiocodec_tpu.psycho import PsychoacousticModel  # noqa: E402


@pytest.fixture(scope="module")
def random_wave():
    rng = np.random.default_rng(42)
    return rng.uniform(-0.9, 0.9, size=(2, 12 * 64, 2)).astype(np.float32)


class TestMDCTParity:
    @pytest.mark.parametrize("window_type", ["vorbis", "sine"])
    def test_transform_matches(self, random_wave, window_type):
        n = 64
        ref = RefMDCT(n, window_type=window_type)
        mine = MDCT.create(n, window_type=window_type)
        y_ref = ref.transform(tf.constant(random_wave)).numpy()
        y_mine = np.asarray(mine.transform(jnp.asarray(random_wave)))
        assert y_ref.shape == y_mine.shape
        np.testing.assert_allclose(y_mine, y_ref, atol=2e-6)

    @pytest.mark.parametrize("window_type", ["vorbis", "sine"])
    def test_inverse_transform_matches(self, window_type):
        n = 64
        ref = RefMDCT(n, window_type=window_type)
        mine = MDCT.create(n, window_type=window_type)
        rng = np.random.default_rng(7)
        spec = rng.uniform(-0.5, 0.5, size=(2, 9, n, 2)).astype(np.float32)
        x_ref = ref.inverse_transform(tf.constant(spec)).numpy()
        x_mine = np.asarray(mine.inverse_transform(jnp.asarray(spec)))
        assert x_ref.shape == x_mine.shape
        # pre-DCT values are scaled by sqrt(4N); tolerance is f32 roundoff
        # relative to that O(10) magnitude.
        np.testing.assert_allclose(x_mine, x_ref, atol=2e-5)

    @pytest.mark.parametrize("window_type", ["vorbis", "sine"])
    def test_polyphase_tensors_match(self, window_type):
        """compat.MDCTransformer.H / .H_inv equal the reference's tensors
        (mdctransformer.py:58-59) — the attribute surface reference users
        read directly."""
        from audiocodec_tpu.compat import MDCTransformer as ShimMDCT

        n = 64
        ref = RefMDCT(n, window_type=window_type)
        shim = ShimMDCT(n, window_type=window_type)
        np.testing.assert_allclose(
            np.asarray(shim.H), ref.H.numpy(), atol=2e-7
        )
        np.testing.assert_allclose(
            np.asarray(shim.H_inv), ref.H_inv.numpy(), atol=2e-6
        )

    def test_round_trip_snr_within_tolerance(self, random_wave):
        """Round-trip SNR within 0.1 dB of the reference (BASELINE.md)."""
        n = 64
        ref = RefMDCT(n)
        mine = MDCT.create(n)

        def snr(x, y):
            noise = x - y
            return 10 * np.log10(np.sum(x**2) / max(np.sum(noise**2), 1e-30))

        rt_ref = ref.inverse_transform(
            ref.transform(tf.constant(random_wave))
        ).numpy()[:, n:-n]
        rt_mine = np.asarray(
            mine.inverse_transform(mine.transform(jnp.asarray(random_wave)))
        )[:, n:-n]
        snr_ref = snr(random_wave, rt_ref)
        snr_mine = snr(random_wave, rt_mine)
        # Both are float32-roundoff-limited (~130 dB); ours must not be
        # meaningfully worse.
        assert snr_mine >= snr_ref - 0.1


class TestPsychoParity:
    @pytest.fixture(scope="class")
    def models(self):
        kwargs = dict(sample_rate=44100, filter_bands_n=64, bark_bands_n=32)
        return RefPsycho(**kwargs), PsychoacousticModel.create(**kwargs)

    @pytest.fixture(scope="class")
    def spectrum(self):
        rng = np.random.default_rng(3)
        return rng.uniform(-0.6, 0.6, size=(2, 5, 64, 2)).astype(np.float32)

    def test_precomputes_match(self, models):
        ref, mine = models
        np.testing.assert_allclose(np.asarray(mine.W), ref.W.numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mine.W_inv), ref.W_inv.numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(mine.spreading_matrix),
            ref.spreading_matrix.numpy(),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mine.quiet_threshold_intensity),
            ref.quiet_threshold_intensity.numpy(),
            rtol=1e-5,
        )

    def test_tonality_matches(self, models, spectrum):
        ref, mine = models
        t_ref = ref.tonality(tf.constant(spectrum)).numpy()
        t_mine = np.asarray(mine.tonality(jnp.asarray(spectrum)))
        np.testing.assert_allclose(t_mine, t_ref, atol=1e-5)

    @pytest.mark.parametrize("drown", [0.0, 0.3])
    def test_global_masking_threshold_matches(self, models, spectrum, drown):
        ref, mine = models
        t_ref = ref.tonality(tf.constant(spectrum))
        thr_ref = ref.global_masking_threshold(
            tf.constant(spectrum), t_ref, drown=drown
        ).numpy()
        t_mine = mine.tonality(jnp.asarray(spectrum))
        thr_mine = np.asarray(
            mine.global_masking_threshold(
                jnp.asarray(spectrum), t_mine, drown=drown
            )
        )
        np.testing.assert_allclose(thr_mine, thr_ref, rtol=2e-4, atol=1e-8)

    def test_amplitude_to_dB_matches(self, models):
        ref, mine = models
        amps = np.linspace(-1, 1, 101).astype(np.float32)
        db_ref = ref.amplitude_to_dB(tf.constant(amps)).numpy()
        db_mine = np.asarray(mine.amplitude_to_dB(jnp.asarray(amps)))
        np.testing.assert_allclose(db_mine, db_ref, atol=1e-4)
        norm_ref = ref.amplitude_to_dB_norm(tf.constant(amps)).numpy()
        norm_mine = np.asarray(mine.amplitude_to_dB_norm(jnp.asarray(amps)))
        np.testing.assert_allclose(norm_mine, norm_ref, atol=1e-6)


class TestTwoToneMaskingParity:
    """BASELINE config 2: psychoacoustic masking threshold on a two-tone
    test signal, compared against the reference end to end (through the
    reference's own MDCT so both models see identical spectra)."""

    def test_two_tone_threshold(self):
        sr, n = 44100, 64
        t = np.arange(sr // n * n) / sr
        wave = (
            0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.3 * np.sin(2 * np.pi * 3000 * t)
        ).astype(np.float32)[None, :, None]

        ref_mdct = RefMDCT(n)
        spec = ref_mdct.transform(tf.constant(wave)).numpy()

        kwargs = dict(sample_rate=sr, filter_bands_n=n, bark_bands_n=32)
        ref_pa = RefPsycho(**kwargs)
        my_pa = PsychoacousticModel.create(**kwargs)

        t_ref = ref_pa.tonality(tf.constant(spec))
        thr_ref = ref_pa.global_masking_threshold(
            tf.constant(spec), t_ref
        ).numpy()

        spec_j = jnp.asarray(spec)
        t_my = my_pa.tonality(spec_j)
        thr_my = np.asarray(my_pa.global_masking_threshold(spec_j, t_my))

        np.testing.assert_allclose(thr_my, thr_ref, rtol=2e-4, atol=1e-8)
