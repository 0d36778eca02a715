"""The compat shim must run the reference's own test code verbatim
(modulo the import line) — the strongest switch-over guarantee."""

import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu.compat import MDCTransformer, PsychoacousticModel


def sine_wav(amplitude, frequency, sample_rate=44100, duration_sec=2.0):
    t = np.arange(0, sample_rate * duration_sec, dtype=np.float64)
    wave = amplitude * np.sin(2.0 * np.pi * frequency * t / sample_rate)
    return jnp.asarray(wave, dtype=jnp.float32).reshape(1, -1, 1)


class TestReferenceTestSuiteOnShim:
    """Each test mirrors one reference test
    (audiocodec/tests/test_mdctransformer.py, test_psychoacoustic.py)."""

    def test_inverse_identity(self):
        filters_n = 256
        mdct = MDCTransformer(filters_n)
        wave_data = sine_wav(0.8, 880, sample_rate=16000, duration_sec=1.0)
        wave_data = wave_data[:, : filters_n * (wave_data.shape[1] // filters_n)]
        spectrum = mdct.transform(wave_data)
        wave_reproduced = mdct.inverse_transform(spectrum)
        zero = jnp.max(
            jnp.abs(wave_data - wave_reproduced[:, filters_n:-filters_n])
        )
        assert float(zero) < 1e-5

    def test_mdct_calculation(self):
        filters_n = 64
        mdct = MDCTransformer(filters_n)
        wave_data = sine_wav(0.8, 4, sample_rate=64, duration_sec=4.0)
        wave_data = wave_data[:, : filters_n * (wave_data.shape[1] // filters_n)]
        spectrum = mdct.transform(wave_data)
        correct_spectrum = [
            -0.000412722176, 0.000430465181, 0.000789350364, -0.000867388735,
            -0.00275337417, 0.0132110268, 0.0193885863, 0.156005412,
            -0.233544752, -0.0129148215,
        ]
        for i, a in enumerate(correct_spectrum):
            assert abs(float(spectrum[0, 1, i, 0]) - a) < 2e-6

    def test_mdct_shape(self):
        filters_n = 64
        mdct = MDCTransformer(filters_n)
        rng = np.random.default_rng(0)
        wave_data = jnp.asarray(
            rng.normal(size=(128, 10 * filters_n, 2)), dtype=jnp.float32
        )
        spectrum = mdct.transform(wave_data)
        assert spectrum.shape == (128, 11, filters_n, 2)

    def test_energy_conservation_W(self):
        pa_model = PsychoacousticModel(sample_rate=32768, filter_bands_n=64)
        should_be_zeros = jnp.sum(pa_model.W, axis=1) - 1.0
        assert float(jnp.sum(jnp.abs(should_be_zeros))) < 1e-6

    def test_energy_conservation_W_inv(self):
        pa_model = PsychoacousticModel(sample_rate=32768, filter_bands_n=64)
        should_be_zeros = jnp.sum(pa_model.W_inv, axis=1) - 1.0
        assert float(jnp.sum(jnp.abs(should_be_zeros))) < 1e-6

    def test_tonality_tone(self):
        filters_n = 64
        mdct = MDCTransformer(filters_n)
        wave_data = sine_wav(0.8, 4, sample_rate=64, duration_sec=5.0)
        spectrum = mdct.transform(wave_data)
        pa_model = PsychoacousticModel(
            sample_rate=filters_n, filter_bands_n=filters_n
        )
        tonality = pa_model.tonality(spectrum)
        assert float(tonality[0, 1, 0, 0]) == 1.0

    def test_tonality_noise(self):
        filters_n = 64
        blocks_n = 10
        mdct = MDCTransformer(filters_n)
        rng = np.random.default_rng(1)
        wave_data = jnp.asarray(
            rng.uniform(-1.0, 1.0, size=(10, blocks_n * filters_n, 2)),
            dtype=jnp.float32,
        )
        spectrum = mdct.transform(wave_data)
        pa_model = PsychoacousticModel(
            sample_rate=filters_n, filter_bands_n=filters_n
        )
        tonality = pa_model.tonality(spectrum)
        assert tonality.shape == (10, blocks_n + 1, 1, 2)
        assert float(jnp.mean(tonality[0, 1:-1])) < 0.1


class TestShimExtras:
    def test_reference_constructor_kwargs_accepted(self):
        # the reference passes tf dtypes / precompute_dtype; strings and
        # ignored args must work
        m = MDCTransformer(
            64, window_type="sine", compute_dtype="float32",
            precompute_dtype="float64",
        )
        assert m.filters_n == 64
        pa = PsychoacousticModel(
            44100, compute_dtype=np.float32, precompute_dtype=np.float64
        )
        assert pa.alpha == 0.6

    def test_low_precision_precompute_warns(self):
        import pytest

        with pytest.warns(UserWarning, match="float64"):
            MDCTransformer(64, precompute_dtype="float32")
        with pytest.warns(UserWarning, match="float64"):
            PsychoacousticModel(44100, precompute_dtype=np.float32)

    def test_polyphase_tensor_surface(self):
        """Reference users read mdct.H / mdct.H_inv (mdctransformer.py:58-59):
        [2, N, N], compute dtype, and mutually inverse two-tap operators.
        Exact numeric parity vs the reference's tensors is asserted in
        tests/test_reference_parity.py."""
        n = 64
        m = MDCTransformer(n, window_type="sine")
        H, H_inv = np.asarray(m.H), np.asarray(m.H_inv)
        assert H.shape == (2, n, n) and H_inv.shape == (2, n, n)
        assert H.dtype == np.float32
        # two-tap convolution of H with H_inv is the identity delayed by
        # one block: sum_k H[k] @ H_inv[1-k] == I (perfect reconstruction)
        mid = H[0] @ H_inv[1] + H[1] @ H_inv[0]
        np.testing.assert_allclose(mid, np.eye(n), atol=1e-5)

    def test_add_noise_without_key(self):
        pa = PsychoacousticModel(44100, filter_bands_n=64)
        x = jnp.zeros((1, 2, 64, 1), dtype=jnp.float32)
        thr = jnp.ones_like(x) * 0.1
        a = pa.add_noise(x, thr)
        b = pa.add_noise(x, thr)
        assert not bool(jnp.all(a == b))  # stream advances, like global RNG

    def test_end_to_end_pipeline(self):
        """The reference's intended composition, through the shim only."""
        filters_n = 256
        mdct = MDCTransformer(filters_n)
        pa = PsychoacousticModel(16000, filter_bands_n=filters_n)
        wave = sine_wav(0.7, 700, sample_rate=16000, duration_sec=1.0)
        wave = wave[:, : filters_n * (wave.shape[1] // filters_n)]
        spectrum = mdct.transform(wave)
        tonality = pa.tonality(spectrum)
        thr = pa.global_masking_threshold(spectrum, tonality, drown=0.1)
        noisy = pa.add_noise(spectrum, thr)
        out = mdct.inverse_transform(noisy)
        assert out.shape == (1, wave.shape[1] + 2 * filters_n, 1)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_attribute_surface_superset_of_reference(self):
        """Drop-in means drop-in: every public attribute a reference
        INSTANCE carries (its __dict__ plus public methods) must resolve
        on the shim too (reference: audiocodec/psychoacoustic.py:35-69,
        mdctransformer.py:36-59). Skips when the reference checkout or
        TF is unavailable."""
        import os
        import sys

        pytest.importorskip("tensorflow")
        if not os.path.isdir("/root/reference/audiocodec"):
            pytest.skip("reference checkout not available")
        sys.path.insert(0, "/root/reference")
        try:
            from audiocodec.mdctransformer import MDCTransformer as RefM
            from audiocodec.psychoacoustic import PsychoacousticModel as RefP
        finally:
            sys.path.remove("/root/reference")

        for ref_obj, shim in (
            (RefM(64), MDCTransformer(64)),
            (RefP(16000, filter_bands_n=64), PsychoacousticModel(
                16000, filter_bands_n=64)),
        ):
            names = {
                n for n in list(vars(ref_obj)) + dir(type(ref_obj))
                if not n.startswith("_")
            }
            missing = {n for n in names if not hasattr(shim, n)}
            assert not missing, (
                f"shim {type(shim).__name__} lacks reference attributes: "
                f"{sorted(missing)}"
            )

    def test_bark_scale_methods(self):
        pa = PsychoacousticModel(44100)
        f = jnp.asarray([100.0, 1000.0, 10000.0])
        np.testing.assert_allclose(
            np.asarray(pa.bark2freq(pa.freq2bark(f))), np.asarray(f),
            rtol=1e-5,
        )
