"""Opt-in hardware lane: numerics on the REAL TPU (``pytest -m tpu``).

These are the checks CPU interpret mode cannot see:

* Mosaic codegen of the fused MDCT kernels (the interpreter executes the
  same Python, not the compiled kernel), and
* the hardware-PRNG noise kernel — interpret mode's ``prng_random_bits``
  returns zeros, so its distribution is ONLY verifiable here (the 6-sigma
  calibration mirrors reference audiocodec/psychoacoustic.py:151-167).

Deselected by default (pyproject addopts). Invocation on this machine:

    python -m pytest tests/ -m tpu -q

Compiles route through .jax_cache (see conftest); a cold first run can take
minutes per program on the remote-attached device, subsequent runs seconds.
Shapes are kept small: these are numerics gates, not benchmarks (bench.py
and benchmarks/ own the perf story).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if jax.default_backend() in ("cpu",):
        pytest.skip("hardware lane requires a real TPU backend")


@pytest.fixture(scope="module")
def mdct_pair():
    from audiocodec_tpu.mdct import MDCT

    return MDCT.create(1024), MDCT.create(1024, use_pallas=True)


class TestPallasKernelsOnHardware:
    """Compiled Mosaic kernels vs the XLA path, matched precision."""

    def test_forward_matches_xla(self, mdct_pair):
        m, mp = mdct_pair
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-1, 1, (2, 16 * 1024, 1)), dtype=jnp.float32
        )
        want = np.asarray(jax.jit(m.transform)(x))
        got = np.asarray(jax.jit(mp.transform)(x))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_inverse_matches_xla(self, mdct_pair):
        m, mp = mdct_pair
        rng = np.random.default_rng(1)
        y = jnp.asarray(
            rng.uniform(-0.5, 0.5, (2, 16, 1024, 1)), dtype=jnp.float32
        )
        want = np.asarray(jax.jit(m.inverse_transform)(y))
        got = np.asarray(jax.jit(mp.inverse_transform)(y))
        # output values are O(10) (sqrt(4N) folded into the matrix)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_round_trip_perfect_reconstruction(self, mdct_pair):
        _, mp = mdct_pair
        rng = np.random.default_rng(2)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 12 * 1024, 1)), dtype=jnp.float32
        )
        rt = jax.jit(lambda x: mp.inverse_transform(mp.transform(x)))(x)
        err = float(jnp.max(jnp.abs(x - rt[:, 1024:-1024])))
        assert err < 1e-5

    def test_gradient_matches_xla(self, mdct_pair):
        m, mp = mdct_pair
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 8 * 1024, 1)), dtype=jnp.float32
        )

        def loss(mm, x):
            return jnp.sum(mm.transform(x) ** 2)

        g_xla = np.asarray(jax.jit(jax.grad(lambda x: loss(m, x)))(x))
        g_pal = np.asarray(jax.jit(jax.grad(lambda x: loss(mp, x)))(x))
        np.testing.assert_allclose(g_pal, g_xla, atol=2e-5)


class TestAutoDefault:
    def test_auto_resolves_to_both_kernels_here(self):
        """Round 3: the independent-tile kernels beat XLA in BOTH
        directions at multi-pass precision (docs/DESIGN.md §3), so auto
        resolves to True on hardware."""
        from audiocodec_tpu.mdct import MDCT

        m = MDCT.create(1024)  # use_pallas="auto"
        assert m.use_pallas is True
        assert m.pfwd_mat is not None and m.pinv_mat is not None
        rng = np.random.default_rng(5)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 8 * 1024, 1)), dtype=jnp.float32
        )
        rt = jax.jit(lambda x: m.inverse_transform(m.transform(x)))(x)
        err = float(jnp.max(jnp.abs(x - rt[:, 1024:-1024])))
        assert err < 1e-5

    def test_auto_stands_down_for_f32_default(self):
        from audiocodec_tpu.mdct import MDCT

        assert MDCT.create(1024, dct_precision="default").use_pallas is False
        assert MDCT.create(
            1024, compute_dtype=jnp.bfloat16, fast_bf16=True,
            dct_precision="default",
        ).use_pallas is True

    def test_auto_extends_to_radix_at_n2048_highest(self):
        """Past the mono design's HIGHEST cap, auto falls through to the
        radix kernels (measured 1.34x/1.06x vs XLA standalone at N=2048
        HIGHEST — docs/DESIGN.md §3) and they run correctly compiled."""
        from audiocodec_tpu.mdct import MDCT

        m = MDCT.create(2048)  # use_pallas="auto", dct_precision="highest"
        assert m.use_pallas is True
        assert m.pallas_kernel == "radix"
        rng = np.random.default_rng(7)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 8 * 2048, 1)), dtype=jnp.float32
        )
        rt = jax.jit(lambda x: m.inverse_transform(m.transform(x)))(x)
        err = float(jnp.max(jnp.abs(x - rt[:, 2048:-2048])))
        assert err < 1e-5


class TestLongBlocksOnHardware:
    """N=2048 Mosaic codegen at the bf16 hi/lo split tier ('high') —
    the tier that exists because native HIGHEST exceeds scoped VMEM
    past N=1024 (ops/pallas_mdct._mxu)."""

    def test_n2048_high_round_trip(self):
        from audiocodec_tpu.mdct import MDCT

        mp = MDCT.create(2048, use_pallas=True, dct_precision="high")
        rng = np.random.default_rng(6)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 6 * 2048, 1)), dtype=jnp.float32
        )
        rt = jax.jit(lambda x: mp.inverse_transform(mp.transform(x)))(x)
        err = float(jnp.max(jnp.abs(x - rt[:, 2048:-2048])))
        assert err < 1e-3, err

    def test_n2048_high_matches_xla(self):
        from audiocodec_tpu.mdct import MDCT

        m = MDCT.create(2048, dct_precision="high", use_pallas=False)
        mp = MDCT.create(2048, use_pallas=True, dct_precision="high")
        rng = np.random.default_rng(7)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 6 * 2048, 1)), dtype=jnp.float32
        )
        want = np.asarray(jax.jit(m.transform)(x))
        got = np.asarray(jax.jit(mp.transform)(x))
        # different 3-pass lowerings (XLA HIGH vs explicit bf16 split)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestHardwarePrngNoise:
    """Moments and calibration of the Box-Muller noise kernel — the test
    interpret mode cannot run (prng_random_bits is zeros there)."""

    @staticmethod
    def _noise(seed):
        from audiocodec_tpu.ops.pallas_noise import add_masked_noise_pallas

        shape = (8, 64, 1024, 1)  # 524288 samples

        @jax.jit
        def f(seed):
            return add_masked_noise_pallas(
                jnp.zeros(shape, jnp.float32),
                jnp.ones(shape, jnp.float32),
                seed,
            )

        return np.asarray(f(seed)).ravel()

    def test_moments_match_sigma_over_6(self):
        z = self._noise(0)
        n = z.size
        sigma = 1.0 / 6.0
        # mean: 5-sigma band of the sample-mean estimator
        assert abs(z.mean()) < 5 * sigma / np.sqrt(n)
        # std: estimator sd ~ sigma/sqrt(2n) ~ 0.1%; allow 1%
        assert abs(z.std() / sigma - 1.0) < 0.01
        # 3-sigma exceedance: the reference's calibration comment promises
        # ~0.2%-0.3% of samples outside threshold (2*Phi(-3) = 0.27%)
        frac = float((np.abs(z) > 3 * sigma).mean())
        assert 0.0020 < frac < 0.0035
        # normality beyond variance: kurtosis of N(0,1) is 3
        kurt = float(((z / z.std()) ** 4).mean())
        assert abs(kurt - 3.0) < 0.1

    def test_seed_reproducibility(self):
        a, b, c = self._noise(7), self._noise(7), self._noise(8)
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() > 1e-3

    def test_threshold_scales_sigma(self):
        """Per-element sigma tracks the threshold (sigma = threshold/6)."""
        from audiocodec_tpu.ops.pallas_noise import add_masked_noise_pallas

        shape = (8, 64, 1024, 1)
        thr = np.zeros(shape, np.float32)
        thr[:4] = 0.5
        thr[4:] = 2.0

        @jax.jit
        def f(thr):
            return add_masked_noise_pallas(
                jnp.zeros(shape, jnp.float32), thr, 3
            )

        z = np.asarray(f(jnp.asarray(thr)))
        assert abs(z[:4].std() / (0.5 / 6) - 1.0) < 0.02
        assert abs(z[4:].std() / (2.0 / 6) - 1.0) < 0.02


class TestQuantizedQualityOnHardware:
    """SNR gates for the production paths, on-device end to end."""

    @staticmethod
    def _two_tone(sr, dur, dtype):
        t = np.arange(int(sr * dur)) / sr
        rng = np.random.default_rng(0)
        wave = (
            0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.3 * np.sin(2 * np.pi * 1320 * t)
            + 0.05 * rng.normal(size=t.size)
        ).astype(np.float32)
        wave = wave[: wave.size // 1024 * 1024]
        return jnp.asarray(wave[None, :, None], dtype=dtype)

    @staticmethod
    def _snr(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        return 10 * np.log10((x**2).sum() / max(((x - y) ** 2).sum(), 1e-30))

    def test_f32_quantized_snr(self):
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(44100, filters_n=1024, bark_bands_n=64)
        x = self._two_tone(44100, 2.0, jnp.float32)
        out = np.asarray(jax.jit(codec.round_trip_quantized)(x))[:, 1024:-1024]
        # nominal 18.96 dB on this workload (benchmarks/RESULTS.md) minus
        # a ~0.5 dB margin
        assert self._snr(np.asarray(x), out) > 18.4

    def test_dense_default_production_path_snr(self):
        """The production path (dct_precision="default": dense two-matmul
        MDCT + one-pass Bark contractions) must hold the f32 quality gate
        on the real device, where DEFAULT really is a single bf16 pass."""
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(
            44100, filters_n=1024, bark_bands_n=64, dct_precision="default"
        )
        assert codec.mdct.dense_fwd_cur is not None
        assert codec.psycho.bark_precision == "default"
        x = self._two_tone(44100, 2.0, jnp.float32)
        out = np.asarray(jax.jit(codec.round_trip_quantized)(x))[:, 1024:-1024]
        # measured 18.93 dB on this workload (vs 18.96 at HIGHEST)
        assert self._snr(np.asarray(x), out) > 18.4

    def test_bf16_fast_quantized_snr(self):
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(
            44100, filters_n=1024, bark_bands_n=64,
            compute_dtype=jnp.bfloat16, fast_bf16=True,
        )
        x = self._two_tone(44100, 2.0, jnp.bfloat16)
        out = np.asarray(
            jax.jit(codec.round_trip_quantized)(x).astype(jnp.float32)
        )[:, 1024:-1024]
        assert self._snr(np.asarray(x.astype(jnp.float32)), out) > 16.0


class TestResamplerOnHardware:
    """The polyphase conv lowers onto the MXU; verify the quality claims
    survive compiled TPU execution (conv tiling, f32 HIGHEST path)."""

    def test_tone_snr_on_device(self):
        from audiocodec_tpu.resample import Resampler

        r = Resampler.create(44100, 16000)
        t = np.arange(44100 * 2) / 44100
        x = jnp.asarray(
            np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None, :, None]
        )
        y = np.asarray(jax.jit(lambda r, x: r.resample(x))(r, x))[0, :, 0]
        ref = np.sin(2 * np.pi * 1000 * np.arange(y.size) / 16000)
        m = slice(2000, y.size - 2000)
        err = ref[m] - y[m]
        snr = 10 * np.log10((ref[m] ** 2).sum() / (err**2).sum())
        assert snr > 90.0

    def test_matches_cpu_reference(self):
        """Device conv vs host float64 reference of the same tap matrix:
        the HIGHEST-precision conv must stay within f32 accumulation
        error (a silent one-pass bf16 lowering would show ~1e-3)."""
        from audiocodec_tpu.resample import Resampler

        r = Resampler.create(16000, 48000)
        rng = np.random.default_rng(1)
        x = rng.uniform(-0.8, 0.8, (1, 4000, 1)).astype(np.float32)
        got = np.asarray(r.resample(jnp.asarray(x)))
        # host float64 oracle via the same windows
        k = np.asarray(r.kernel, dtype=np.float64)[:, 0, :]  # [L, W]
        xp = np.zeros(r.pad_left + x.shape[1] + r.window_n, np.float64)
        xp[r.pad_left : r.pad_left + x.shape[1]] = x[0, :, 0]
        blocks = got.shape[1] // r.up
        want = np.empty((blocks, r.up))
        for b in range(blocks):
            want[b] = k @ xp[b * r.down : b * r.down + r.window_n]
        want = want.reshape(-1)[: got.shape[1]]
        np.testing.assert_allclose(got[0, :, 0], want, atol=5e-6)


class TestRVQOnHardware:
    """One-hot matmul codeword lookup on the MXU: argmin/one-hot must
    agree with the CPU result on identical inputs."""

    def test_quantize_matches_cpu(self):
        from audiocodec_tpu.models import rvq as _rvq

        rcfg = _rvq.RVQ(stages=3, codebook_size=64, dim=16)
        state = _rvq.init_state(jax.random.key(0), rcfg)
        rng = np.random.default_rng(2)
        z = jnp.asarray(rng.normal(size=(2, 8, 16, 1)) * 0.3, jnp.float32)
        z_q, codes, _ = jax.jit(
            lambda s, z: _rvq.quantize(rcfg, s, z)
        )(state, z)
        # decode path reproduces the quantized latents exactly
        z_dec = _rvq.decode_codes(rcfg, state, codes)
        np.testing.assert_allclose(
            np.asarray(z_dec), np.asarray(z_q), atol=1e-5
        )
        assert int(np.asarray(codes).min()) >= 0
        assert int(np.asarray(codes).max()) < 64


class TestRadixKernelsOnHardware:
    """Compiled Mosaic radix kernels (rotation + two half-size matmuls +
    lane-shift butterfly) vs the XLA path — the lane rolls and the
    butterfly masks only exist in compiled Mosaic, so this is their one
    real codegen check."""

    @pytest.fixture(scope="class")
    def rpair(self):
        from audiocodec_tpu.mdct import MDCT

        return (
            MDCT.create(1024),
            MDCT.create(1024, use_pallas=True, pallas_kernel="radix"),
        )

    def test_forward_matches_xla(self, rpair):
        m, mr = rpair
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-1, 1, (2, 16 * 1024, 1)), dtype=jnp.float32
        )
        got = np.asarray(mr.transform(x))
        want = np.asarray(m.transform(x))
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_inverse_matches_xla(self, rpair):
        m, mr = rpair
        rng = np.random.default_rng(1)
        y = jnp.asarray(
            rng.uniform(-0.5, 0.5, (2, 12, 1024, 1)), dtype=jnp.float32
        )
        got = np.asarray(mr.inverse_transform(y))
        want = np.asarray(m.inverse_transform(y))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_round_trip_perfect_reconstruction(self, rpair):
        _, mr = rpair
        rng = np.random.default_rng(2)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 12 * 1024, 1)), dtype=jnp.float32
        )
        rt = np.asarray(mr.inverse_transform(mr.transform(x)))
        err = float(np.max(np.abs(np.asarray(x) - rt[:, 1024:-1024])))
        assert err < 1e-5, err

    def test_n2048_highest_radix_only_size(self):
        """highest-precision kernels at N=2048 exist ONLY in the radix
        design (quarter residents); mono is VMEM-ineligible there."""
        from audiocodec_tpu.mdct import MDCT

        m = MDCT.create(2048)
        mr = MDCT.create(2048, use_pallas=True, pallas_kernel="radix")
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 6 * 2048, 1)), dtype=jnp.float32
        )
        got = np.asarray(mr.transform(x))
        want = np.asarray(m.transform(x))
        np.testing.assert_allclose(got, want, atol=5e-6)


class TestCodedToolsOnHardware:
    """TNS + noise filling compile and hold their quality contracts on
    the real device: the TNS inverse is a lax.scan over frequency and
    the fill is a per-frame threefry draw — both only meaningfully
    covered by compiled execution."""

    @staticmethod
    def _snr(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        return 10 * np.log10((x**2).sum() / max(((x - y) ** 2).sum(), 1e-30))

    def test_tns_nf_round_trip_on_device(self):
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(44100, filters_n=1024, bark_bands_n=64)
        t = np.arange(4 * 44100) / 44100
        rng = np.random.default_rng(5)
        wave = (
            0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.normal(size=t.size)
        ).astype(np.float32)
        wave = wave[: wave.size // 1024 * 1024]
        x = jnp.asarray(wave[None, :, None])

        @jax.jit
        def enc_dec(c, xx):
            frames = c.mdct.transform(xx)
            codes, bark, tns_idx, nfl = c.quantize_frames_tns(
                frames, threshold_scale=4.0, nf=True
            )
            out = c.decode_bitstream(
                codes, bark, threshold_scale=4.0,
                tns_idx=tns_idx, nf_levels=nfl,
            )
            return out, nfl

        out, nfl = enc_dec(codec, x)
        out = np.asarray(out)[:, 1024:-1024]
        assert np.isfinite(out).all()
        # scale-4 quantization of a HEAVILY noisy signal (the -10 dB
        # white-noise bed itself quantizes coarsely): measured 4.96 dB
        # on BOTH the real chip and CPU (identical to 1e-5 dB) — gate at
        # measured-minus-margin
        assert self._snr(wave[None, :, None], out) > 4.0

    def test_fill_noise_matches_cpu(self):
        """The fill is bitstream-adjacent: the device's threefry draw
        must equal the CPU decoder's (format guarantee — a stream
        encoded here must decode identically anywhere)."""
        from audiocodec_tpu import nf

        rng = np.random.default_rng(6)
        spec = jnp.asarray(rng.normal(size=(1, 4, 256, 1)).astype(np.float32))
        codes = jnp.zeros((1, 4, 256, 1), jnp.int32)
        delta = jnp.full((1, 4, 256, 1), 0.5, jnp.float32)
        levels = jnp.full((1, 4, 1), 200, jnp.uint8)
        dev = np.asarray(
            jax.jit(lambda *a: nf.fill(*a, 16, 9))(
                spec, codes, delta, levels
            )
        )
        cpu = jax.jit(
            lambda *a: nf.fill(*a, 16, 9), backend="cpu"
        )(np.asarray(spec), np.asarray(codes), np.asarray(delta),
          np.asarray(levels))
        np.testing.assert_allclose(dev, np.asarray(cpu), atol=1e-6)


class TestBlockSwitchTmaskOnHardware:
    """Block switching + temporal masking on compiled TPU programs.

    The transition einsum runs at Precision.HIGHEST (multi-pass bf16 on
    the MXU — a different lowering from CPU f32), and the detector's
    contrast decision must survive it; the tmask log-doubling maxes are
    trivially portable but only compiled execution proves the fused
    program. The bitstream-critical derivations (flag bits, min-pooled
    thresholds from a given sidecar) must MATCH the CPU decoder exactly."""

    @staticmethod
    def _click_signal():
        rng = np.random.default_rng(7)
        n = 1024 * 64
        t = np.arange(n) / 44100
        x = 0.02 * np.sin(2 * np.pi * 330 * t)
        x += 0.003 * rng.standard_normal(n)
        for s0 in (20 * 1024, 40 * 1024 + 512):
            x[s0 : s0 + 600] += 0.8 * np.exp(
                -np.arange(600) / 120.0
            ) * rng.standard_normal(600)
        return x.astype(np.float32)

    def test_bs_flags_match_cpu(self):
        """The per-frame flags ARE wire bits: device and CPU encoders
        must agree on them for the same input."""
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(44100, filters_n=1024, bark_bands_n=64)
        x = jnp.asarray(self._click_signal()[None, :, None])

        @jax.jit
        def flags_of(c, xx):
            return c.analyze_for_quantization(
                c.mdct.transform(xx), bs=True
            )[3]

        dev = np.asarray(flags_of(codec, x))
        cpu_codec = Codec.create(
            44100, filters_n=1024, bark_bands_n=64, use_pallas=False
        )
        cpu = np.asarray(
            jax.jit(flags_of, backend="cpu")(
                cpu_codec, np.asarray(x)
            )
        )
        assert dev.any()
        np.testing.assert_array_equal(dev, cpu)

    def test_bs_round_trip_on_device(self):
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(44100, filters_n=1024, bark_bands_n=64)
        wave = self._click_signal()
        x = jnp.asarray(wave[None, :, None])

        @jax.jit
        def enc_dec(c, xx):
            enc = c.encode_frames(c.mdct.transform(xx), bs=True)
            out = c.decode_bitstream(
                enc.codes, enc.bark16, bs_flags=enc.bs_flags
            )
            return out, enc.bs_flags

        out, flags = enc_dec(codec, x)
        out = np.asarray(out)[:, 1024:-1024]
        assert np.asarray(flags).any()
        assert np.isfinite(out).all()
        snr = 10 * np.log10(
            (wave**2).sum() / ((wave - out[0, :, 0]) ** 2).sum()
        )
        assert snr > 6.0  # noisy-bed clicks at scale 1: ~8.7 nominal

    def test_tmask_sidecar_matches_cpu(self):
        """tmask flows into the bf16 sidecar (wire bytes): the spread
        intensities must round to identical bfloat16 on both backends
        (elementwise maxes/multiplies — no matmul in the spread)."""
        from audiocodec_tpu import psycho

        rng = np.random.default_rng(8)
        bark = (10.0 ** rng.uniform(-12, 0, (1, 48, 64, 1))).astype(
            np.float32
        )

        def spread16(b):
            return psycho.temporal_masking(b, 3.0).astype(jnp.bfloat16)

        dev = np.asarray(
            jax.jit(spread16)(jnp.asarray(bark))
        ).view(np.uint16)
        cpu = np.asarray(
            jax.jit(spread16, backend="cpu")(bark)
        ).view(np.uint16)
        np.testing.assert_array_equal(dev, cpu)

    def test_full_ladder_on_device(self):
        """The --preset low ladder (dz+tns+bs+nf+tmask) compiles and
        decodes cleanly as ONE program on the chip."""
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(44100, filters_n=1024, bark_bands_n=64)
        wave = self._click_signal()
        x = jnp.asarray(wave[None, :, None])

        @jax.jit
        def enc_dec(c, xx):
            enc = c.encode_frames(
                c.mdct.transform(xx), deadzone=1.0, tns=True, nf=True,
                tmask=130.0, bs=True,
            )
            return c.decode_bitstream(
                enc.codes, enc.bark16, dz_recon=0.45,
                tns_idx=enc.tns_idx, nf_levels=enc.nf_levels,
                bs_flags=enc.bs_flags,
            )

        out = np.asarray(enc_dec(codec, x))[:, 1024:-1024]
        assert np.isfinite(out).all()
        snr = 10 * np.log10(
            (wave**2).sum() / ((wave - out[0, :, 0]) ** 2).sum()
        )
        # ~7.96 nominal: nf's structural SNR cost (DESIGN.md §12) plus
        # the wide dead zone, on a noisy-bed transient signal
        assert snr > 5.5


class TestStereoToolsOnHardware:
    """Intensity stereo + grid-quantized sidecar on compiled TPU
    programs. The scq snap's f32 log2/round and the intensity
    projection's reductions are the wire-steering math that interpret
    mode executes as plain Python — only compiled execution proves the
    fused programs, and the decode must agree with the CPU decoder
    given the same wire data."""

    @staticmethod
    def _panned_signal():
        rng = np.random.default_rng(9)
        n = 1024 * 48
        t = np.arange(n) / 44100
        bass = 0.3 * np.sin(2 * np.pi * 220 * t)
        lo = sum(0.2 / k * np.sin(2 * np.pi * 6100 * k * t)
                 for k in (1, 2))
        hi = 0.2 * np.sin(2 * np.pi * 12500 * t)
        amb = 0.01 * rng.standard_normal((2, n))
        L = bass + 1.0 * lo + 0.2 * hi + amb[0]
        R = bass + 0.25 * lo + 0.9 * hi + amb[1]
        return np.stack([L, R], axis=-1).astype(np.float32)

    def test_intensity_wire_decodes_identically_on_cpu(self):
        """Device-encoded (codes, sidecar levels, gains) must decode to
        the same waveform on CPU within float-fusion tolerance — the
        wire is the contract, not the backend."""
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(44100, filters_n=1024, bark_bands_n=64)
        x = jnp.asarray(self._panned_signal()[None])

        @jax.jit
        def enc(c, xx):
            return c.encode_frames(
                c.mdct.transform(xx), threshold_scale=8.0, ms=True,
                nf=True, bwe=True, intensity=True,
            )

        e = enc(codec, x)
        codes = np.asarray(e.codes)
        bark = np.asarray(e.bark16)
        nfl = np.asarray(e.nf_levels)
        bweg = np.asarray(e.bwe_gains)
        isg = np.asarray(e.is_gains)
        # the forced side band is all-zero on the wire
        assert (codes[..., codec.is_start :, 1] == 0).all()
        assert (isg > 0).any()

        @jax.jit
        def dec(c, co, ba, nl, bg, ig):
            return c.decode_bitstream_ms(
                co, ba, threshold_scale=8.0, nf_levels=nl,
                bwe_gains=bg, is_gains=ig,
            )

        dev = np.asarray(dec(codec, e.codes, e.bark16, e.nf_levels,
                             e.bwe_gains, e.is_gains))
        cpu_codec = Codec.create(
            44100, filters_n=1024, bark_bands_n=64, use_pallas=False
        )
        cpu = np.asarray(
            jax.jit(dec, backend="cpu")(
                cpu_codec, codes, bark, nfl, bweg, isg
            )
        )
        assert np.isfinite(dev).all()
        err = np.abs(dev - cpu)
        scale = np.abs(cpu).max()
        assert err.max() <= 2e-4 * max(scale, 1.0), (
            f"device and CPU decodes of the same wire diverge: "
            f"max err {err.max():.3e} at signal scale {scale:.3f}"
        )

    def test_scq_levels_are_on_grid_and_decode_bit_exact(self):
        """Device-snapped sidecars must contain ONLY grid-table values
        (levels_from_bark16 raises otherwise) and reconstruct to the
        identical bfloat16 bits through the shared table."""
        from audiocodec_tpu import scq
        from audiocodec_tpu.codec import Codec

        codec = Codec.create(44100, filters_n=1024, bark_bands_n=64)
        x = jnp.asarray(self._panned_signal()[None])

        @jax.jit
        def sidecar(c, xx):
            return c.analyze_for_quantization(
                c.mdct.transform(xx), ms=True
            )[1]

        bark16 = np.asarray(sidecar(codec, x))
        lv = scq.levels_from_bark16(bark16, codec.sidecar_grid)
        back = scq.bark16_from_levels(lv, codec.sidecar_grid,
                                      bark16.shape)
        np.testing.assert_array_equal(
            np.asarray(back).view(np.uint16), bark16.view(np.uint16)
        )


class TestInt8OnHardware:
    """The int8 MXU tier's COMPILED kernels (docs/DESIGN.md §3c):
    interpret mode runs the same Python but not Mosaic's int8 dot path —
    only here is the int32-accumulate codegen itself verified."""

    def _snr(self, ref, deg):
        ref = np.asarray(ref, dtype=np.float64).ravel()
        err = ref - np.asarray(deg, dtype=np.float64).ravel()
        return 10 * np.log10(ref.dot(ref) / max(err.dot(err), 1e-30))

    def test_int8_kernels_compile_and_bound_error(self):
        from audiocodec_tpu.mdct import MDCT

        m_hi = MDCT.create(1024, dct_precision="highest")
        m_i8 = MDCT.create(1024, dct_precision="int8", use_pallas=True)
        assert m_i8.pfwd_mat.dtype == jnp.int8
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-0.9, 0.9, (2, 8 * 1024, 1)), jnp.float32
        )
        got = np.asarray(jax.jit(m_i8.transform)(x))
        want = jax.jit(m_hi.transform)(x)
        assert self._snr(want, got) > 40.0
        y = jnp.asarray(
            rng.uniform(-0.5, 0.5, (2, 8, 1024, 1)), jnp.float32
        )
        got = np.asarray(jax.jit(m_i8.inverse_transform)(y))
        want = jax.jit(m_hi.inverse_transform)(y)
        assert self._snr(want, got) > 38.0

    def test_int8_matches_host_emulation(self):
        """Compiled Mosaic int8 analysis kernel vs an independent numpy
        oracle of the same math (swizzle, f32 fold, per-row symmetric
        quantize, EXACT integer matmul, static rescale). Integer products
        are exact in int32, the per-row scales deterministic — only the
        f32 fold and rescale epilogue may differ by ulps. (Interpret-mode
        comparison is unusable on this rig: the interpreter dispatches
        every per-grid-step op through the remote tunnel.)"""
        from audiocodec_tpu.mdct import MDCT

        n, h, blocks = 256, 128, 4
        m_i8 = MDCT.create(n, dct_precision="int8", use_pallas=True)
        rng = np.random.default_rng(1)
        x = rng.uniform(-0.9, 0.9, (blocks * n,)).astype(np.float32)
        got_hw = np.asarray(
            jax.jit(m_i8.transform)(jnp.asarray(x[None, :, None]))
        )[0, :, :, 0]

        wa = np.asarray(m_i8.pfwd_wa, np.float32)[0]
        wb = np.asarray(m_i8.pfwd_wb, np.float32)[0]
        qm = np.asarray(m_i8.pfwd_mat, np.int64)
        scale = m_i8.pallas_int8_scale[0]
        frames = x.reshape(blocks, n)
        xs = np.concatenate([frames[:, :h][:, ::-1], frames[:, h:]], axis=1)
        want = np.zeros((blocks + 1, n), np.float64)
        for t in range(blocks + 1):
            prev = xs[t - 1] if t >= 1 else np.zeros(n, np.float32)
            cur = xs[t] if t < blocks else np.zeros(n, np.float32)
            ta = (prev * wa).astype(np.float32)
            tc = (cur * wb).astype(np.float32)
            folded = np.concatenate(
                [ta[:h] + ta[h:], tc[:h] + tc[h:]]
            ).astype(np.float32)
            s = float(np.max(np.abs(folded))) + 1e-12
            q = np.clip(
                np.round(folded.astype(np.float64) * (127.0 / s)),
                -127, 127,
            ).astype(np.int64)
            want[t] = q @ qm * (s * scale)
        np.testing.assert_allclose(got_hw, want, atol=2e-5)

    def test_int8_auto_resolution_on_tpu(self):
        """auto turns kernels ON for bf16-fast int8, OFF for f32 int8
        (measured composed winners — docs/DESIGN.md §3c)."""
        from audiocodec_tpu.mdct import MDCT

        m_bf = MDCT.create(1024, compute_dtype=jnp.bfloat16,
                           fast_bf16=True, dct_precision="int8")
        assert m_bf.use_pallas is True
        m_f32 = MDCT.create(1024, dct_precision="int8")
        assert m_f32.use_pallas is False

    def test_int8_codec_snr_gate_on_device(self):
        """Composed quantized SNR through the compiled int8 kernels."""
        from audiocodec_tpu.codec import Codec

        sr = 44100
        codec = Codec.create(
            sr, filters_n=1024, bark_bands_n=64,
            compute_dtype=jnp.bfloat16, fast_bf16=True,
            dct_precision="int8", use_pallas=True,
        )
        t = np.arange(int(sr * 2.0) // 1024 * 1024) / sr
        rng = np.random.default_rng(2)
        x = jnp.asarray(
            np.clip(
                0.4 * np.sin(2 * np.pi * 440 * t)
                + 0.3 * np.sin(2 * np.pi * 1320 * t)
                + 0.05 * rng.normal(size=t.size), -1, 1
            ).astype(np.float32)[None, :, None],
            dtype=jnp.bfloat16,
        )
        out = np.asarray(
            jax.jit(codec.round_trip_quantized)(x).astype(jnp.float32)
        )[:, 1024:-1024]
        ref = np.asarray(x.astype(jnp.float32), dtype=np.float64)
        err = ((ref - out.astype(np.float64)) ** 2).sum()
        snr = 10 * np.log10((ref**2).sum() / max(err, 1e-30))
        # bf16-fast default gates at 16.0 on this two-tone family; int8
        # adds ~0.1 dB of transform noise
        assert snr > 15.8, snr
