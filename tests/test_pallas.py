"""Fused Pallas MDCT kernel tests (interpreter mode on CPU; the same
kernels compile for real TPU — exercised by bench + the opt-in `-m tpu`
hardware lane)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from audiocodec_tpu.mdct import MDCT
from audiocodec_tpu.ops import pallas_mdct as pallas_mdct


@pytest.fixture(scope="module")
def pair():
    n = 256
    return MDCT.create(n), MDCT.create(n, use_pallas=True)


class TestPallasForward:
    @pytest.mark.parametrize(
        "shape",
        [
            (1, 3, 1),  # single tile (blocks+1 < tile)
            (2, 7, 2),  # multi-row
            (1, 127, 1),  # one frame short of a full tile
            (1, 128, 1),  # blocks+1 == tile+1 -> 2 tiles, last has 1 frame
            (2, 230, 2),  # interior + ragged tail tiles
        ],
    )
    def test_matches_xla_path(self, pair, shape):
        m, mp = pair
        b, blocks, c = shape
        rng = np.random.default_rng(blocks)
        x = jnp.asarray(
            rng.uniform(-1, 1, (b, blocks * 256, c)), dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            got = mp.transform(x)
        want = m.transform(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )

    @pytest.mark.parametrize("n", [512, 1024])
    def test_larger_blocks(self, n):
        m, mp = MDCT.create(n), MDCT.create(n, use_pallas=True)
        rng = np.random.default_rng(n)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 5 * n, 1)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = mp.transform(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(m.transform(x)), atol=1e-6
        )


class TestPallasLongBlocks:
    """N=2048 runs at dct_precision="high": the bf16 hi/lo pre-split
    residents sidestep Mosaic's f32 operand decomposition, whose scoped
    VMEM demand caps the "highest" tier at N=1024 (pallas_mdct._mxu)."""

    def test_n2048_forward_inverse_high_precision(self):
        n, blocks = 2048, 3
        m = MDCT.create(n, dct_precision="high")
        mp = MDCT.create(n, use_pallas=True, dct_precision="high")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, blocks * n, 1)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = mp.transform(x)
        # "high" tiers differ in lowering (XLA 3-pass vs the kernel's
        # explicit bf16 hi/lo split) — agreement to the split's ~1e-5
        # relative error, not bit-exact
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(m.transform(x)), atol=1e-4
        )
        y = jnp.asarray(rng.uniform(-0.5, 0.5, (1, blocks, n, 1)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            gi = mp.inverse_transform(y)
        np.testing.assert_allclose(
            np.asarray(gi), np.asarray(m.inverse_transform(y)), atol=5e-3
        )

    def test_n2048_highest_mono_rejected_radix_takes_over(self):
        """The MONO kernel's HIGHEST tier caps at N=1024 (Mosaic's f32
        operand decomposition); pallas_kernel='auto' therefore falls
        through to the radix design at N=2048 HIGHEST, which is
        eligible AND measured faster than XLA there (DESIGN.md §3)."""
        with pytest.raises(ValueError, match="scoped VMEM"):
            MDCT.create(2048, use_pallas=True, pallas_kernel="mono")
        m = MDCT.create(2048, use_pallas=True)  # auto -> radix
        assert m.pallas_kernel == "radix"

    def test_high_precision_round_trip(self):
        """The manual bf16x3 split must still reconstruct: PR error at
        the split tier's tolerance."""
        n = 512
        mp = MDCT.create(n, use_pallas=True, dct_precision="high")
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 6 * n, 1)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            rt = mp.inverse_transform(mp.transform(x))
        err = float(jnp.max(jnp.abs(x - rt[:, n:-n])))
        assert err < 1e-3, err


class TestPallasInverse:
    @pytest.mark.parametrize("blocks", [3, 127, 128, 230])
    def test_matches_xla_path(self, pair, blocks):
        m, mp = pair
        rng = np.random.default_rng(blocks)
        y = jnp.asarray(
            rng.uniform(-0.5, 0.5, (2, blocks, 256, 2)), dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            got = mp.inverse_transform(y)
        want = m.inverse_transform(y)
        # values are O(10) (sqrt(4N) folded into the matrix), so this is
        # ~1e-5 relative f32 rounding between the two matmul orderings
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )


class TestPallasRoundTrip:
    def test_perfect_reconstruction(self, pair):
        _, mp = pair
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 10 * 256, 1)), dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            rt = mp.inverse_transform(mp.transform(x))
        err = float(jnp.max(jnp.abs(x - rt[:, 256:-256])))
        assert err < 1e-5


class TestPallasValidation:
    def test_bad_filters_n_rejected(self):
        with pytest.raises(ValueError, match="multiple of 256"):
            MDCT.create(192, use_pallas=True)
        with pytest.raises(ValueError, match="multiple of 256"):
            MDCT.create(128, use_pallas=True)
        with pytest.raises(ValueError, match="1024"):
            MDCT.create(8192, use_pallas=True)  # "highest" caps at 1024
        with pytest.raises(ValueError, match="2048"):
            MDCT.create(4096, use_pallas=True, dct_precision="high")

    def test_float64_rejected(self):
        with pytest.raises(ValueError, match="float64"):
            MDCT.create(256, use_pallas=True, compute_dtype=jnp.float64)

    def test_bad_value_rejected(self):
        with pytest.raises(ValueError, match="use_pallas must be one of"):
            MDCT.create(256, use_pallas="both")


class TestUsePallasModes:
    def test_auto_resolves_false_off_tpu(self):
        """On this CPU test backend, 'auto' must resolve to the XLA path
        (Mosaic kernels only run at speed on a real TPU)."""
        m = MDCT.create(1024)  # default use_pallas="auto"
        assert m.use_pallas is False
        assert m.pfwd_mat is None and m.pinv_mat is None
        # ineligible sizes never raise under auto
        assert MDCT.create(192).use_pallas is False
        assert MDCT.create(
            256, compute_dtype=jnp.float64
        ).use_pallas is False

    def test_directional_modes(self):
        mf = MDCT.create(256, use_pallas="forward")
        assert mf.pfwd_mat is not None and mf.pinv_mat is None
        mi = MDCT.create(256, use_pallas="inverse")
        assert mi.pfwd_mat is None and mi.pinv_mat is not None
        mb = MDCT.create(256, use_pallas=True)
        assert mb.pfwd_mat is not None and mb.pinv_mat is not None

    def test_inverse_only_mode_matches_xla(self):
        """'inverse' (the auto-on-TPU resolution) runs XLA forward and the
        kernel inverse; both directions must agree with the pure-XLA MDCT."""
        m = MDCT.create(256, use_pallas=False)
        mi = MDCT.create(256, use_pallas="inverse")
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 6 * 256, 1)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(mi.transform(x)), np.asarray(m.transform(x))
        )
        y = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 6, 256, 1)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = mi.inverse_transform(y)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(m.inverse_transform(y)), atol=1e-4
        )


class TestPallasGradients:
    def test_vjp_matches_xla_path(self, pair):
        """The custom VJP (the mirror kernel on the block-reversed
        cotangent) must agree with the autodiff gradient of the XLA path."""
        m, mp = pair
        rng = np.random.default_rng(9)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 5 * 256, 1)), dtype=jnp.float32
        )

        def loss(mm, x):
            return jnp.sum(mm.transform(x) ** 2)

        g_xla = jax.grad(lambda x: loss(m, x))(x)
        with pltpu.force_tpu_interpret_mode():
            g_pal = jax.grad(lambda x: loss(mp, x))(x)
        np.testing.assert_allclose(
            np.asarray(g_pal), np.asarray(g_xla), atol=2e-5
        )

    def test_inverse_vjp_matches_xla_path(self, pair):
        m, mp = pair
        rng = np.random.default_rng(10)
        y = jnp.asarray(
            rng.uniform(-0.5, 0.5, (1, 5, 256, 1)), dtype=jnp.float32
        )

        def loss(mm, y):
            return jnp.sum(mm.inverse_transform(y) ** 2)

        g_xla = jax.grad(lambda y: loss(m, y))(y)
        with pltpu.force_tpu_interpret_mode():
            g_pal = jax.grad(lambda y: loss(mp, y))(y)
        # inverse values are O(10); gradient is 2*sqrt(4N)-scaled
        np.testing.assert_allclose(
            np.asarray(g_pal), np.asarray(g_xla), atol=2e-3
        )

    def test_vjp_through_round_trip(self, pair):
        _, mp = pair
        x = jnp.ones((1, 3 * 256, 1), dtype=jnp.float32) * 0.3

        def loss(x):
            y = mp.inverse_transform(mp.transform(x))
            return jnp.sum(y**2)

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss)(x)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestRadixKernels:
    """Radix-2 split kernel design (pallas_mdct._radix_pieces): a
    rotation layer + two [N/2, N/2] matmuls + a one-lane-shift butterfly
    — exactly the single-matmul kernels' output, at half the MACs and a
    quarter of the resident bytes."""

    @pytest.fixture(scope="class")
    def rpair(self):
        n = 256
        return (
            MDCT.create(n),
            MDCT.create(n, use_pallas=True, pallas_kernel="radix"),
        )

    @pytest.mark.parametrize(
        "shape", [(1, 3, 1), (2, 7, 2), (1, 127, 1), (2, 130, 2)]
    )
    def test_forward_matches_xla(self, rpair, shape):
        m, mr = rpair
        b, blocks, c = shape
        rng = np.random.default_rng(blocks)
        x = jnp.asarray(
            rng.uniform(-1, 1, (b, blocks * 256, c)), dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            got = mr.transform(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(m.transform(x)), atol=1e-6
        )

    @pytest.mark.parametrize("blocks", [3, 127, 130])
    def test_inverse_matches_xla(self, rpair, blocks):
        m, mr = rpair
        rng = np.random.default_rng(blocks)
        y = jnp.asarray(
            rng.uniform(-0.5, 0.5, (2, blocks, 256, 2)), dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            got = mr.inverse_transform(y)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(m.inverse_transform(y)), atol=1e-4
        )

    def test_perfect_reconstruction(self, rpair):
        _, mr = rpair
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 10 * 256, 1)), dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            rt = mr.inverse_transform(mr.transform(x))
        err = float(jnp.max(jnp.abs(x - rt[:, 256:-256])))
        assert err < 1e-5

    @pytest.mark.parametrize("n", [512, 1024])
    def test_larger_blocks(self, n):
        m = MDCT.create(n)
        mr = MDCT.create(n, use_pallas=True, pallas_kernel="radix")
        rng = np.random.default_rng(n)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 5 * n, 1)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = mr.transform(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(m.transform(x)), atol=2e-6
        )

    def test_every_window_type(self):
        for wt in ("sine", "vorbis", None, "rect"):
            m = MDCT.create(256, window_type=wt)
            mr = MDCT.create(
                256, window_type=wt, use_pallas=True, pallas_kernel="radix"
            )
            rng = np.random.default_rng(1)
            x = jnp.asarray(
                rng.uniform(-1, 1, (1, 4 * 256, 1)), dtype=jnp.float32
            )
            with pltpu.force_tpu_interpret_mode():
                got = mr.transform(x)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(m.transform(x)), atol=1e-6,
                err_msg=f"window {wt}",
            )

    def test_forward_vjp_matches_xla(self, rpair):
        m, mr = rpair
        rng = np.random.default_rng(9)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 5 * 256, 1)), dtype=jnp.float32
        )

        def loss(mm, x):
            return jnp.sum(mm.transform(x) ** 2)

        g_xla = jax.grad(lambda x: loss(m, x))(x)
        with pltpu.force_tpu_interpret_mode():
            g_rad = jax.grad(lambda x: loss(mr, x))(x)
        np.testing.assert_allclose(
            np.asarray(g_rad), np.asarray(g_xla), atol=2e-5
        )

    def test_inverse_vjp_matches_xla(self, rpair):
        m, mr = rpair
        rng = np.random.default_rng(10)
        y = jnp.asarray(
            rng.uniform(-0.5, 0.5, (1, 5, 256, 1)), dtype=jnp.float32
        )

        def loss(mm, y):
            return jnp.sum(mm.inverse_transform(y) ** 2)

        g_xla = jax.grad(lambda y: loss(m, y))(y)
        with pltpu.force_tpu_interpret_mode():
            g_rad = jax.grad(lambda y: loss(mr, y))(y)
        np.testing.assert_allclose(
            np.asarray(g_rad), np.asarray(g_xla), atol=2e-3
        )

    def test_radix_only_sizes_eligible(self):
        """The quarter-size residents move the HIGHEST VMEM ceiling to
        2048 (the mono design caps at 1024 there). N=4096 is ineligible
        for every kernel/tier: the radix forward measured a tie with XLA
        there and the radix inverse crashes the hardware compiler
        (mdct.py create comment, 2026-08-19)."""
        m = MDCT.create(
            2048, use_pallas=True, pallas_kernel="radix"
        )  # highest
        assert m.pfwd_mat.shape == (2, 1024, 1024)
        with pytest.raises(ValueError, match="2048"):
            MDCT.create(
                4096, use_pallas=True, pallas_kernel="radix",
                dct_precision="high",
            )
        with pytest.raises(ValueError, match="2048"):
            MDCT.create(4096, use_pallas=True, pallas_kernel="radix")

    def test_bad_kernel_value_rejected(self):
        with pytest.raises(ValueError, match="pallas_kernel"):
            MDCT.create(256, use_pallas=True, pallas_kernel="fft")

    def test_kernel_auto_resolution_table(self):
        """pallas_kernel='auto' resolves to the hardware-measured winner
        per (precision tier, block size) — docs/DESIGN.md §3: mono wins
        every composed config inside its caps; radix extends multi-pass
        tiers one block size further; one-pass 'default' never falls
        through to radix (measured loss)."""
        assert MDCT.create(1024).pallas_kernel == "mono"
        assert MDCT.create(1024, dct_precision="high").pallas_kernel == "mono"
        assert (
            MDCT.create(2048, dct_precision="high").pallas_kernel == "mono"
        )
        # past mono's cap at multi-pass precision: radix takes over
        assert MDCT.create(2048).pallas_kernel == "radix"  # highest tier
        # one-pass default: mono even past its cap (radix measured loss)
        assert (
            MDCT.create(4096, dct_precision="default").pallas_kernel
            == "mono"
        )
        # N=4096 multi-pass also resolves radix, but eligibility then
        # stands the kernels down entirely (tie fwd / compiler-crash inv
        # on hardware — create comment): auto never errors there
        m4 = MDCT.create(4096, dct_precision="high")
        assert m4.use_pallas is False

    def test_n2048_high_tier(self):
        """Radix at N=2048 'high': bf16 hi/lo split residents."""
        n, blocks = 2048, 3
        m = MDCT.create(n, dct_precision="high")
        mr = MDCT.create(
            n, use_pallas=True, dct_precision="high", pallas_kernel="radix"
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, blocks * n, 1)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = mr.transform(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(m.transform(x)), atol=1e-4
        )

    def test_factorization_identity_f64(self):
        """The radix factors compose EXACTLY (f64) to the permuted DCT-IV
        matrices the mono kernels use — checked as matrices, independent
        of pallas: rotation + two half-matmuls + butterfly == Mmono."""
        from audiocodec_tpu.ops import pallas_mdct as pm

        for n in (64, 256, 1024):
            h = n // 2
            _, _, mono = pm.forward_params(n, "vorbis")
            _, _, rot1, rot2, p, q = pm.radix_forward_params(n, "vorbis")
            eye = np.eye(n)
            swap = np.concatenate([eye[:, h:], eye[:, :h]], axis=1)
            rt = eye * rot1 + swap * rot2
            u = rt[:, :h] @ p
            v2 = rt[:, h:] @ q
            xe = u.copy()
            xe[:, 1:] += v2[:, :-1]
            xo = -v2
            xo[:, :-1] += u[:, 1:]
            # interleave even/odd columns -> standard order
            full = np.empty((n, n))
            full[:, 0::2] = xe
            full[:, 1::2] = xo
            np.testing.assert_allclose(full, mono, atol=1e-13)

            _, _, ms = pm.inverse_params(n, "vorbis")
            _, _, ra, rb, pi, qi = pm.radix_inverse_params(n, "vorbis")
            # deinterleave input -> butterfly -> matmuls -> rotation
            deint = np.zeros((n, n))
            deint[0::2, :h] = np.eye(h)   # std row 2j -> split lane j
            deint[1::2, h:] = np.eye(h)   # std row 2j+1 -> lane h+j
            ye, yo = deint[:, :h], deint[:, h:]
            us = ye.copy()
            us[:, 1:] += yo[:, :-1]
            vs = -yo
            vs[:, :-1] += ye[:, 1:]
            rs = us @ pi
            ts = vs @ qi
            zfull = (
                np.concatenate([rs, rs], axis=1) * ra
                + np.concatenate([ts, ts], axis=1) * rb
            )
            np.testing.assert_allclose(zfull, ms, atol=1e-11)

    def test_bf16_fast_default_tier(self):
        """bf16 fast path: rotation + matmuls run in bf16 (one-pass tier,
        mono-kernel policy); agreement at bf16 rounding, PR at the
        reference's own bf16 error level (~2e-2)."""
        n = 256
        m = MDCT.create(n, compute_dtype=jnp.bfloat16, fast_bf16=True)
        mr = MDCT.create(
            n, compute_dtype=jnp.bfloat16, fast_bf16=True,
            use_pallas=True, pallas_kernel="radix",
            dct_precision="default",
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 6 * n, 1)), jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(mr.transform(x), dtype=np.float32)
        want = np.asarray(m.transform(x), dtype=np.float32)
        assert np.max(np.abs(got - want)) < 1e-3
        with pltpu.force_tpu_interpret_mode():
            rt = mr.inverse_transform(mr.transform(x))
        err = float(jnp.max(jnp.abs(
            x.astype(jnp.float32) - rt[:, n:-n].astype(jnp.float32)
        )))
        assert err < 5e-2, err


class TestInt8Kernels:
    """dct_precision="int8" on the Pallas tier (docs/DESIGN.md §3c):
    host-quantized int8 residents, flat per-row dynamic quantization on
    the analysis kernel, per-128-lane GROUPED quantization on the
    synthesis kernel (spectra run 30+ dB of crest — a flat per-row scale
    there puts error above the masking threshold; grouped scales track
    the envelope). int32 accumulation, one static f32 rescale."""

    def _snr(self, ref, deg):
        ref = np.asarray(ref, dtype=np.float64).ravel()
        err = ref - np.asarray(deg, dtype=np.float64).ravel()
        return 10 * np.log10(ref.dot(ref) / max(err.dot(err), 1e-30))

    @pytest.fixture(scope="class")
    def i8pair(self):
        n = 256
        return (
            MDCT.create(n, dct_precision="highest"),
            MDCT.create(n, dct_precision="int8", use_pallas=True),
        )

    def test_residents_are_int8(self, i8pair):
        _, mp = i8pair
        assert mp.pfwd_mat.dtype == jnp.int8
        assert mp.pinv_mat.dtype == jnp.int8
        fs, inv_s = mp.pallas_int8_scale
        assert fs > 0 and inv_s > 0

    def test_forward_snr(self, i8pair):
        m, mp = i8pair
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 7 * 256, 1)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = jax.jit(mp.transform)(x)
        assert self._snr(m.transform(x), got) > 40.0

    def test_inverse_grouped_snr(self, i8pair):
        m, mp = i8pair
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 6, 256, 1)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = jax.jit(mp.inverse_transform)(y)
        assert self._snr(m.inverse_transform(y), got) > 38.0

    def test_inverse_grouped_tracks_envelope(self, i8pair):
        """The grouped tier's raison d'etre: on a PEAKY spectrum (60 dB
        between groups) the per-group scales keep quiet-band error far
        below what one flat per-row scale allows."""
        m, mp = i8pair
        rng = np.random.default_rng(2)
        y = rng.uniform(-1.0, 1.0, (1, 6, 256, 1))
        y[:, :, 128:] *= 1e-3  # quiet upper half (separate lane groups)
        y = jnp.asarray(y, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = jax.jit(mp.inverse_transform)(y)
        want = m.inverse_transform(y)
        # quiet-half content reconstructs with its OWN relative accuracy:
        # project error against the quiet half's contribution alone
        y_quiet = y.at[:, :, :128].set(0.0)
        want_q = m.inverse_transform(y_quiet)
        with pltpu.force_tpu_interpret_mode():
            got_q = jax.jit(mp.inverse_transform)(y_quiet)
        assert self._snr(want_q, got_q) > 38.0  # not drowned by loud half
        assert self._snr(want, got) > 38.0

    def test_round_trip(self, i8pair):
        _, mp = i8pair
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8 * 256, 1)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            rt = jax.jit(
                lambda v: mp.inverse_transform(mp.transform(v))
            )(x)
        assert self._snr(x, rt[:, 256:-256]) > 38.0

    def test_bf16_compute(self):
        m = MDCT.create(256, compute_dtype=jnp.bfloat16, fast_bf16=True,
                        dct_precision="int8", use_pallas=True)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 5 * 256, 1)), jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            rt = jax.jit(
                lambda v: m.inverse_transform(m.transform(v))
            )(x)
        err = float(jnp.max(jnp.abs(
            (x - rt[:, 256:-256]).astype(jnp.float32)
        )))
        assert err < 0.1

    def test_ste_gradients(self, i8pair):
        """The int8 VJP is straight-through (dequantized resident at
        one-pass precision): finite, nonzero, and close to the float
        path's gradient."""
        m, mp = i8pair
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 5 * 256, 1)), jnp.float32)
        loss = lambda md: lambda v: jnp.sum(
            md.inverse_transform(md.transform(v)) ** 2
        )
        with pltpu.force_tpu_interpret_mode():
            g_i8 = jax.grad(loss(mp))(x)
        g_f = jax.grad(loss(m))(x)
        assert bool(jnp.all(jnp.isfinite(g_i8)))
        # STE gradient tracks the linear map's gradient to int8 accuracy
        assert self._snr(g_f, g_i8) > 25.0

    def test_radix_combination_rejected(self):
        with pytest.raises(ValueError, match="radix"):
            MDCT.create(256, dct_precision="int8", use_pallas=True,
                        pallas_kernel="radix")

    def test_auto_kernel_resolves_mono(self):
        assert MDCT.create(1024, dct_precision="int8").pallas_kernel == "mono"
        assert MDCT.create(2048, dct_precision="int8").pallas_kernel == "mono"
