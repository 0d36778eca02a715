"""Fused Pallas MDCT kernel tests (interpreter mode on CPU; the same
kernels compile for real TPU — exercised by bench/verify on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from audiocodec_tpu.mdct import MDCT


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
            (1, 63, 1),  # one frame short of a full tile
            (1, 64, 1),  # blocks+1 == tile+1 -> 2 tiles, last has 1 frame
            (2, 130, 2),  # interior + ragged tail tiles
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


class TestPallasInverse:
    @pytest.mark.parametrize("blocks", [3, 63, 64, 130])
    def test_matches_xla_path(self, pair, blocks):
        m, mp = pair
        rng = np.random.default_rng(blocks)
        y = jnp.asarray(
            rng.uniform(-0.5, 0.5, (2, blocks, 256, 2)), dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            got = mp.inverse_transform(y)
        want = m.inverse_transform(y)
        # the fused single-matmul path rounds differently from the
        # two-step DCT+unfold; values are O(10) (sqrt(4N) folded in),
        # so this is ~1e-5 relative f32 noise
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
        with pytest.raises(ValueError, match="multiple of 128"):
            MDCT.create(192, use_pallas=True)
        with pytest.raises(ValueError, match="multiple of 128"):
            MDCT.create(2048, use_pallas=True)

    def test_float64_rejected(self):
        with pytest.raises(ValueError, match="float64"):
            MDCT.create(256, use_pallas=True, compute_dtype=jnp.float64)


class TestPallasGradients:
    def test_vjp_matches_xla_path(self, pair):
        """The custom VJP (same kernel, transposed matrices, block flips)
        must agree with the autodiff gradient of the XLA path."""
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
