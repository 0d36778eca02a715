"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiocodec_tpu.codec import Codec
from audiocodec_tpu.parallel import corpus as _corpus
from audiocodec_tpu.parallel import mesh as _mesh
from audiocodec_tpu.parallel import train as _train


@pytest.fixture(scope="module")
def codec():
    return Codec.create(sample_rate=16000, filters_n=64, bark_bands_n=16)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = _mesh.make_mesh(n_devices=8, sp=2)
        assert mesh.shape == {"dp": 4, "sp": 2}
        mesh = _mesh.make_mesh(n_devices=8)
        assert mesh.shape == {"dp": 8, "sp": 1}

    def test_bad_factorization_raises(self):
        with pytest.raises(ValueError):
            _mesh.make_mesh(n_devices=8, sp=3)

    def test_device_count_available(self):
        assert len(jax.devices()) == 8, (
            "conftest should provide 8 virtual CPU devices"
        )


class TestShardedEncode:
    def test_sharded_matches_single_device(self, codec):
        """dp+sp sharded corpus encode must be numerically identical to the
        unsharded program (GSPMD handles the fold's block halo)."""
        mesh = _mesh.make_mesh(n_devices=8, sp=2)
        encoder = _corpus.make_corpus_encoder(codec, mesh, quantized=True)
        rng = np.random.default_rng(0)
        batch = jnp.asarray(
            rng.uniform(-0.8, 0.8, size=(8, 16 * 64, 2)), dtype=jnp.float32
        )
        codes_sharded, delta_sharded = encoder(batch)
        codes_local, delta_local, _ = codec.encode_quantized(batch)
        np.testing.assert_array_equal(
            np.asarray(codes_sharded), np.asarray(codes_local)
        )
        # reduction order differs across shards: f32-roundoff tolerance
        np.testing.assert_allclose(
            np.asarray(delta_sharded), np.asarray(delta_local), rtol=1e-5
        )

    def test_sequence_sharding_pure_mdct(self, codec):
        """Shard ONLY the samples axis (sp=8): the adjacent-block coupling
        crosses every shard boundary; result must still be exact."""
        mesh = _mesh.make_mesh(n_devices=8, sp=8)
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.uniform(-1, 1, size=(2, 64 * 64, 1)), dtype=jnp.float32
        )
        x_sharded = jax.device_put(x, _mesh.waveform_sharding(mesh))
        spec_sharded = jax.jit(codec.mdct.transform)(x_sharded)
        spec_local = codec.mdct.transform(x)
        np.testing.assert_allclose(
            np.asarray(spec_sharded), np.asarray(spec_local), atol=1e-6
        )

    def test_encode_corpus_pads_ragged_batch(self, codec):
        mesh = _mesh.make_mesh(n_devices=8)
        rng = np.random.default_rng(2)
        clips = rng.uniform(-0.5, 0.5, size=(10, 8 * 64, 1)).astype(
            np.float32
        )
        outs = _corpus.encode_corpus(
            codec, clips, mesh=mesh, batch_size=8, quantized=True
        )
        assert len(outs) == 2  # 8 + 2->8(padded)
        codes, delta = outs[0]
        assert codes.shape[0] == 8


class TestTrainStep:
    def test_sharded_train_step_runs_and_learns(self, codec):
        mesh = _mesh.make_mesh(n_devices=8, sp=2)
        train_step, optimizer = _train.make_train_step(
            codec, mesh, optimizer=optax.adam(5e-2)
        )
        state = _train.init_state(codec, optimizer)
        # start from deliberately mismatched gains so the objective has a
        # clear downhill direction (identity gains are near-optimal)
        state = _train.TrainState(
            gains=state.gains * 0.5, opt_state=state.opt_state
        )
        rng = np.random.default_rng(3)
        x = jax.device_put(
            jnp.asarray(
                rng.uniform(-0.5, 0.5, size=(8, 8 * 64, 1)),
                dtype=jnp.float32,
            ),
            _mesh.waveform_sharding(mesh),
        )
        losses = []
        for _ in range(5):
            state, loss = train_step(state, x)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] <= losses[0]
        # gains moved away from the identity initialization
        assert float(jnp.max(jnp.abs(state.gains - 1.0))) > 0

    def test_train_matches_unsharded_gradient(self, codec):
        """One dp=8 step == one single-device step on the same batch."""
        mesh8 = _mesh.make_mesh(n_devices=8)
        mesh1 = _mesh.make_mesh(n_devices=1)
        rng = np.random.default_rng(4)
        x = jnp.asarray(
            rng.uniform(-0.5, 0.5, size=(8, 8 * 64, 1)), dtype=jnp.float32
        )
        results = []
        for mesh in (mesh8, mesh1):
            train_step, optimizer = _train.make_train_step(
                codec, mesh, optimizer=optax.sgd(1e-2)
            )
            state = _train.init_state(codec, optimizer)
            xs = jax.device_put(x, _mesh.waveform_sharding(mesh))
            state, loss = train_step(state, xs)
            results.append((np.asarray(state.gains), float(loss)))
        np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-6)
        assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)


class TestRemat:
    def test_remat_train_step_matches(self, codec):
        """jax.checkpoint must not change the math, only the memory."""
        mesh = _mesh.make_mesh(n_devices=2)
        rng = np.random.default_rng(5)
        x = jnp.asarray(
            rng.uniform(-0.5, 0.5, size=(2, 8 * 64, 1)), dtype=jnp.float32
        )
        outs = []
        for remat in (False, True):
            step, opt = _train.make_train_step(
                codec, mesh, optimizer=optax.sgd(1e-2), remat=remat
            )
            state = _train.init_state(codec, opt)
            state, loss = step(state, jax.device_put(
                x, _mesh.waveform_sharding(mesh)))
            outs.append((np.asarray(state.gains), float(loss)))
        np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-6)
        assert outs[0][1] == pytest.approx(outs[1][1], rel=1e-6)


class TestInt8Sharded:
    def test_int8_dp_sharded_matches_single_device(self):
        """The int8 analysis tier under dp+sp sharding: per-frame dynamic
        scales are frame-local (never cross a shard boundary), so codes
        must match the unsharded program exactly; step sizes to roundoff
        (shard-order reductions)."""
        codec = Codec.create(sample_rate=16000, filters_n=64,
                             bark_bands_n=16, dct_precision="int8")
        mesh = _mesh.make_mesh(n_devices=8, sp=2)
        encoder = _corpus.make_corpus_encoder(codec, mesh, quantized=True)
        rng = np.random.default_rng(42)
        batch = jnp.asarray(
            rng.uniform(-0.8, 0.8, size=(8, 16 * 64, 2)), dtype=jnp.float32
        )
        codes_sharded, delta_sharded = encoder(batch)
        codes_local, delta_local, _ = codec.encode_quantized(batch)
        np.testing.assert_array_equal(
            np.asarray(codes_sharded), np.asarray(codes_local)
        )
        np.testing.assert_allclose(
            np.asarray(delta_sharded), np.asarray(delta_local), rtol=1e-5
        )
