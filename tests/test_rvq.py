"""Residual vector quantization model family (models/rvq.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu.codec import Codec
from audiocodec_tpu.models import rvq as _rvq
from audiocodec_tpu.models import spectral_ae as sae
from audiocodec_tpu.parallel import mesh as _mesh


@pytest.fixture(scope="module")
def rcfg():
    return _rvq.RVQ(stages=3, codebook_size=16, dim=8)


@pytest.fixture(scope="module")
def ae_cfg():
    return sae.SpectralAE(filters_n=64, hidden_n=32, latent_n=8,
                          latent_step=1 / 16)


@pytest.fixture(scope="module")
def codec():
    return Codec.create(16000, filters_n=64, bark_bands_n=16)


@pytest.fixture(scope="module")
def state(rcfg):
    return _rvq.init_state(jax.random.key(0), rcfg)


def _copy(tree):
    return jax.tree.map(jnp.copy, tree)


def _wave(batch=2, blocks=8, n=64, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(blocks * n)
    x = 0.5 * np.sin(2 * np.pi * 880 / 16000 * t)
    x = x[None, :, None] + 0.05 * rng.normal(size=(batch, blocks * n, channels))
    return jnp.asarray(x, dtype=jnp.float32)


class TestConfig:
    def test_rejects_non_power_of_two_codebook(self):
        with pytest.raises(ValueError, match="power of two"):
            _rvq.RVQ(codebook_size=100)

    def test_rejects_zero_stages(self):
        with pytest.raises(ValueError, match="stages"):
            _rvq.RVQ(stages=0)

    def test_bits_per_frame(self, rcfg):
        assert rcfg.bits_per_index == 4
        assert rcfg.bits_per_frame() == 12

    def test_rvq_rate_beats_scalar_grid(self):
        """The family's reason to exist: at the production defaults the
        discrete code is an order of magnitude smaller than the scalar
        latent grid's (40 vs 384 bits/frame/channel)."""
        rvq_d, ae_d = _rvq.RVQ(), sae.SpectralAE()
        assert rvq_d.dim == ae_d.latent_n
        assert rvq_d.bits_per_frame() <= ae_d.bits_per_frame() / 8


class TestQuantize:
    def test_shapes_and_code_range(self, rcfg, state):
        z = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 5, 8, 3)), jnp.float32
        )
        z_q, codes, commit = _rvq.quantize(rcfg, state, z)
        assert z_q.shape == z.shape
        assert codes.shape == (2, 5, 3, 3)  # [B, T, C, S]
        assert codes.dtype == jnp.int32
        assert int(codes.min()) >= 0
        assert int(codes.max()) < rcfg.codebook_size
        assert float(commit) >= 0.0

    def test_exact_on_codewords(self, rcfg, state):
        """A latent that IS a stage-0 codeword quantizes exactly: stage 0
        matches it, later stages match the zero-est residual they can."""
        cb = np.asarray(state["codebooks"])  # [S, K, D]
        z = jnp.asarray(cb[0, :4][None, :, :, None], jnp.float32)
        z_q, codes, _ = _rvq.quantize(rcfg, state, z)
        np.testing.assert_array_equal(np.asarray(codes)[0, :, 0, 0],
                                      np.arange(4))
        # with ONLY stage 0, the reconstruction is bit-exact (the
        # residual entering later stages is zero only in this 1-stage
        # view; full-stack stages re-quantize the zero residual through
        # their own codebooks)
        cfg1 = _rvq.RVQ(stages=1, codebook_size=16, dim=8)
        st1 = {k: v[:1] for k, v in state.items()}
        zq1, _, _ = _rvq.quantize(cfg1, st1, z)
        np.testing.assert_allclose(np.asarray(zq1), np.asarray(z),
                                   atol=1e-6)

    def test_residual_shrinks_with_stages(self, state):
        """Each added stage reduces (or keeps) quantization error."""
        rng = np.random.default_rng(2)
        z = jnp.asarray(rng.normal(size=(4, 6, 8, 1)) * 0.1, jnp.float32)
        errs = []
        for s in (1, 2, 3):
            cfg_s = _rvq.RVQ(stages=s, codebook_size=16, dim=8)
            st = {
                "codebooks": state["codebooks"][:s],
                "ema_count": state["ema_count"][:s],
                "ema_sum": state["ema_sum"][:s],
            }
            z_q, _, _ = _rvq.quantize(cfg_s, st, z)
            errs.append(float(jnp.mean((z_q - z) ** 2)))
        assert errs[1] <= errs[0] + 1e-7
        assert errs[2] <= errs[1] + 1e-7

    def test_straight_through_gradient_is_identity(self, rcfg, state):
        """d/dz of any function of z_q flows as if z_q == z (STE)."""
        z = jnp.asarray(
            np.random.default_rng(3).normal(size=(1, 2, 8, 1)), jnp.float32
        )
        tgt = jnp.asarray(
            np.random.default_rng(4).normal(size=(1, 2, 8, 1)), jnp.float32
        )

        def f(z):
            z_q, _, _ = _rvq.quantize(rcfg, state, z)
            return jnp.sum(z_q * tgt)

        grad = jax.grad(f)(z)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(tgt),
                                   atol=1e-6)

    def test_decode_codes_matches_quantize(self, rcfg, state):
        z = jnp.asarray(
            np.random.default_rng(5).normal(size=(2, 3, 8, 2)), jnp.float32
        )
        z_q, codes, _ = _rvq.quantize(rcfg, state, z)
        z_dec = _rvq.decode_codes(rcfg, state, codes)
        np.testing.assert_allclose(np.asarray(z_dec), np.asarray(z_q),
                                   atol=1e-5)

    def test_dim_mismatch_raises(self, rcfg, state):
        z = jnp.zeros((1, 2, 7, 1), jnp.float32)
        with pytest.raises(ValueError, match="latent axis"):
            _rvq.quantize(rcfg, state, z)

    def test_bf16_latents(self, rcfg):
        st = _rvq.init_state(jax.random.key(0), rcfg, jnp.bfloat16)
        z = jnp.asarray(
            np.random.default_rng(6).normal(size=(1, 4, 8, 1)), jnp.bfloat16
        )
        z_q, codes, _ = _rvq.quantize(rcfg, st, z)
        assert z_q.dtype == jnp.bfloat16
        assert codes.dtype == jnp.int32


class TestPackCodes:
    def test_roundtrip_exact(self, rcfg):
        rng = np.random.default_rng(7)
        codes = rng.integers(0, 16, size=(2, 5, 1, 3), dtype=np.int32)
        data = _rvq.pack_codes(rcfg, codes)
        assert len(data) == int(np.ceil(codes.size * 4 / 8))
        back = _rvq.unpack_codes(rcfg, data, codes.shape)
        np.testing.assert_array_equal(back, codes)

    def test_rate_is_fixed_width(self, rcfg):
        codes = np.zeros((1, 100, 1, 3), dtype=np.int32)
        assert len(_rvq.pack_codes(rcfg, codes)) == 100 * 3 * 4 // 8

    def test_out_of_range_rejected(self, rcfg):
        codes = np.full((1, 1, 1, 3), 16, dtype=np.int32)
        with pytest.raises(ValueError, match="out of range"):
            _rvq.pack_codes(rcfg, codes)

    def test_truncated_payload_rejected(self, rcfg):
        codes = np.zeros((1, 8, 1, 3), dtype=np.int32)
        data = _rvq.pack_codes(rcfg, codes)
        with pytest.raises(ValueError, match="truncated"):
            _rvq.unpack_codes(rcfg, data[:-2], codes.shape)


class TestEMATraining:
    def test_ema_moves_codebooks_toward_data(self, rcfg):
        """Clustered data + repeated EMA steps: quantization error drops
        as codewords migrate onto the clusters."""
        st = _rvq.init_state(jax.random.key(1), rcfg)
        rng = np.random.default_rng(8)
        centers = rng.normal(size=(4, 8)) * 2.0
        pts = (centers[rng.integers(0, 4, 256)]
               + 0.05 * rng.normal(size=(256, 8)))
        z = jnp.moveaxis(jnp.asarray(pts, jnp.float32)[None, :, None, :],
                         -1, -2)  # [1, 256, 8, 1]

        def err(st):
            z_q, _, _ = _rvq.quantize(rcfg, st, z)
            return float(jnp.mean((z_q - z) ** 2))

        e0 = err(st)
        key = jax.random.key(2)
        for i in range(30):
            key, k = jax.random.split(key)
            st = _rvq.ema_update(rcfg, st, z, k)
        assert err(st) < e0 * 0.1

    def test_dead_codes_reseed(self):
        """With far more codewords than distinct data points, unused
        codewords must reseed onto batch vectors instead of idling."""
        cfg = _rvq.RVQ(stages=1, codebook_size=32, dim=8,
                       ema_decay=0.5, reseed_threshold=0.6)
        st = _rvq.init_state(jax.random.key(3), cfg)
        rng = np.random.default_rng(9)
        pts = rng.normal(size=(64, 8)) * 3.0
        z = jnp.moveaxis(jnp.asarray(pts, jnp.float32)[None, :, None, :],
                         -1, -2)
        key = jax.random.key(4)
        for _ in range(8):
            key, k = jax.random.split(key)
            st = _rvq.ema_update(cfg, st, z, k)
        # after reseeding, codewords live near the data's scale, not at
        # the 0.1-sigma init
        norms = np.linalg.norm(np.asarray(st["codebooks"][0]), axis=-1)
        assert np.median(norms) > 1.0

    def test_joint_train_step_descends(self, codec, ae_cfg, rcfg):
        import optax

        mesh = _mesh.make_mesh(n_devices=1)
        step, opt = _rvq.make_train_step(
            codec, ae_cfg, rcfg, mesh, optimizer=optax.adam(3e-3)
        )
        params = sae.init_params(jax.random.key(5), ae_cfg)
        st = _rvq.init_state(jax.random.key(6), rcfg)
        opt_state = opt.init(params)
        x = _wave(batch=2, blocks=8)
        key = jax.random.key(7)
        losses = []
        for i in range(30):
            key, k = jax.random.split(key)
            params, st, opt_state, loss = step(
                params, st, opt_state, x, k, jnp.int32(i)
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.9
        assert np.isfinite(losses).all()

    def test_warmup_gates_the_quantizer(self, codec, ae_cfg, rcfg):
        """During warmup (step < warmup_steps) the loss is the CONTINUOUS
        bottleneck's — no quantization error, no commitment term — so the
        decoder trains on real latents while EMA k-means fits the
        codebooks; past warmup the STE engages and the loss changes.
        Without this gate, joint training from scratch collapses the
        bottleneck to zero (the quiet-bin/commitment trap)."""
        import optax

        mesh = _mesh.make_mesh(n_devices=1)
        step, opt = _rvq.make_train_step(
            codec, ae_cfg, rcfg, mesh, optimizer=optax.sgd(0.0),
            warmup_steps=10,
        )
        params = sae.init_params(jax.random.key(20), ae_cfg)
        st = _rvq.init_state(jax.random.key(21), rcfg)
        x = _wave(batch=2, blocks=8, seed=21)
        key = jax.random.key(22)

        def continuous_loss():
            spec = codec.mdct.transform(x)
            ton = codec.psycho.tonality(spec)
            thr = codec.psycho.global_masking_threshold(spec, ton)
            z = sae.encode_frames(params, spec)
            recon = sae.decode_frames(params, z)
            dec = codec.mdct.inverse_transform(recon)
            n = codec.mdct.filters_n
            wave_mse = jnp.mean((dec[:, n:-n] - x) ** 2)
            nmr = jnp.mean(
                ((recon - spec) / jnp.maximum(thr, 1e-3)) ** 2
            )
            return float(wave_mse + 0.1 * nmr)

        ref = continuous_loss()
        _, _, _, warm_loss = step(
            _copy(params), _copy(st), opt.init(params), x, key,
            jnp.int32(0),
        )
        _, _, _, hot_loss = step(
            _copy(params), _copy(st), opt.init(params), x, key,
            jnp.int32(10),
        )
        assert abs(float(warm_loss) - ref) < 1e-5
        assert float(hot_loss) > float(warm_loss)  # quantization error on

    def test_sharded_step_matches_single_device(self, codec, ae_cfg, rcfg):
        """dp-sharded joint step == single-device step (the EMA count/sum
        contractions psum correctly under GSPMD)."""
        import optax

        x = _wave(batch=8, blocks=8, seed=11)
        key = jax.random.key(8)
        results = []
        for n_dev in (1, 4):
            mesh = _mesh.make_mesh(n_devices=n_dev)
            step, opt = _rvq.make_train_step(
                codec, ae_cfg, rcfg, mesh, optimizer=optax.adam(1e-3)
            )
            params = sae.init_params(jax.random.key(5), ae_cfg)
            st = _rvq.init_state(jax.random.key(6), rcfg)
            opt_state = opt.init(params)
            xs = jax.device_put(x, _mesh.waveform_sharding(mesh))
            for i in range(3):
                params, st, opt_state, loss = step(
                    _copy(params) if i == 0 else params,
                    _copy(st) if i == 0 else st,
                    opt_state, xs, jax.random.fold_in(key, i),
                    jnp.int32(i),
                )
            results.append((jax.device_get(params), jax.device_get(st),
                            float(loss)))
        (p1, s1, l1), (p4, s4, l4) = results
        assert abs(l1 - l4) < 1e-5 * max(1.0, abs(l1))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
            np.testing.assert_allclose(a, b, atol=1e-5)
        np.testing.assert_allclose(
            s1["ema_count"], s4["ema_count"], atol=1e-4
        )


class TestDiscreteRoundTrip:
    def test_encode_decode_discrete(self, codec, ae_cfg, rcfg):
        """Waveform -> codes -> packed bytes -> codes -> waveform; the
        packed path is lossless over the codes and the reconstruction
        matches the in-memory quantized path exactly."""
        params = sae.init_params(jax.random.key(10), ae_cfg)
        st = _rvq.init_state(jax.random.key(11), rcfg)
        x = _wave(batch=1, blocks=8)
        codes = _rvq.encode_discrete(codec, ae_cfg, rcfg, params, st, x)
        assert codes.shape == (1, 9, 1, 3)  # blocks+1 framing
        data = _rvq.pack_codes(rcfg, np.asarray(codes))
        back = _rvq.unpack_codes(rcfg, data, codes.shape)
        y1 = _rvq.decode_discrete(codec, ae_cfg, rcfg, params, st,
                                  jnp.asarray(back))
        y2 = _rvq.decode_discrete(codec, ae_cfg, rcfg, params, st, codes)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        assert y1.shape[1] == x.shape[1] + 2 * 64
