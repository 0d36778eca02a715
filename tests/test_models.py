"""Neural spectral autoencoder model family (models/spectral_ae.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiocodec_tpu.codec import Codec
from audiocodec_tpu.models import spectral_ae as sae
from audiocodec_tpu.parallel import make_mesh, mesh as _mesh


@pytest.fixture(scope="module")
def cfg():
    return sae.SpectralAE(filters_n=64, hidden_n=32, latent_n=8,
                          latent_step=1 / 16)


@pytest.fixture(scope="module")
def codec():
    return Codec.create(16000, filters_n=64, bark_bands_n=16)


@pytest.fixture(scope="module")
def params(cfg):
    return sae.init_params(jax.random.key(0), cfg)


def _copy(tree):
    """Fresh buffers: train steps donate their params/opt-state inputs."""
    return jax.tree.map(jnp.copy, tree)


def _wave(batch=2, blocks=8, n=64, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(blocks * n)
    x = 0.5 * np.sin(2 * np.pi * 880 / 16000 * t)
    x = x[None, :, None] + 0.05 * rng.normal(size=(batch, blocks * n, channels))
    return jnp.asarray(x, dtype=jnp.float32)


class TestArchitecture:
    def test_shapes(self, cfg, params):
        frames = jnp.zeros((2, 5, 64, 2), jnp.float32)
        z = sae.encode_frames(params, frames)
        assert z.shape == (2, 5, 8, 2)
        out = sae.decode_frames(params, z)
        assert out.shape == frames.shape

    def test_latent_bounded_and_quantizable(self, cfg, params):
        frames = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (1, 4, 64, 1)),
            jnp.float32,
        )
        z = sae.encode_frames(params, frames)
        assert float(jnp.max(jnp.abs(z))) <= 1.0
        zq = sae.quantize_latents(cfg, z)
        steps = np.asarray(zq) / cfg.latent_step
        np.testing.assert_allclose(steps, np.round(steps), atol=1e-5)

    def test_bits_per_frame(self, cfg):
        # latent_n * log2(2 / step) = 8 * log2(32) = 40
        assert cfg.bits_per_frame() == pytest.approx(40.0)

    def test_apply_modes(self, cfg, params):
        frames = jnp.asarray(
            np.random.default_rng(2).uniform(-1, 1, (1, 4, 64, 1)),
            jnp.float32,
        )
        det = sae.apply(cfg, params, frames)
        q = sae.apply(cfg, params, frames, quantized=True)
        noisy = sae.apply(cfg, params, frames, key=jax.random.key(3))
        # quantized/noisy perturb the deterministic pass by <= the latent
        # step through a Lipschitz decoder — different but close
        assert 0 < float(jnp.max(jnp.abs(q - det)))
        assert 0 < float(jnp.max(jnp.abs(noisy - det)))
        # deterministic inference is reproducible
        np.testing.assert_array_equal(
            np.asarray(q), np.asarray(sae.apply(cfg, params, frames,
                                                quantized=True))
        )

    def test_bf16_params_and_io(self, cfg):
        p16 = sae.init_params(jax.random.key(0), cfg, jnp.bfloat16)
        frames = jnp.zeros((1, 3, 64, 1), jnp.bfloat16)
        out = sae.apply(cfg, p16, frames)
        assert out.dtype == jnp.bfloat16


class TestTraining:
    def test_loss_decreases(self, cfg, codec, params):
        mesh = make_mesh(n_devices=1)
        step, opt = sae.make_train_step(
            codec, cfg, mesh, optimizer=optax.adam(3e-3)
        )
        p = _copy(params)
        opt_state = opt.init(p)
        x = jax.device_put(_wave(), _mesh.waveform_sharding(mesh))
        losses = []
        for i in range(30):
            p, opt_state, loss = step(p, opt_state, x, jax.random.key(i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9

    def test_sharded_matches_unsharded_grad(self, cfg, codec, params):
        """dp=4 x sp=2 sharded loss/grad == single-device values."""
        x = _wave(batch=4, blocks=8)
        key = jax.random.key(11)

        def loss(p, x):
            return sae.perceptual_loss(codec, cfg, p, x, key)

        ref_loss, ref_grad = jax.value_and_grad(loss)(params, x)

        mesh = make_mesh(n_devices=8, sp=2)
        xs = jax.device_put(x, _mesh.waveform_sharding(mesh))
        sh_loss, sh_grad = jax.jit(
            jax.value_and_grad(loss),
            in_shardings=(_mesh.replicated(mesh),
                          _mesh.waveform_sharding(mesh)),
        )(params, xs)
        np.testing.assert_allclose(
            float(sh_loss), float(ref_loss), rtol=1e-6
        )
        for k in ref_grad:
            # sharded execution reassociates the mean reductions; f32
            # grads agree to a few 1e-4 relative
            np.testing.assert_allclose(
                np.asarray(sh_grad[k]), np.asarray(ref_grad[k]),
                rtol=5e-4, atol=1e-6,
            )

    def test_remat_matches(self, cfg, codec, params):
        mesh = make_mesh(n_devices=1)
        step_a, opt = sae.make_train_step(codec, cfg, mesh)
        step_b, _ = sae.make_train_step(codec, cfg, mesh, remat=True)
        x = jax.device_put(_wave(), _mesh.waveform_sharding(mesh))
        p1 = _copy(params)
        pa, _, la = step_a(p1, opt.init(p1), x, jax.random.key(0))
        p2 = _copy(params)
        pb, _, lb = step_b(p2, opt.init(p2), x, jax.random.key(0))
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
        for k in pa:
            np.testing.assert_allclose(
                np.asarray(pa[k]), np.asarray(pb[k]), rtol=1e-5, atol=1e-8
            )

    def test_trained_model_beats_init_on_heldout(self, cfg, codec, params):
        """End-to-end: training improves quantized-latent reconstruction
        SNR on audio the model never saw."""
        mesh = make_mesh(n_devices=1)
        step, opt = sae.make_train_step(
            codec, cfg, mesh, optimizer=optax.adam(5e-3)
        )
        p = _copy(params)
        opt_state = opt.init(p)
        for i in range(100):
            x = jax.device_put(
                _wave(seed=i), _mesh.waveform_sharding(mesh)
            )
            p, opt_state, _ = step(p, opt_state, x, jax.random.key(i))

        held = _wave(seed=999)

        def snr(p):
            spec = codec.mdct.transform(held)
            recon = sae.apply(cfg, p, spec, quantized=True)
            out = codec.mdct.inverse_transform(recon)[:, 64:-64]
            err = jnp.sum((out - held) ** 2)
            return float(10 * jnp.log10(jnp.sum(held**2) / err))

        # init lands ~-2.4 dB, 100 steps converge to ~0 dB on this tiny
        # config (the NMR term doesn't chase waveform SNR past that)
        assert snr(p) > snr(params) + 2.0


class TestPostFilter:
    """MDCT-domain neural post-filter (models/post_filter.py)."""

    @pytest.fixture(scope="class")
    def pf_cfg(self):
        from audiocodec_tpu.models import post_filter as pf

        return pf.PostFilter(filters_n=64, hidden_n=64)

    def test_identity_at_init(self, codec, pf_cfg):
        """Zero-initialized head: the untrained filter is exactly the
        identity, so it can never regress the codec."""
        from audiocodec_tpu.models import post_filter as pf

        params = pf.init_params(jax.random.key(0), pf_cfg)
        rng = np.random.default_rng(0)
        spec_q = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 5, 64, 1)),
                             jnp.float32)
        delta = jnp.asarray(rng.uniform(1e-6, 1e-3, (1, 5, 64, 1)),
                            jnp.float32)
        out = pf.apply(pf_cfg, params, spec_q, delta)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(spec_q))

    @staticmethod
    def _tonal(batch, seed, blocks=8, n=64, sr=16000):
        """Random two-tone mixtures: the low-bitrate enhancement regime the
        filter targets (quantization noise is the ONLY noise, so the
        temporal-context averaging has structure to exploit)."""
        rng = np.random.default_rng(seed)
        t = np.arange(blocks * n)
        f = rng.uniform(300, 3000, (batch, 2))
        a = rng.uniform(0.2, 0.4, (batch, 2))
        ph = rng.uniform(0, 2 * np.pi, (batch, 2))
        x = sum(
            a[:, i : i + 1]
            * np.sin(2 * np.pi * f[:, i : i + 1] / sr * t[None] + ph[:, i : i + 1])
            for i in range(2)
        )
        return jnp.asarray(x[:, :, None], jnp.float32)

    def test_training_improves_quantized_snr(self, codec):
        """The deliverable: at a coarse (low-bitrate) quantization scale,
        the trained filter's decode beats the raw quantized decode on
        held-out audio."""
        import optax as _optax

        from audiocodec_tpu import quantize as _q
        from audiocodec_tpu.models import post_filter as pf

        cfg = pf.PostFilter(filters_n=64, hidden_n=128)
        scale = 8.0
        mesh = make_mesh(n_devices=1)
        step, opt = pf.make_train_step(
            codec, cfg, mesh, optimizer=_optax.adam(1e-3),
            threshold_scale=scale,
        )
        params = pf.init_params(jax.random.key(0), cfg)
        opt_state = opt.init(params)
        for i in range(300):
            x = jax.device_put(
                self._tonal(8, i), _mesh.waveform_sharding(mesh)
            )
            params, opt_state, loss = step(params, opt_state, x)
        assert np.isfinite(float(loss))

        held = self._tonal(4, 9999)
        spec = codec.mdct.transform(held)
        thr = codec.psycho.global_masking_threshold(
            spec, codec.psycho.tonality(spec)
        ) * scale
        codes, delta = _q.quantize(spec, thr)

        def snr(decoded):
            out = np.asarray(decoded)[:, 64:-64]
            ref = np.asarray(held)
            return 10 * np.log10(
                (ref**2).sum() / max(((ref - out) ** 2).sum(), 1e-30)
            )

        raw = snr(codec.decode_quantized(codes, delta))
        enhanced = snr(pf.decode_enhanced(codec, cfg, params, codes, delta))
        # 400 steps measured +0.54 dB, 900 steps +0.70; 300 steps clears
        # +0.3 with margin
        assert enhanced > raw + 0.3, (raw, enhanced)

    def test_sharded_matches_unsharded(self, codec, pf_cfg):
        from audiocodec_tpu.models import post_filter as pf

        params = pf.init_params(jax.random.key(1), pf_cfg)
        x = _wave(batch=4)

        def loss(p, x):
            return pf.enhancement_loss(codec, pf_cfg, p, x)

        ref = float(loss(params, x))
        mesh = make_mesh(n_devices=8, sp=2)
        xs = jax.device_put(x, _mesh.waveform_sharding(mesh))
        sh = float(
            jax.jit(
                loss,
                in_shardings=(_mesh.replicated(mesh),
                              _mesh.waveform_sharding(mesh)),
            )(params, xs)
        )
        np.testing.assert_allclose(sh, ref, rtol=1e-6)
