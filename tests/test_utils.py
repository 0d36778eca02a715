"""Serialization / profiling utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu import streaming
from audiocodec_tpu.codec import Codec
from audiocodec_tpu.utils import serialization


class TestCodecSerialization:
    def test_save_load_rebuilds_identically(self, tmp_path):
        codec = Codec.create(
            32000, filters_n=128, bark_bands_n=24, alpha=0.7,
            window_type="sine",
        )
        path = str(tmp_path / "codec.json")
        serialization.save_codec(path, codec)
        restored = serialization.load_codec(path)
        # deterministic precompute: every array rebuilds bit-identically
        for a, b in zip(
            jax.tree_util.tree_leaves(codec),
            jax.tree_util.tree_leaves(restored),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_none_window_and_pallas_flags(self, tmp_path):
        codec = Codec.create(
            16000, filters_n=256, window_type=None, use_pallas=True
        )
        path = str(tmp_path / "c.json")
        serialization.save_codec(path, codec)
        # the config records the resolved kernel choice...
        assert serialization.codec_config(codec)["use_pallas"] is True
        restored = serialization.load_codec(path)
        assert restored.mdct.window_type is None
        # ...but loading on a backend that can't run Mosaic (this CPU test
        # backend) falls back to the XLA path instead of crashing at the
        # first transform — the kernel choice is a perf knob, never
        # quantization-affecting.
        assert restored.mdct.use_pallas is False


class TestLegacyConfigCompat:
    def test_pallas_kernel_recorded_and_restored(self, tmp_path):
        codec = Codec.create(
            16000, filters_n=256, use_pallas=True, pallas_kernel="radix"
        )
        assert serialization.codec_config(codec)["pallas_kernel"] == "radix"
        path = str(tmp_path / "r.json")
        serialization.save_codec(path, codec)
        restored = serialization.load_codec(path)
        # CPU backend: kernels off, but the recorded design choice rides
        # the config for when it lands back on a TPU
        assert restored.mdct.pallas_kernel == "radix"

    def test_pre_pallas_kernel_config_defaults_to_mono(self, tmp_path):
        import json

        cfg = {
            "sample_rate": 16000, "filters_n": 256, "bark_bands_n": 32,
            "alpha": 0.6, "window_type": "vorbis",
            "compute_dtype": "float32", "fast_bf16": False,
            "use_pallas": False, "dct_precision": "highest",
            "bark_precision": "highest",
        }
        path = str(tmp_path / "legacy2.json")
        with open(path, "w") as f:
            json.dump(cfg, f)
        restored = serialization.load_codec(path)
        assert restored.mdct.pallas_kernel == "mono"

    def test_pre_bark_precision_config_defaults_to_highest(self, tmp_path):
        """Configs saved before bark_precision existed were written by
        codecs that always ran Bark matmuls at HIGHEST; rebuilding them
        must preserve that (not follow dct_precision), or thresholds and
        step sizes diverge from the bitstreams that codec produced."""
        import json

        cfg = {
            "sample_rate": 16000, "filters_n": 256, "bark_bands_n": 32,
            "alpha": 0.6, "window_type": "vorbis",
            "compute_dtype": "float32", "fast_bf16": False,
            "use_pallas": False, "dct_precision": "default",
        }
        path = str(tmp_path / "legacy.json")
        with open(path, "w") as f:
            json.dump(cfg, f)
        restored = serialization.load_codec(path)
        assert restored.psycho.bark_precision == "highest"
        assert restored.mdct.dct_precision == "default"


class TestIneligibleKernelConfigDowngrade:
    def test_stale_use_pallas_size_downgrades_to_xla(self, tmp_path):
        """A checkpoint whose use_pallas choice the current hardware
        eligibility rules reject (round-2 allowed kernel sizes round 3
        excludes) must load with the XLA path, not refuse — the kernel
        choice is a perf knob, never quantization-affecting."""
        import json

        cfg = {
            "sample_rate": 48000, "filters_n": 2048, "bark_bands_n": 64,
            "alpha": 0.6, "window_type": "vorbis",
            "compute_dtype": "float32", "fast_bf16": False,
            # highest-precision kernels cap at N=1024 now
            "use_pallas": True, "dct_precision": "highest",
            "bark_precision": "highest",
        }
        path = str(tmp_path / "stale.json")
        with open(path, "w") as f:
            json.dump(cfg, f)
        restored = serialization.load_codec(path)
        assert restored.mdct.use_pallas is False
        assert restored.mdct.filters_n == 2048

    def test_downgrade_via_create_retry_branch(self, tmp_path, monkeypatch):
        """Exercise the try/except-ValueError retry in load_codec ITSELF:
        on the CPU suite the backend guard normally clears use_pallas
        before Codec.create ever raises, so without pinning the backend
        to 'tpu' the fallback branch ships untested."""
        import json

        import jax

        cfg = {
            "sample_rate": 48000, "filters_n": 2048, "bark_bands_n": 64,
            "alpha": 0.6, "window_type": "vorbis",
            "compute_dtype": "float32", "fast_bf16": False,
            # ineligible: highest-precision kernels cap at N=1024
            "use_pallas": True, "dct_precision": "highest",
            "bark_precision": "highest",
        }
        path = str(tmp_path / "stale_tpu.json")
        with open(path, "w") as f:
            json.dump(cfg, f)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        restored = serialization.load_codec(path)
        assert restored.mdct.use_pallas is False
        assert restored.mdct.dct_precision == "highest"
        # and a config Codec.create rejects for a NON-kernel reason must
        # still raise, not silently degrade
        bad = dict(cfg, use_pallas=False, dct_precision="nonsense")
        bad_path = str(tmp_path / "bad.json")
        with open(bad_path, "w") as f:
            json.dump(bad, f)
        with pytest.raises(ValueError):
            serialization.load_codec(bad_path)


class TestStreamStateSerialization:
    def test_stream_resume_across_checkpoint(self, tmp_path):
        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        mdct = codec.mdct
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 8 * 64, 1)), dtype=jnp.float32
        )
        carry = streaming.mdct_stream_init(mdct, 1, 1)
        carry, f1 = streaming.mdct_stream_step(mdct, carry, x[:, : 4 * 64])

        path = str(tmp_path / "state.npz")
        serialization.save_stream_state(path, carry, offset=4)
        enc, dec, offset = serialization.load_stream_state(path)
        assert offset == 4
        assert dec is None

        _, f2 = streaming.mdct_stream_step(mdct, enc, x[:, 4 * 64 :])
        got = np.concatenate([np.asarray(f1), np.asarray(f2)], axis=1)
        want = np.asarray(mdct.transform(x))[:, :-1]
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestPytreeCheckpoint:
    def test_params_roundtrip_exact(self, tmp_path):
        from audiocodec_tpu.models import spectral_ae as sae

        cfg = sae.SpectralAE(filters_n=64, hidden_n=32, latent_n=8)
        params = sae.init_params(jax.random.key(0), cfg)
        path = str(tmp_path / "params.npz")
        serialization.save_pytree(path, params)
        back = serialization.load_pytree(
            path, sae.init_params(jax.random.key(1), cfg)
        )
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert a.dtype == b.dtype

    def test_bfloat16_leaves_survive(self, tmp_path):
        from audiocodec_tpu.models import spectral_ae as sae

        cfg = sae.SpectralAE(filters_n=64, hidden_n=32, latent_n=8)
        params = sae.init_params(jax.random.key(2), cfg, jnp.bfloat16)
        path = str(tmp_path / "bf16.npz")
        serialization.save_pytree(path, params)
        back = serialization.load_pytree(path, params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            assert b.dtype == jnp.bfloat16
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint16), np.asarray(b).view(np.uint16)
            )

    def test_optimizer_state_roundtrip(self, tmp_path):
        import optax

        from audiocodec_tpu.models import spectral_ae as sae

        cfg = sae.SpectralAE(filters_n=64, hidden_n=32, latent_n=8)
        params = sae.init_params(jax.random.key(3), cfg)
        opt = optax.adam(1e-3)
        state = opt.init(params)
        path = str(tmp_path / "opt.npz")
        serialization.save_pytree(path, state)
        back = serialization.load_pytree(path, opt.init(params))
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_wrong_template_rejected(self, tmp_path):
        from audiocodec_tpu.models import spectral_ae as sae

        cfg = sae.SpectralAE(filters_n=64, hidden_n=32, latent_n=8)
        params = sae.init_params(jax.random.key(4), cfg)
        path = str(tmp_path / "p.npz")
        serialization.save_pytree(path, params)
        with pytest.raises(ValueError, match="leaves"):
            serialization.load_pytree(path, {"just_one": params["enc_w1"]})

    def test_training_resumes_exactly(self, tmp_path):
        """checkpoint(params, rvq_state, opt_state) mid-run; continuing
        from the reload matches continuing in-process bit-for-bit."""
        import optax

        from audiocodec_tpu.models import rvq as _rvq
        from audiocodec_tpu.models import spectral_ae as sae
        from audiocodec_tpu.parallel import mesh as _mesh

        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        cfg = sae.SpectralAE(filters_n=64, hidden_n=32, latent_n=8)
        rcfg = _rvq.RVQ(stages=2, codebook_size=16, dim=8)
        mesh = _mesh.make_mesh(n_devices=1)
        step, opt = _rvq.make_train_step(
            codec, cfg, rcfg, mesh, optimizer=optax.adam(1e-3)
        )
        params = sae.init_params(jax.random.key(5), cfg)
        st = _rvq.init_state(jax.random.key(6), rcfg)
        opt_state = opt.init(params)
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-0.5, 0.5, (2, 8 * 64, 1)), jnp.float32
        )
        for i in range(2):
            params, st, opt_state, _ = step(
                params, st, opt_state, x, jax.random.key(i), jnp.int32(i)
            )
        pp, ps, po = (str(tmp_path / f) for f in ("p.npz", "s.npz", "o.npz"))
        serialization.save_pytree(pp, params)
        serialization.save_pytree(ps, st)
        serialization.save_pytree(po, opt_state)

        def advance(params, st, opt_state):
            for i in (2, 3):
                params, st, opt_state, loss = step(
                    params, st, opt_state, x, jax.random.key(i),
                    jnp.int32(i),
                )
            return params, loss

        cont_params, cont_loss = advance(
            jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, st),
            jax.tree.map(jnp.copy, opt_state),
        )
        r_params = serialization.load_pytree(
            pp, sae.init_params(jax.random.key(7), cfg)
        )
        r_st = serialization.load_pytree(
            ps, _rvq.init_state(jax.random.key(8), rcfg)
        )
        r_opt = serialization.load_pytree(po, opt.init(r_params))
        res_params, res_loss = advance(r_params, r_st, r_opt)
        assert float(cont_loss) == float(res_loss)
        for a, b in zip(
            jax.tree.leaves(cont_params), jax.tree.leaves(res_params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
