"""Auxiliary subsystems: multihost helpers, checkify debugging."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu.codec import Codec
from audiocodec_tpu.parallel import multihost
from audiocodec_tpu.utils import debug


class TestMultihost:
    def test_initialize_noop_single_host(self):
        assert multihost.initialize() is False

    def test_global_mesh_shapes(self):
        mesh = multihost.global_mesh(sp=2)
        assert mesh.shape == {"dp": 4, "sp": 2}
        with pytest.raises(ValueError, match="divisible"):
            multihost.global_mesh(sp=3)

    def test_process_local_batch(self):
        assert multihost.process_local_batch(64) == 64  # single process

    def test_two_process_distributed_smoke(self):
        """The non-no-op branch of multihost.initialize: two local
        processes form a jax.distributed job over a localhost coordinator
        (4 virtual CPU devices each), build the 8-device global mesh, and
        agree on a cross-process sharded reduction."""
        import os
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        script = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs = [
            subprocess.Popen(
                [sys.executable, script, str(i), str(port)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                text=True,
            )
            for i in (0, 1)
        ]
        outs = [p.communicate(timeout=180)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out
            assert "MULTIHOST_OK 8" in out, out


class TestCheckify:
    def test_clean_pipeline_passes(self):
        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        x = jnp.ones((1, 4 * 64, 1), dtype=jnp.float32) * 0.3
        checked = debug.checked(
            lambda x, k: codec.round_trip(x, k)
        )
        err, out = jax.jit(checked)(x, jax.random.key(0))
        err.throw()  # no error
        assert out.shape == (1, 6 * 64, 1)

    def test_nan_input_caught(self):
        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        x = jnp.full((1, 4 * 64, 1), jnp.nan, dtype=jnp.float32)
        checked = debug.checked(lambda x, k: codec.round_trip(x, k))
        err, _ = jax.jit(checked)(x, jax.random.key(0))
        with pytest.raises(Exception):
            err.throw()

    def test_find_nonfinite(self):
        tree = {
            "good": jnp.ones((4,)),
            "bad": jnp.asarray([1.0, jnp.nan, jnp.inf, 2.0]),
        }
        bad = debug.find_nonfinite(tree)
        assert len(bad) == 1
        assert list(bad.values()) == [2]


class TestProfiling:
    def test_time_fn_returns_positive_seconds(self):
        from audiocodec_tpu.utils import profiling

        x = jnp.ones((64, 64))
        f = jax.jit(lambda a: a @ a)
        dt = profiling.time_fn(f, x, iters=2)
        assert 0 < dt < 10.0

    def test_trace_context_writes_files(self, tmp_path):
        from audiocodec_tpu.utils import profiling

        log_dir = str(tmp_path / "trace")
        with profiling.trace(log_dir):
            jnp.sum(jnp.ones((32, 32))).block_until_ready()
        import os

        found = []
        for root, _, files in os.walk(log_dir):
            found.extend(files)
        assert found  # profiler artifacts exist
