"""Test configuration.

Default lane: run on CPU with 8 virtual devices so sharded paths are
exercised without multi-chip TPU hardware, and enable x64 so float64
compute-dtype paths (the reference's precompute precision) can be verified.

Hardware lane (``pytest -m tpu``): keep the machine's real TPU backend and
run the opt-in numerics tests in tests/test_tpu_hw.py — the checks that
interpret mode cannot see (the interpreter's prng_random_bits returns
zeros, and Mosaic codegen differs from the interpreter). Compiles route
through the persistent compilation cache because cold compiles on the
remote-attached device take 30 s - 6 min.

Note: this machine's sitecustomize force-registers a remote TPU plugin and
sets JAX_PLATFORMS=axon, so the platform must be overridden through
jax.config (env vars are rewritten before we run)."""

import os

# Must be set before the first jax backend initialization. Harmless for
# the hardware lane (it only affects the CPU platform).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def _hardware_lane(config) -> bool:
    markexpr = config.getoption("-m") or ""
    return "tpu" in markexpr and "not tpu" not in markexpr


def pytest_configure(config):
    import jax

    if _hardware_lane(config):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    else:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
