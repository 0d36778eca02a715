"""Test configuration: run on CPU with 8 virtual devices so sharded paths
are exercised without multi-chip TPU hardware, and enable x64 so float64
compute-dtype paths (the reference's precompute precision) can be verified.

Note: this machine's sitecustomize force-registers a remote TPU plugin and
sets JAX_PLATFORMS=axon, so the platform must be overridden through
jax.config (env vars are rewritten before we run)."""

import os

# Must be set before the first jax backend initialization.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
