"""Observability: profiler traces and stage timing.

The reference's only tracing hook is a single tf.name_scope
(psychoacoustic.py:138). Here every pipeline stage runs under
jax.named_scope (searchable in XLA/profiler dumps), and this module adds
the user-facing entry points: a trace context manager for the JAX profiler
and a remote-backend-safe stage timer.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace of the enclosed block.

    View with TensorBoard or xprof:  trace("/tmp/codec-trace")
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, readback=None, **kwargs) -> float:
    """Best-of-`iters` wall seconds for fn(*args).

    On remote-attached backends block_until_ready does not imply device
    completion, so the timed region ends in a scalar host readback:
    ``readback`` maps fn's output to an array to reduce (default: the
    output itself).
    """
    import jax.numpy as jnp

    def run():
        out = fn(*args, **kwargs)
        target = readback(out) if readback is not None else out
        leaves = jax.tree_util.tree_leaves(target)
        return float(jnp.sum(jnp.abs(leaves[0].ravel()[:16])))

    run()  # warm / compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best
