"""Numerical debugging: NaN/Inf guards via jax.experimental.checkify.

The reference's NaN story is the _INTENSITY_EPS floors in the
psychoacoustic model (reference psychoacoustic.py:206-208,311); those are
kept, and this module adds what TF eager gave its users for free: the
ability to localize a non-finite value when it does appear.

    checked = debug.checked(codec.round_trip)
    err, out = checked(x, key)
    err.throw()   # raises with the failing check's location, if any
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn, *, errors=checkify.float_checks):
    """Wrap a pipeline function with checkify float checks (NaN/Inf/OOB).

    Returns a function computing (error, result); call error.throw() to
    raise on failure. Works under jit.
    """
    return checkify.checkify(fn, errors=errors)


def assert_finite(x, name: str = "tensor"):
    """In-graph finite assertion (adds a checkify check when enabled).

    Use inside custom pipelines; a no-op unless run through checked().
    """
    checkify.check(
        jnp.all(jnp.isfinite(x)), f"{name} contains NaN/Inf"
    )
    return x


def find_nonfinite(tree) -> dict:
    """Host-side sweep: leaf path -> count of non-finite values (eager)."""
    bad = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            n = int(jnp.sum(~jnp.isfinite(leaf)))
            if n:
                bad[jax.tree_util.keystr(path)] = n
    return bad
