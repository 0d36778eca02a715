"""Probe: does Mosaic's in-kernel int8 dot reach XLA's int8 matmul rate?

benchmarks/int8_probe.py measured XLA int8 [14144,1024]@[1024,1024] at
0.132 ms (1.41x over bf16) including per-row dynamic quantization. The
mono Pallas MDCT kernel runs ONE such matmul per direction; if Mosaic
sustains a comparable int8 rate, an in-kernel int8 tier halves the
kernel's matmul cost. DESIGN.md §3 records that Mosaic's one-pass bf16
dot only reaches ~100 TF/s where XLA reaches ~182 — this probe answers
the same question for int8 before any tier is built on it.

Measures, slope-timed per CLAUDE.md (feedback chains, two lengths,
best-of-3, scalar readback):
  1. pallas bf16 one-pass dot (the current 'default' tier's shape);
  2. pallas int8 dot with in-kernel per-row dynamic quantize + rescale;
  3. the XLA int8 matmul on the same shapes (cross-check vs int8_probe).

Usage: python benchmarks/pallas_int8_probe.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(json.dumps({"backend": jax.default_backend()}))

    n = 1024
    tb = 512
    rows = 14336  # 28 tiles of 512 ~ the B=32/10s transform shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.8, 0.8, (rows, n)).astype(np.float32))

    k = np.arange(n)
    mat = np.sqrt(2.0 / n) * np.cos(
        np.pi / n * (k[:, None] + 0.5) * (k[None, :] + 0.5)
    )
    s_m = float(np.max(np.abs(mat)))
    mat_bf16 = jnp.asarray(mat.astype(np.float32), dtype=jnp.bfloat16)
    mat_i8 = jnp.asarray(
        np.clip(np.round(mat / s_m * 127.0), -127, 127).astype(np.int8)
    )

    def bf16_kernel(x_ref, m_ref, o_ref):
        o_ref[...] = jnp.dot(
            x_ref[...].astype(jnp.bfloat16),
            m_ref[...],
            preferred_element_type=jnp.float32,
        )

    def int8_kernel(x_ref, m_ref, o_ref, *, rescale):
        u = x_ref[...]
        s = jnp.max(jnp.abs(u), axis=1, keepdims=True) + jnp.float32(1e-12)
        q = jnp.clip(
            jnp.round(u * (jnp.float32(127.0) / s)), -127.0, 127.0
        ).astype(jnp.int8)
        y32 = jnp.dot(q, m_ref[...], preferred_element_type=jnp.int32)
        o_ref[...] = y32.astype(jnp.float32) * (s * jnp.float32(rescale))

    def int8_grouped_kernel(x_ref, m_ref, o_ref, *, rescale, g=128):
        """Per-(row, 128-lane-group) dynamic int8: 8 K=128 dots with f32
        rescale-accumulate in VMEM. The grouping makes the quantization
        error track the input's envelope (decisive for spectra-side
        accuracy — flat per-row error lands above the masking threshold
        in quiet bands; see /tmp CPU sim: NMR 0.30 flat vs 0.029 at
        g=128)."""
        u = x_ref[...]
        acc = jnp.zeros((u.shape[0], m_ref.shape[1]), jnp.float32)
        for j in range(u.shape[1] // g):
            seg = u[:, j * g:(j + 1) * g]
            s = jnp.max(jnp.abs(seg), axis=1, keepdims=True) + jnp.float32(
                1e-12
            )
            q = jnp.clip(
                jnp.round(seg * (jnp.float32(127.0) / s)), -127.0, 127.0
            ).astype(jnp.int8)
            y32 = jnp.dot(
                q, m_ref[j * g:(j + 1) * g, :],
                preferred_element_type=jnp.int32,
            )
            acc = acc + y32.astype(jnp.float32) * s
        o_ref[...] = acc * jnp.float32(rescale)

    def make_call(kernel, m, m_dtype):
        return pl.pallas_call(
            kernel,
            grid=(rows // tb,),
            in_specs=[
                pl.BlockSpec((tb, n), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, n), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, n), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(
                    3 * tb * n * 4 + n * n * np.dtype(m_dtype).itemsize * 2
                    + (8 << 20)
                ),
            ),
            interpret=args.interpret,
        )

    pall_bf16 = make_call(bf16_kernel, mat_bf16, jnp.bfloat16)
    pall_int8 = make_call(
        functools.partial(int8_kernel, rescale=s_m / (127.0 * 127.0)),
        mat_i8, jnp.int8,
    )
    pall_int8_grp = make_call(
        functools.partial(
            int8_grouped_kernel, rescale=s_m / (127.0 * 127.0)
        ),
        mat_i8, jnp.int8,
    )

    def xla_int8(c):
        s = jnp.max(jnp.abs(c), axis=1, keepdims=True) + jnp.float32(1e-12)
        q = jnp.clip(jnp.round(c * (127.0 / s)), -127.0, 127.0).astype(
            jnp.int8
        )
        y32 = lax.dot_general(
            q, mat_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y32.astype(jnp.float32) * (s * (s_m / (127.0 * 127.0)))

    variants = {
        "pallas_bf16": lambda c: pall_bf16(c, mat_bf16),
        "pallas_int8": lambda c: pall_int8(c, mat_i8),
        "pallas_int8_grouped": lambda c: pall_int8_grp(c, mat_i8),
        "xla_int8": xla_int8,
    }

    # accuracy cross-check first (also catches Mosaic compile failures
    # before any timing money is spent)
    y_ref = np.asarray(
        jax.jit(
            lambda c: lax.dot_general(
                c, jnp.asarray(mat.astype(np.float32)),
                (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
            )
        )(x)
    )
    out = {"rows": rows, "n": n, "tb": tb}
    for name, fn in variants.items():
        try:
            y = np.asarray(jax.jit(fn)(x))
        except Exception as e:  # Mosaic lowering may reject int8 dot
            out[name + "_error"] = type(e).__name__ + ": " + str(e)[:200]
            variants[name] = None
            continue
        err = y - y_ref
        snr = 10 * np.log10(
            float(np.sum(y_ref**2)) / max(float(np.sum(err**2)), 1e-30)
        )
        out[name + "_snr_db"] = round(snr, 2)

    if args.interpret:
        print(json.dumps(out))
        return

    def slope_timed(step, l_short, l_long):
        def make(length):
            @jax.jit
            def chain(x0):
                def body(c, _):
                    y = step(c)
                    nxt = jnp.abs(y) * 0.3 + c * 0.5
                    return nxt, jnp.float32(0)

                c, _ = lax.scan(body, x0, None, length=length)
                return jnp.sum(jnp.abs(c))

            return lambda: float(chain(x))

        short, long_ = make(l_short), make(l_long)
        short(), long_()

        def best_of(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        return max((best_of(long_) - best_of(short)) / (l_long - l_short), 1e-9)

    ls, ll = (4, 12) if args.quick else (24, 96)
    gflop = 2 * rows * n * n / 1e9
    for name, fn in variants.items():
        if fn is None:
            continue
        ms = slope_timed(fn, ls, ll) * 1e3
        out[name + "_ms"] = round(ms, 4)
        out[name + "_tf_s"] = round(gflop / ms, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
