"""Probe: can int8 MXU matmuls buy the quantized path another 2x?

v5e's MXU does 394 int8 TOPS vs 197 bf16 TFLOPS. The flagship
round_trip_quantized path already accepts one-pass bf16 transform error
(quantization noise sits ~60 dB above it, docs/DESIGN.md §3b), so an
int8 DCT matmul — dynamic per-row requantize of the signal against an
int8-quantized [N, N] matrix, int32 accumulation, rescale — is the one
precision tier below bf16 the hardware rewards with more FLOPs.

This probe measures, slope-timed per CLAUDE.md (feedback-hardened
chains, two lengths, best-of-3, scalar readback):
  1. the raw [B*blocks, N] @ [N, N] matmul in bf16 / int8 / f32-default,
     with each variant paying its own per-iteration conversion cost
     (bf16: one cast; int8: row-max + round + clip + int32->f32 rescale);
  2. the same for the dense two-matmul MDCT formulation (what the XLA
     production path runs at dct_precision="default");
  3. accuracy of an int8 MDCT forward vs the f32 XLA ground truth.

Usage: python benchmarks/int8_probe.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax import lax

    print(json.dumps({"backend": jax.default_backend()}))

    n = 1024
    b = 8 if args.quick else 32
    blocks = 441 * 1024 // n
    m_rows = b * (blocks + 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(-0.8, 0.8, (m_rows, n)).astype(np.float32)
    )

    # A representative DCT-IV-like matrix (orthonormal cosines): the
    # probe cares about matmul cost + quantization error transfer, not
    # the exact MDCT basis.
    k = np.arange(n)
    mat = np.sqrt(2.0 / n) * np.cos(
        np.pi / n * (k[:, None] + 0.5) * (k[None, :] + 0.5)
    )
    mat_f32 = jnp.asarray(mat.astype(np.float32))
    mat_bf16 = jnp.asarray(mat.astype(np.float32), dtype=jnp.bfloat16)
    s_m = float(np.max(np.abs(mat)))
    mat_i8 = jnp.asarray(
        np.clip(np.round(mat / s_m * 127.0), -127, 127).astype(np.int8)
    )

    def slope_timed(make_chain, l_short, l_long):
        short, long_ = make_chain(l_short), make_chain(l_long)
        short(), long_()

        def best_of(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        return max((best_of(long_) - best_of(short)) / (l_long - l_short), 1e-9)

    def chain_of(step):
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

        return make

    def bf16_step(c):
        return lax.dot_general(
            c.astype(jnp.bfloat16), mat_bf16,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def f32_step(c):
        return lax.dot_general(
            c, mat_f32, (((1,), (0,)), ((), ())),
        )

    def int8_quant(c):
        s = jnp.max(jnp.abs(c), axis=1, keepdims=True) + jnp.float32(1e-12)
        q = jnp.clip(jnp.round(c * (127.0 / s)), -127.0, 127.0).astype(jnp.int8)
        return q, s

    def int8_step(c):
        q, s = int8_quant(c)
        y32 = lax.dot_general(
            q, mat_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y32.astype(jnp.float32) * (s * (s_m / (127.0 * 127.0)))

    def two_mm_step(mat_a, mat_b, conv):
        # dense two-matmul formulation: y[n] = x[n]@A + roll(x)[n]@B
        def step(c):
            y = conv(c, mat_a)
            y = y + conv(jnp.roll(c, 1, axis=0), mat_b)
            return y

        return step

    ls, ll = (4, 12) if args.quick else (24, 96)
    out = {"m_rows": m_rows, "n": n}
    for name, step in (
        ("f32_onepass_1mm", f32_step),
        ("bf16_1mm", bf16_step),
        ("int8_1mm", int8_step),
    ):
        ms = slope_timed(chain_of(step), ls, ll) * 1e3
        gflop = 2 * m_rows * n * n / 1e9
        out[name + "_ms"] = round(ms, 4)
        out[name + "_tf_s"] = round(gflop / ms, 1)

    # two-matmul variants (the XLA production formulation's shape)
    def bf16_conv(c, m):
        return lax.dot_general(
            c.astype(jnp.bfloat16), m.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def int8_conv_factory():
        def conv(c, m_i8):
            q, s = int8_quant(c)
            y32 = lax.dot_general(
                q, m_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return y32.astype(jnp.float32) * (s * (s_m / (127.0 * 127.0)))

        return conv

    for name, step in (
        ("bf16_2mm", two_mm_step(mat_bf16, mat_bf16, bf16_conv)),
        ("int8_2mm", two_mm_step(mat_i8, mat_i8, int8_conv_factory())),
    ):
        ms = slope_timed(chain_of(step), ls, ll) * 1e3
        gflop = 2 * 2 * m_rows * n * n / 1e9
        out[name + "_ms"] = round(ms, 4)
        out[name + "_tf_s"] = round(gflop / ms, 1)

    # accuracy: int8 vs f32 single matmul on audio-like data
    y_ref = np.asarray(jax.jit(f32_step)(x))
    y_i8 = np.asarray(jax.jit(int8_step)(x))
    y_bf = np.asarray(jax.jit(bf16_step)(x))
    for name, y in (("int8", y_i8), ("bf16", y_bf)):
        err = y - y_ref
        snr = 10 * np.log10(
            float(np.sum(y_ref**2)) / max(float(np.sum(err**2)), 1e-30)
        )
        out[name + "_snr_vs_f32_db"] = round(snr, 2)
        out[name + "_maxerr"] = float(np.max(np.abs(err)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
