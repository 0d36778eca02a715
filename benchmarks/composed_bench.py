"""Composed-pipeline A/B: Codec.round_trip_quantized with vs without the
Pallas MDCT kernels, per precision/dtype configuration.

The standalone kernel A/B (kernel_bench.py) measures the transforms in
isolation; THIS is the number that decides Codec defaults — inside one
jit program a pallas_call is a fusion barrier, so a standalone win can
compose into a loss (docs/DESIGN.md §3).

Usage: python benchmarks/composed_bench.py [--quick]
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
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from audiocodec_tpu.codec import Codec

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

        return max(
            (best_of(long_) - best_of(short)) / (l_long - l_short), 1e-9
        )

    sr, n = 44100, 1024
    b = 8 if args.quick else 32
    dur = 2.0 if args.quick else 10.0
    samples = int(sr * dur) // n * n
    rng = np.random.default_rng(0)
    base = (
        0.4 * np.sin(2 * np.pi * 440 * np.arange(samples) / sr)
        + 0.05 * rng.normal(size=samples)
    ).astype(np.float32)

    configs = [
        # (name, dtype, fast_bf16, precision, chain_lens)
        ("f32_highest", jnp.float32, False, "highest", (16, 64)),
        ("f32_default", jnp.float32, False, "default", (32, 128)),
        ("bf16_fast_default", jnp.bfloat16, True, "default", (48, 192)),
        ("bf16_fast_highest", jnp.bfloat16, True, "highest", (24, 96)),
        # the int8 MXU tier (docs/DESIGN.md §3c): xla = int8 analysis +
        # one-pass synthesis; pallas = flat-int8 analysis kernel +
        # grouped-int8 synthesis kernel
        ("f32_int8", jnp.float32, False, "int8", (32, 128)),
        ("bf16_int8", jnp.bfloat16, True, "int8", (48, 192)),
    ]
    only = {s for s in args.only.split(",") if s}
    for name, dtype, fast, prec, lens in configs:
        if only and name not in only:
            continue
        x = jnp.asarray(
            np.tile(base[None, :, None], (b, 1, 1)), dtype=dtype
        )
        row = {"config": name, "batch": b}
        for label, up, kern in (
            ("xla", False, "mono"),
            ("pallas", True, "mono"),
            ("radix", True, "radix"),
        ):
            if prec == "int8" and kern == "radix":
                row["radix_ms"] = float("nan")  # no int8 radix tier
                continue
            codec = Codec.create(
                sr, filters_n=n, bark_bands_n=64, compute_dtype=dtype,
                fast_bf16=fast, dct_precision=prec, use_pallas=up,
                pallas_kernel=kern,
            )

            def make_chain(length):
                @jax.jit
                def chain(c, x0):
                    def body(acc, i):
                        xi = x0 * (1.0 + 0.001 * i.astype(dtype))
                        out = c.round_trip_quantized(xi)
                        return acc + jnp.sum(
                            jnp.abs(out).astype(jnp.float32)
                        ), None

                    acc, _ = jax.lax.scan(
                        body, jnp.float32(0), jnp.arange(length)
                    )
                    return acc

                return lambda: float(chain(codec, x))

            ls, ll = (2, 6) if args.quick else lens
            row[f"{label}_ms"] = round(slope_timed(make_chain, ls, ll) * 1e3, 3)
        row["speedup"] = round(row["xla_ms"] / row["pallas_ms"], 3)
        audio_s = b * samples / sr
        if row["radix_ms"] == row["radix_ms"]:  # not NaN
            row["speedup_radix"] = round(row["xla_ms"] / row["radix_ms"], 3)
        else:
            del row["radix_ms"]
        for label in ("xla", "pallas", "radix"):
            if f"{label}_ms" in row:
                row[f"{label}_audio_s_per_s"] = round(
                    audio_s / (row[f"{label}_ms"] / 1e3), 1
                )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
