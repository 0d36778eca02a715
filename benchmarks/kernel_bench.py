"""Hardware A/B: XLA MDCT path vs the fused Pallas kernels.

Slope timing (two chain lengths, differenced) per CLAUDE.md: single-shot
RTT subtraction on this rig fluctuates up to 2x, and iterations must chain
on-device over loop-variant data or XLA hoists the work.

Usage:  python benchmarks/kernel_bench.py [--quick]
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
    ap.add_argument("--only", default="", help="comma list of config names")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from audiocodec_tpu.mdct import MDCT

    def slope_timed(make_chain, l_short=6, l_long=18):
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

    b = 8 if args.quick else 32
    results = []
    configs = [
        # (name, n, dtype, fast_bf16, precision, chain_lens)
        # chain lengths scale inversely with per-iteration time so the
        # long-short difference stays well above tunnel-RTT fluctuation
        ("f32_highest_n1024", 1024, jnp.float32, False, "highest", (32, 128)),
        ("f32_default_n1024", 1024, jnp.float32, False, "default", (64, 256)),
        ("bf16_fast_n1024", 1024, jnp.bfloat16, True, "default", (96, 384)),
        ("f32_highest_n2048", 2048, jnp.float32, False, "highest", (24, 96)),
        ("f32_highest_n4096", 4096, jnp.float32, False, "highest", (16, 64)),
    ]
    only = {s for s in args.only.split(",") if s}
    for name, n, dtype, fast, prec, chain_lens in configs:
        if only and name not in only:
            continue
        blocks = max(2, 441 * 1024 // n)
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(-0.8, 0.8, (b, blocks * n, 1)), dtype=dtype
        )
        row = {"config": name, "batch": b, "blocks": blocks}
        # "xla" is whatever formulation MDCT.create picks at that
        # precision: sparse fold at highest/high, dense two-matmul at
        # "default" (docs/DESIGN.md §3b) — i.e. the path a user gets.
        for use_pallas in (False, True):
            m = MDCT.create(
                n, compute_dtype=dtype, fast_bf16=fast,
                use_pallas=use_pallas, dct_precision=prec,
            )
            y0 = m.transform(x)
            label = "pallas" if use_pallas else "xla"

            def fwd_chain(length):
                @jax.jit
                def chain(x):
                    def body(c, _):
                        y = m.transform(c)
                        return c * jnp.asarray(0.99, dtype), jnp.sum(
                            jnp.abs(y.astype(jnp.float32))
                        )

                    _, s = jax.lax.scan(body, x, None, length=length)
                    return jnp.sum(s)

                return lambda: float(chain(x))

            def inv_chain(length):
                @jax.jit
                def chain(y):
                    def body(c, _):
                        out = m.inverse_transform(c)
                        return c * jnp.asarray(0.99, dtype), jnp.sum(
                            jnp.abs(out.astype(jnp.float32))
                        )

                    _, s = jax.lax.scan(body, y, None, length=length)
                    return jnp.sum(s)

                yin = y0[:, :blocks]
                return lambda: float(chain(yin))

            ls, ll = (2, 6) if args.quick else chain_lens
            row[f"{label}_fwd_ms"] = round(
                slope_timed(fwd_chain, ls, ll) * 1e3, 3
            )
            row[f"{label}_inv_ms"] = round(
                slope_timed(inv_chain, ls, ll) * 1e3, 3
            )
        # accuracy of the pallas path vs float64 ground truth
        mp = MDCT.create(
            n, compute_dtype=dtype, fast_bf16=fast,
            use_pallas=True, dct_precision=prec,
        )
        got = np.asarray(mp.transform(x).astype(jnp.float32))
        ref = np.asarray(
            MDCT.create(n, compute_dtype=jnp.float32).transform(
                x.astype(jnp.float32)
            )
        )
        row["pallas_fwd_maxerr_vs_f32xla"] = float(np.max(np.abs(got - ref)))
        row["speedup_fwd"] = round(row["xla_fwd_ms"] / row["pallas_fwd_ms"], 3)
        row["speedup_inv"] = round(row["xla_inv_ms"] / row["pallas_inv_ms"], 3)
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
