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
        ("f32_high_n1024", 1024, jnp.float32, False, "high", (48, 192)),
        ("f32_default_n1024", 1024, jnp.float32, False, "default", (64, 256)),
        ("bf16_fast_n1024", 1024, jnp.bfloat16, True, "default", (96, 384)),
        # the int8 MXU tier (docs/DESIGN.md §3c): analysis = flat
        # per-row dynamic int8; synthesis = per-128-lane grouped int8
        # inside the kernel, one-pass float on the XLA path
        ("bf16_int8_n1024", 1024, jnp.bfloat16, True, "int8", (96, 384)),
        ("bf16_int8_n2048", 2048, jnp.bfloat16, True, "int8", (48, 192)),
        # "highest" is kernel-ineligible past N=1024 (Mosaic's f32 operand
        # decomposition exceeds scoped VMEM — mdct.py create); the long
        # blocks run the bf16-hi/lo split tier instead.
        ("f32_high_n2048", 2048, jnp.float32, False, "high", (24, 96)),
        ("f32_high_n4096", 4096, jnp.float32, False, "high", (16, 64)),
        # radix-only sizes: the quarter-size residents fit one block size
        # further up each precision tier than the mono design
        ("f32_highest_n2048", 2048, jnp.float32, False, "highest", (16, 64)),
        ("bf16_fast_n2048", 2048, jnp.bfloat16, True, "default", (48, 192)),
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
        # "pallas" = single-matmul kernel design, "radix" = the radix-2
        # split design (half the MACs, quarter the residents).
        for use_pallas, kernel, label in (
            (False, "mono", "xla"),
            (True, "mono", "pallas"),
            (True, "radix", "radix"),
        ):
            try:
                m = MDCT.create(
                    n, compute_dtype=dtype, fast_bf16=fast,
                    use_pallas=use_pallas, dct_precision=prec,
                    pallas_kernel=kernel,
                )
            except ValueError as e:
                row[f"{label}_skip"] = str(e)[:60]
                continue
            y0 = m.transform(x)

            # Chains feed each iteration's OUTPUT (via abs, a
            # nonlinearity) back into the next input: the MDCT is linear,
            # and XLA's algebraic simplifier can decouple/hoist a linear
            # op applied to a scalar-scaled carry — observed on a bare
            # matmul chain reporting 9,500 "TF/s". Feedback + abs makes
            # every iteration truly sequential on both paths.
            def fwd_chain(length):
                @jax.jit
                def chain(x0):
                    def body(c, _):
                        y = m.transform(c)
                        nxt = jnp.abs(
                            y[:, :blocks].reshape(c.shape)
                        ) * jnp.asarray(0.3, dtype) + c * jnp.asarray(
                            0.5, dtype
                        )
                        return nxt, jnp.float32(0)

                    c, _ = jax.lax.scan(body, x0, None, length=length)
                    return jnp.sum(jnp.abs(c.astype(jnp.float32)))

                return lambda: float(chain(x))

            def inv_chain(length):
                @jax.jit
                def chain(y0):
                    def body(c, _):
                        out = m.inverse_transform(c)
                        nxt = jnp.abs(
                            out[:, : blocks * n].reshape(c.shape)
                        ) * jnp.asarray(0.02, dtype) + c * jnp.asarray(
                            0.5, dtype
                        )
                        return nxt, jnp.float32(0)

                    c, _ = jax.lax.scan(body, y0, None, length=length)
                    return jnp.sum(jnp.abs(c.astype(jnp.float32)))

                yin = y0[:, :blocks]
                return lambda: float(chain(yin))

            ls, ll = (2, 6) if args.quick else chain_lens
            try:
                row[f"{label}_fwd_ms"] = round(
                    slope_timed(fwd_chain, ls, ll) * 1e3, 3
                )
                row[f"{label}_inv_ms"] = round(
                    slope_timed(inv_chain, ls, ll) * 1e3, 3
                )
            except Exception as e:  # noqa: BLE001 — a Mosaic compile
                # failure on one variant must not lose the other rows
                row[f"{label}_error"] = str(e).split("\n")[0][:100]
                row.pop(f"{label}_fwd_ms", None)
                continue
        # accuracy of each kernel design vs the f32 XLA ground truth
        ref = np.asarray(
            MDCT.create(n, compute_dtype=jnp.float32).transform(
                x.astype(jnp.float32)
            )
        )
        for kernel, label in (("mono", "pallas"), ("radix", "radix")):
            if f"{label}_fwd_ms" not in row:
                continue
            mp = MDCT.create(
                n, compute_dtype=dtype, fast_bf16=fast,
                use_pallas=True, dct_precision=prec, pallas_kernel=kernel,
            )
            got = np.asarray(mp.transform(x).astype(jnp.float32))
            row[f"{label}_fwd_maxerr_vs_f32xla"] = float(
                np.max(np.abs(got - ref))
            )
            row[f"speedup_fwd_{label}"] = round(
                row["xla_fwd_ms"] / row[f"{label}_fwd_ms"], 3
            )
            row[f"speedup_inv_{label}"] = round(
                row["xla_inv_ms"] / row[f"{label}_inv_ms"], 3
            )
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
