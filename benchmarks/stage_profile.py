#!/usr/bin/env python
"""Stage-level breakdown of the composed flagship round trip
(DESIGN.md §3d): where the non-transform half of the iteration goes.

Times CUMULATIVE pipeline prefixes with the rig's slope method (two
chain lengths, nonlinear feedback of each iteration's output into the
next input so XLA cannot decouple the chain), then differences adjacent
prefixes into per-stage costs:

  transform -> +tonality -> +threshold -> +quantize -> +dequant+inverse

  python benchmarks/stage_profile.py [--config bf16_int8|bf16|f32]
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
    ap.add_argument("--config", default="bf16_int8",
                    choices=["bf16_int8", "bf16", "f32"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bark-precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from audiocodec_tpu.codec import Codec

    sr, n, B = 44100, 1024, args.batch
    kw = dict(sample_rate=sr, filters_n=n, bark_bands_n=64,
              bark_precision=args.bark_precision)
    if args.config == "bf16_int8":
        codec = Codec.create(compute_dtype=jnp.bfloat16, fast_bf16=True,
                             dct_precision="int8", **kw)
        dtype = jnp.bfloat16
    elif args.config == "bf16":
        codec = Codec.create(compute_dtype=jnp.bfloat16, fast_bf16=True,
                             dct_precision="default", **kw)
        dtype = jnp.bfloat16
    else:
        codec = Codec.create(dct_precision="default", **kw)
        dtype = jnp.float32

    samples = int(sr * args.seconds) // n * n
    audio_s = B * samples / sr
    rng = np.random.default_rng(0)
    t = np.arange(samples) / sr
    base = (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.3 * np.sin(2 * np.pi * 1320 * t)
            + 0.05 * rng.normal(size=samples)).astype(np.float32)
    x = jax.device_put(jnp.asarray(
        np.broadcast_to(base[None, :, None], (B, samples, 1)), dtype=dtype
    ))

    def stage_transform(v):
        return codec.mdct.transform(v)

    def stage_tonality(v):
        s = codec.mdct.transform(v)
        return codec.psycho.tonality(s)

    def stage_threshold(v):
        s = codec.mdct.transform(v)
        return codec.psycho.global_masking_threshold(
            s, codec.psycho.tonality(s), 0.0)

    def stage_quantize(v):
        codes, delta, _ = codec.encode_quantized(v)
        return codes.astype(dtype)

    def stage_roundtrip(v):
        return codec.round_trip_quantized(v)

    def chain(fn, iters):
        @jax.jit
        def run(x0):
            def body(c, _):
                out = fn(c)
                # nonlinear feedback into the next input: the chain
                # cannot be decoupled or hoisted
                probe = jnp.abs(out.astype(jnp.float32)).mean() * 1e-6
                return c + probe.astype(c.dtype), out.reshape(-1)[0]
            c, last = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(last.astype(jnp.float32))
        return run

    def slope_ms(fn, l_short=16, l_long=64, reps=3):
        rs, rl = chain(fn, l_short), chain(fn, l_long)
        float(rs(x)); float(rl(x))  # compile + warm
        ts = min(_t(lambda: float(rs(x))) for _ in range(reps))
        tl = min(_t(lambda: float(rl(x))) for _ in range(reps))
        return (tl - ts) / (l_long - l_short) * 1e3

    def _t(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    stages = [
        ("transform", stage_transform),
        ("+tonality", stage_tonality),
        ("+threshold", stage_threshold),
        ("+quantize", stage_quantize),
        ("+dequant+inverse", stage_roundtrip),
    ]
    cum = []
    for name, fn in stages:
        ms = slope_ms(fn)
        cum.append((name, ms))
        print(json.dumps({"config": args.config,
                          "bark_precision": args.bark_precision, "prefix": name,
                          "cumulative_ms": round(ms, 3)}), flush=True)
    total = cum[-1][1]
    prev = 0.0
    table = {}
    for name, ms in cum:
        table[name] = round(ms - prev, 3)
        prev = ms
    print(json.dumps({
        "config": args.config, "per_stage_ms": table,
        "total_ms": round(total, 3),
        "audio_s_per_s": round(audio_s / (total / 1e3), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
