#!/usr/bin/env python
"""Decompose the serve path's per-batch cost on the real rig — the
serve analogue of transport_probe.py.

The dynamic batcher's request cycle is:
  wav parse -> batch buffer -> H2D -> device encode -> D2H codes ->
  rice pack -> socket response
This prints one JSON line per stage so the ceiling math is explicit:
which stages ride the ~37 MB/s forced-completion tunnel transport
(H2D/D2H), which are host CPU (parse/pack), and what the device compute
actually costs. Run it before/after serve-path tuning.

  python benchmarks/serve_probe.py [--batch 8] [--seconds 2.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--filters-n", type=int, default=1024)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from audiocodec_tpu import native
    from audiocodec_tpu.codec import Codec
    from audiocodec_tpu.io import bitstream
    from audiocodec_tpu.io.wav import read_wav_bytes, write_wav_bytes

    sr, n, g = 44100, args.filters_n, args.batch
    codec = Codec.create(sr, filters_n=n, bark_bands_n=64)
    samples = int(sr * args.seconds) // n * n
    rng = np.random.default_rng(0)
    t = np.arange(samples) / sr
    wave = (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.03 * rng.standard_normal(samples)).astype(np.float32)
    wav_bytes = write_wav_bytes(wave[:, None], sr)
    audio_s = g * samples / sr

    def emit(stage, dt, note=""):
        row = {"stage": stage, "ms": round(dt * 1e3, 1),
               "audio_s_per_s": round(audio_s / dt, 1)}
        if note:
            row["note"] = note
        print(json.dumps(row), flush=True)

    # 1. wav parse (host)
    emit("wav_parse_x8", best_of(
        lambda: [read_wav_bytes(wav_bytes) for _ in range(g)]))

    xf32 = np.zeros((g, samples, 1), dtype=np.float32)
    for j in range(g):
        xf32[j, :, 0] = wave
    xi16 = np.round(
        np.clip(xf32, -1, 1) * 32768.0
    ).astype(np.int16)

    @jax.jit
    def enc(c, x):
        return c.quantize_frames(c.mdct.transform(x))

    @jax.jit
    def enc_i16(c, xi):
        x = xi.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        return c.quantize_frames(c.mdct.transform(x))

    # 2. current path: implicit-transfer jit call (raw numpy arg)
    codes, bark = enc(codec, xf32)
    ch, bh = np.asarray(codes), np.asarray(bark)
    emit("enc_implicit_f32", best_of(
        lambda: np.asarray(enc(codec, xf32)[0])[0, 0, 0, 0]),
        note=f"{xf32.nbytes/1e6:.1f} MB up")

    # 3. explicit device_put f32 then jit (forced complete via result)
    emit("enc_put_f32", best_of(
        lambda: np.asarray(enc(codec, jax.device_put(xf32))[0])[0, 0, 0, 0]),
        note=f"{xf32.nbytes/1e6:.1f} MB up")

    # 4. int16 wire + device dequant
    np.asarray(enc_i16(codec, jax.device_put(xi16))[0])
    emit("enc_put_i16", best_of(
        lambda: np.asarray(enc_i16(codec, jax.device_put(xi16))[0])[0, 0, 0, 0]),
        note=f"{xi16.nbytes/1e6:.1f} MB up")

    # 5. D2H readback: codes int32 vs int16
    emit("d2h_codes_i32", best_of(lambda: np.asarray(codes)),
         note=f"{ch.nbytes/1e6:.1f} MB down")

    @jax.jit
    def to16(codes):
        m = jnp.max(jnp.abs(codes))
        return codes.astype(jnp.int16), m <= 32767

    c16, ok = to16(codes)
    np.asarray(c16)
    emit("d2h_codes_i16", best_of(lambda: np.asarray(to16(codes)[0])),
         note=f"{ch.nbytes/2e6:.1f} MB down")

    # 6. host rice pack (per clip, thread-poolable)
    emit("pack_x8", best_of(lambda: [
        bitstream.pack(ch[j:j + 1], bh[j:j + 1], entropy="rrice",
                       sample_rate=sr, filters_n=n, bark_bands_n=64,
                       alpha=codec.psycho.alpha, window_type="vorbis",
                       compute_dtype="float32",
                       bark_precision=codec.psycho.bark_precision,
                       sidecar_grid=codec.sidecar_grid)
        for j in range(g)
    ]), note="rrice+container x8" if native.available() else "no native")

    # 7. device compute alone (slope over chained iterations)
    @jax.jit
    def chain(c, x, iters):
        def body(i, acc):
            out, _ = c.quantize_frames(c.mdct.transform(
                x * (1.0 + 1e-4 * i.astype(x.dtype))))
            return acc + jnp.sum(jnp.abs(out).astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    xd = jax.device_put(xf32)
    i2, i10 = jnp.asarray(2, jnp.int32), jnp.asarray(10, jnp.int32)
    float(chain(codec, xd, i2)); float(chain(codec, xd, i10))
    t2 = best_of(lambda: float(chain(codec, xd, i2)))
    t10 = best_of(lambda: float(chain(codec, xd, i10)))
    emit("device_encode_only", max((t10 - t2) / 8, 1e-9))


if __name__ == "__main__":
    main()
