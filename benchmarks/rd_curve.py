"""Rate-distortion sweep: SNR / NMR vs actual container bitrate.

Sweeps the rate-control knob (threshold_scale — the one scalar the
bitstream records, io/FORMATS.md) over a signal and reports the measured
.acz bitrate with the auto-picked entropy coder next to SNR and NMR at
each point. This is the codec's quality story in one table: where SNR
degrades gracefully as kbps drops, and where NMR crosses ~1 (noise
reaching the masking threshold).

Usage:  python benchmarks/rd_curve.py [--signal tones|noise|speechlike]
                                      [--seconds 10] [--markdown]
                                      [--deadzone 0.5,0.9,1.0]

With --deadzone the sweep runs MATCHED-RATE: each zero-bin width is
rate-controlled to the same kbps targets (the container's real packed
size), so the SNR/NMR columns compare equal-bitrate points. This is the
measurement behind rate.resolve_deadzone's auto ladder.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0]


def make_signal(kind: str, sr: int, seconds: float) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    rng = np.random.default_rng(0)
    if kind == "tones":
        x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(
            2 * np.pi * 1320 * t
        )
    elif kind == "noise":
        x = 0.3 * rng.normal(size=t.size)
    else:  # speechlike: tones + noise + amplitude modulation
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.1 * t) ** 2
        x = env * (
            0.35 * np.sin(2 * np.pi * 220 * t)
            + 0.2 * np.sin(2 * np.pi * 660 * t)
            + 0.08 * rng.normal(size=t.size)
        )
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def deadzone_sweep(codec, x, dur, args):
    """Matched-rate dead-zone comparison: every width rate-controlled to
    the same targets; rows report the container's REAL kbps next to
    SNR/NMR so equal-rate points are compared."""
    import jax.numpy as jnp

    from audiocodec_tpu import metrics, rate
    from audiocodec_tpu.io import bitstream

    zones = [float(z) for z in args.deadzone.split(",")]
    targets = [float(k) for k in args.targets.split(",")]
    n = codec.mdct.filters_n
    rows = []
    for target in targets:
        for z in zones:
            res = rate.encode_with_target_bitrate(
                codec, x, target, deadzone=z
            )
            codes, bark, meta = bitstream.unpack(res.packed)
            out = codec.decode_bitstream(
                jnp.asarray(codes), jnp.asarray(bark, dtype=jnp.bfloat16),
                threshold_scale=res.threshold_scale,
                dz_recon=meta["dz_recon"],
            )[:, n:-n]
            ev = metrics.evaluate(codec, x, out)
            rows.append({
                "target_kbps": target,
                "deadzone": z,
                "kbps": round(res.kbps, 1),
                "snr_db": round(ev["snr_db"], 2),
                "nmr": round(ev["nmr"], 4),
            })
            print(json.dumps(rows[-1]), flush=True)
    if args.markdown:
        print(f"\n| target | deadzone | kbps | SNR dB | NMR | "
              f"({args.signal}, {dur:.0f}s mono) |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['target_kbps']} | {r['deadzone']} | {r['kbps']} "
                  f"| {r['snr_db']} | {r['nmr']} | |")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--signal", default="speechlike",
                    choices=["tones", "noise", "speechlike"])
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--markdown", action="store_true",
                    help="also print a markdown table")
    ap.add_argument("--deadzone", default="",
                    help="comma-separated zero-bin widths; switches to a "
                         "matched-rate sweep (rate-controlled to shared "
                         "kbps targets) comparing the widths")
    ap.add_argument("--targets", default="40,64,96,128",
                    help="kbps targets for the --deadzone sweep")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (quality numbers are "
                         "platform-independent; use when the TPU tunnel "
                         "is down)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from audiocodec_tpu import metrics
    from audiocodec_tpu.codec import Codec
    from audiocodec_tpu.io import bitstream

    sr, n = 44100, 1024
    codec = Codec.create(sr, filters_n=n, bark_bands_n=64)
    wave = make_signal(args.signal, sr, args.seconds)
    wave = wave[: wave.size // n * n]
    dur = wave.size / sr
    x = jnp.asarray(wave[None, :, None])

    if args.deadzone:
        return deadzone_sweep(codec, x, dur, args)

    # one jitted program per sweep point is wasteful; scale is a traced
    # scalar so every point reuses ONE compiled encode and ONE decode
    @jax.jit
    def encode(c, x, scale):
        codes, bark = c.quantize_frames(
            c.mdct.transform(x), 0.0, threshold_scale=scale
        )
        return codes, bark

    @jax.jit
    def decode(c, codes, bark, scale):
        return c.decode_bitstream(codes, bark, threshold_scale=scale)

    pack_kw = dict(
        sample_rate=sr, filters_n=n, bark_bands_n=64,
        alpha=codec.psycho.alpha, window_type="vorbis",
        compute_dtype="float32",
    )
    rows = []
    for scale in SCALES:
        s = jnp.float32(scale)
        codes, bark = encode(codec, x, s)
        out = decode(codec, codes, bark, s)[:, n:-n]
        blob = bitstream.pack(
            np.asarray(codes), np.asarray(bark),
            threshold_scale=scale, **pack_kw,
        )
        kbps = len(blob) * 8 / dur / 1000
        ev = metrics.evaluate(codec, x, out)
        rows.append({
            "threshold_scale": scale,
            "kbps": round(kbps, 1),
            "snr_db": round(ev["snr_db"], 2),
            "nmr": round(ev["nmr"], 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    if args.markdown:
        print(f"\n| scale | kbps | SNR dB | NMR | ({args.signal}, "
              f"{dur:.0f}s mono {sr/1000:.1f} kHz) |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['threshold_scale']} | {r['kbps']} | "
                  f"{r['snr_db']} | {r['nmr']} | |")
    return rows


if __name__ == "__main__":
    main()
