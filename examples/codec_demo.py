#!/usr/bin/env python
"""Demo: encode a test signal across bitrates and print a quality table.

  python examples/codec_demo.py [--input song.wav] [--out-dir /tmp/demo]

Without --input, synthesizes a 5 s music-like test clip. Produces one .acz
per bitrate plus a native-VBR encode, decodes each, and reports size / SNR.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_clip(path, sr=44100, seconds=5.0):
    from audiocodec_tpu.io.wav import write_wav

    rng = np.random.default_rng(0)
    t = np.arange(int(sr * seconds)) / sr
    # a phrased mix: the tonal bed breathes (loud phrases / quiet
    # valleys, like verse dynamics)...
    env = 0.12 + 0.88 * np.sin(np.pi * t) ** 2
    wave = env * (
        0.35 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 659.3 * t)
        + 0.15 * np.sin(2 * np.pi * 880 * t) * np.sin(2 * np.pi * 3 * t)
        + 0.05 * rng.normal(size=t.size)
    )
    # ...with percussive hits IN the valleys — attacks rising out of
    # quiet are where pre-echo is audible and where TNS and block
    # switching act (hits buried in a loud bed create no contrast)
    for k in range(1, int(seconds)):
        s0 = int(k * sr) + sr // 50
        dt = np.arange(1500)
        hit = np.exp(-dt / 180.0) * rng.normal(size=1500)
        wave[s0 : s0 + 1500] += 0.7 * hit / np.abs(hit).max()
    write_wav(path, np.clip(wave, -1, 1).astype(np.float32)[:, None], sr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", default="")
    parser.add_argument("--out-dir", default="/tmp/codec_demo")
    parser.add_argument("--bitrates", default="48,96,160")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (quality is "
                             "identical; use when the TPU tunnel is "
                             "down)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from audiocodec_tpu import native, rate
    from audiocodec_tpu.codec import Codec
    from audiocodec_tpu.io import bitstream

    os.makedirs(args.out_dir, exist_ok=True)
    wav = args.input or os.path.join(args.out_dir, "input.wav")
    if not args.input:
        synth_clip(wav)

    data, sr = native.decode_wav(wav)
    n = 1024
    data = data[:, : data.shape[1] - data.shape[1] % n]
    codec = Codec.create(sr, filters_n=n, bark_bands_n=64)
    x = jnp.asarray(data, dtype=jnp.float32)
    seconds = x.shape[1] / sr
    raw_kbps = sr * data.shape[2] * 16 / 1000

    from audiocodec_tpu import metrics

    def snr(out):
        a = np.asarray(x[0], dtype=np.float64)
        b = np.asarray(out[0, n : n + x.shape[1]], dtype=np.float64)
        return 10 * np.log10((a**2).sum() / ((a - b) ** 2).sum())

    def nmr(out):
        return float(metrics.nmr(codec, x, out[:, n : n + x.shape[1]]))

    hit_starts = [] if args.input else [
        int(k * sr) + sr // 50
        for k in range(1, int(seconds))
        if int(k * sr) + sr // 50 < x.shape[1] - 2000
    ]

    def pre_echo(out):
        """Error energy in the 12 ms before each synthetic hit — the
        quantity SNR cannot see (it integrates over the loud parts) and
        the reason the ladder's TNS + block switching exist."""
        if not hit_starts:
            return float("nan")
        err = (np.asarray(out[0, n : n + x.shape[1], 0])
               - np.asarray(x[0, :, 0]))
        w, g = int(0.012 * sr), int(0.001 * sr)
        return float(sum(
            (err[s0 - g - w : s0 - g] ** 2).sum() for s0 in hit_starts
        ))

    print(f"input: {wav} ({seconds:.1f} s @ {sr} Hz, {raw_kbps:.0f} kbps PCM)")
    print(f"{'mode':>12} {'kbps':>7} {'bytes':>9} {'SNR dB':>7} "
          f"{'NMR':>7} {'pre-echo':>9}")

    # native VBR
    codes, bark = codec.encode_bitstream(x)
    packed = bitstream.pack(
        codes, bark, sample_rate=sr, filters_n=n, bark_bands_n=64,
        alpha=0.6, window_type="vorbis",
    )
    out = codec.decode_bitstream(jnp.asarray(codes), jnp.asarray(bark))
    kbps = len(packed) * 8 / seconds / 1000
    print(f"{'VBR':>12} {kbps:7.0f} {len(packed):9d} {snr(out):7.2f} "
          f"{nmr(out):7.3f} {pre_echo(out):9.3f}")

    # plain rate control, then the full coded-feature ladder
    # (dead zone + TNS + block switching + noise fill + temporal
    # masking — the CLI's --preset low) at the same targets
    ladders = (
        ("plain", dict()),
        ("ladder", dict(deadzone="auto", tns=True, bs=True, nf=True,
                        tmask=130.0)),
    )
    for target in (float(b) for b in args.bitrates.split(",")):
        for name, kw in ladders:
            res = rate.encode_with_target_bitrate(codec, x, target, **kw)
            path = os.path.join(
                args.out_dir, f"{int(target)}kbps_{name}.acz"
            )
            with open(path, "wb") as f:
                f.write(res.packed)
            codes2, bark2, meta = bitstream.unpack(res.packed)
            ti = meta["tns_idx"]
            nfl = meta["nf_levels"]
            bsf = meta["bs_flags"]
            out = codec.decode_bitstream(
                jnp.asarray(codes2),
                jnp.asarray(bark2, dtype=jnp.bfloat16),
                threshold_scale=meta["threshold_scale"],
                dz_recon=meta["dz_recon"],
                tns_idx=None if ti is None else jnp.asarray(ti),
                tns_band_start=meta["tns_band_start"] or None,
                nf_levels=None if nfl is None else jnp.asarray(nfl),
                nf_band_start=(None if nfl is None
                               else meta["nf_band_start"]),
                nf_seed=np.uint32(meta["nf_seed"]),
                bs_flags=None if bsf is None else jnp.asarray(bsf),
            )
            label = f"{int(target)}k {name}"
            print(
                f"{label:>12} {res.kbps:7.0f} {len(res.packed):9d} "
                f"{snr(out):7.2f} {nmr(out):7.3f} {pre_echo(out):9.3f}"
            )
    print("(read all three columns: the ladder's wins concentrate where "
          "attacks rise out of quiet — less pre-echo, often better SNR "
          "at mid rates — while noise filling deliberately trades raw "
          "SNR for filled spectral holes; see benchmarks/QUALITY.md)")


if __name__ == "__main__":
    main()
