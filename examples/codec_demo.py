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
    wave = (
        0.35 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 659.3 * t)
        + 0.15 * np.sin(2 * np.pi * 880 * t) * np.sin(2 * np.pi * 3 * t)
        + 0.05 * rng.normal(size=t.size)
    )
    write_wav(path, np.clip(wave, -1, 1).astype(np.float32)[:, None], sr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", default="")
    parser.add_argument("--out-dir", default="/tmp/codec_demo")
    parser.add_argument("--bitrates", default="48,96,160")
    args = parser.parse_args()

    import jax

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

    def snr(out):
        a = np.asarray(x[0], dtype=np.float64)
        b = np.asarray(out[0, n : n + x.shape[1]], dtype=np.float64)
        return 10 * np.log10((a**2).sum() / ((a - b) ** 2).sum())

    print(f"input: {wav} ({seconds:.1f} s @ {sr} Hz, {raw_kbps:.0f} kbps PCM)")
    print(f"{'mode':>12} {'kbps':>7} {'bytes':>9} {'SNR dB':>7}")

    # native VBR
    codes, bark = codec.encode_bitstream(x)
    packed = bitstream.pack(
        codes, bark, sample_rate=sr, filters_n=n, bark_bands_n=64,
        alpha=0.6, window_type="vorbis",
    )
    out = codec.decode_bitstream(jnp.asarray(codes), jnp.asarray(bark))
    kbps = len(packed) * 8 / seconds / 1000
    print(f"{'VBR':>12} {kbps:7.0f} {len(packed):9d} {snr(out):7.2f}")

    for target in (float(b) for b in args.bitrates.split(",")):
        res = rate.encode_with_target_bitrate(codec, x, target)
        path = os.path.join(args.out_dir, f"{int(target)}kbps.acz")
        with open(path, "wb") as f:
            f.write(res.packed)
        codes2, bark2, meta = bitstream.unpack(res.packed)
        out = codec.decode_bitstream(
            jnp.asarray(codes2),
            jnp.asarray(bark2, dtype=jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
        )
        print(
            f"{int(target):>9}kbps {res.kbps:7.0f} {len(res.packed):9d} "
            f"{snr(out):7.2f}"
        )


if __name__ == "__main__":
    main()
