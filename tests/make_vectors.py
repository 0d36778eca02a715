#!/usr/bin/env python
"""Generate the committed conformance vectors (tests/vectors/).

Run ONCE on CPU when the format deliberately changes, then commit the
outputs; tests/test_vectors.py decodes the committed files forever
after. The vectors freeze the WIRE FORMAT and the decoder contract:

* container bytes must keep parsing (members, validation, meta),
* the recovered integer codes must match bit-exactly (container
  parsing and entropy coding are deterministic), and
* the decoded waveform must stay within a small tolerance of the
  recorded one (float synthesis may drift by ulps across XLA versions
  and backends — step sizes, not output floats, are the bit contract).

    python tests/make_vectors.py [--only name.acz ...]

``--only`` regenerates just the named vectors (and their manifest
entries), leaving the other committed files byte-untouched. Prefer it
when ADDING a vector: vectors written by older encoder versions are
themselves coverage — they prove today's decoder still reads
yesterday's writers — so wholesale regeneration throws away exactly
the compatibility the vectors exist to freeze.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VEC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vectors")

SR, N, BARK = 16000, 64, 16


def _signal(channels=1, blocks=12):
    rng = np.random.default_rng(0xC0DEC)
    t = np.arange(blocks * N) / SR
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(
        t.size
    )
    x[5 * N + 11 : 5 * N + 60] += 0.7  # a transient for tns/bs
    x = np.clip(x, -1, 1).astype(np.float32)[:, None]
    if channels == 2:
        x = np.concatenate(
            [x, x + 0.01 * rng.standard_normal(x.shape).astype(np.float32)],
            axis=1,
        )
    return x


def main(only=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from audiocodec_tpu.codec import Codec
    from audiocodec_tpu.io import bitstream
    from audiocodec_tpu.io import stream_container as sc

    os.makedirs(VEC_DIR, exist_ok=True)
    # NOTE: vectors 1-5 predate sidecar quantization and were committed
    # from a raw-bf16 encoder; their blocks keep sidecar_grid=0 so a
    # targeted regeneration reproduces the committed semantics, and the
    # committed files double as backward-compat coverage (use --only).
    # Vector 6 carries the default grid.
    codec = Codec.create(SR, filters_n=N, bark_bands_n=BARK,
                         sidecar_grid=0)
    codec_g = Codec.create(SR, filters_n=N, bark_bands_n=BARK)
    meta_kw = dict(
        sample_rate=SR, filters_n=N, bark_bands_n=BARK,
        alpha=codec.psycho.alpha, window_type="vorbis",
    )
    manifest_path = os.path.join(VEC_DIR, "manifest.json")
    manifest = {}
    if only and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    def record(name, container_bytes, wave, codes):
        if only and name not in only:
            return
        path = os.path.join(VEC_DIR, name)
        with open(path, "wb") as f:
            f.write(container_bytes)
        pcm = np.clip(np.asarray(wave, np.float64), -1, 1)
        pcm16 = np.round(pcm * 32767.0).astype(np.int16)
        np.save(os.path.join(VEC_DIR, name + ".pcm.npy"), pcm16)
        import hashlib

        manifest[name] = {
            "codes_sha256": hashlib.sha256(
                np.ascontiguousarray(codes, np.int32).tobytes()
            ).hexdigest(),
            "pcm_shape": list(pcm16.shape),
        }

    x1 = jnp.asarray(_signal()[None])
    frames = codec.mdct.transform(x1)

    # 1. plain VBR
    enc = codec.encode_frames(frames)
    blob = bitstream.pack(np.asarray(enc.codes), np.asarray(enc.bark16),
                          **meta_kw)
    out = codec.decode_bitstream(enc.codes, enc.bark16)[0, N:-N]
    record("plain.acz", blob, out, np.asarray(enc.codes))

    # 2. the full coded ladder: dz + tns + nf + tmask + bs + nsamp
    from audiocodec_tpu import quantize as q

    enc = codec.encode_frames(
        frames, deadzone=1.0, tns=True, nf=True, tmask=130.0, bs=True,
    )
    blob = bitstream.pack(
        np.asarray(enc.codes), np.asarray(enc.bark16),
        dz_recon=q.dz_recon_offset(1.0),
        tns_idx=np.asarray(enc.tns_idx),
        tns_band_start=codec.tns_band_start,
        nf_levels=np.asarray(enc.nf_levels),
        nf_band_start=codec.nf_band_start, nf_seed=7,
        bs_flags=np.asarray(enc.bs_flags),
        orig_samples=12 * N - 5,
        **meta_kw,
    )
    out = codec.decode_bitstream(
        enc.codes, enc.bark16, dz_recon=q.dz_recon_offset(1.0),
        tns_idx=enc.tns_idx, nf_levels=enc.nf_levels, nf_seed=7,
        bs_flags=enc.bs_flags,
    )[0, N:-N][: 12 * N - 5]
    record("ladder.acz", blob, out, np.asarray(enc.codes))

    # 3. joint stereo with rate scale
    x2 = jnp.asarray(_signal(channels=2)[None])
    f2 = codec.mdct.transform(x2)
    codes, bark = codec.quantize_frames(f2, threshold_scale=4.0, ms=True)
    blob = bitstream.pack(
        np.asarray(codes), np.asarray(bark), ms=True,
        threshold_scale=4.0, **meta_kw,
    )
    out = codec.decode_bitstream_ms(codes, bark, threshold_scale=4.0)[
        0, N:-N
    ]
    record("stereo_ms.acz", blob, out, np.asarray(codes))

    # 4. CBR seekable stream with per-chunk scales + bs + nsamp.
    # Encode to a TEMP path: writing straight into VEC_DIR would
    # overwrite the committed old-writer bytes even under --only
    # (record() is the single gatekeeper for what lands in VEC_DIR).
    import tempfile

    with tempfile.TemporaryDirectory() as tdir:
        path = os.path.join(tdir, "cbr_stream.acs")
        x3 = _signal(blocks=16)[None]
        sc.encode_stream(
            codec, jnp.asarray(x3), path, chunk_blocks=4,
            threshold_scale=[1.0, 4.0, 2.0, 8.0], bs=True,
            orig_samples=16 * N - 9,
        )
        dec = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )[0][: 16 * N - 9]
        with sc.StreamReader(path) as r:
            all_codes = np.concatenate(
                [r.read_chunk(i).codes for i in range(r.n_chunks)],
                axis=0,
            )
        record("cbr_stream.acs", open(path, "rb").read(), dec,
               all_codes)

    # 5. bandwidth extension (+ the noise fill it caps at the crossover)
    enc = codec.encode_frames(frames, threshold_scale=4.0, nf=True,
                              bwe=True)
    blob = bitstream.pack(
        np.asarray(enc.codes), np.asarray(enc.bark16),
        threshold_scale=4.0,
        nf_levels=np.asarray(enc.nf_levels),
        nf_band_start=codec.nf_band_start, nf_seed=5,
        bwe_gains=np.asarray(enc.bwe_gains),
        bwe_start=codec.bwe_start,
        **meta_kw,
    )
    out = codec.decode_bitstream(
        enc.codes, enc.bark16, threshold_scale=4.0,
        nf_levels=enc.nf_levels, nf_seed=5,
        bwe_gains=enc.bwe_gains,
    )[0, N:-N]
    record("bwe.acz", blob, out, np.asarray(enc.codes))

    # 6. grid-quantized sidecar (scq.py; the default encoder config)
    enc = codec_g.encode_frames(codec_g.mdct.transform(x1),
                                threshold_scale=4.0)
    blob = bitstream.pack(
        np.asarray(enc.codes), np.asarray(enc.bark16),
        threshold_scale=4.0, sidecar_grid=codec_g.sidecar_grid,
        **meta_kw,
    )
    out = codec_g.decode_bitstream(enc.codes, enc.bark16,
                                   threshold_scale=4.0)[0, N:-N]
    record("scq.acz", blob, out, np.asarray(enc.codes))

    # 7. intensity stereo (pan-coded side band) on the default-grid codec
    x2 = jnp.asarray(_signal(channels=2)[None])
    enc = codec_g.encode_frames(codec_g.mdct.transform(x2),
                                threshold_scale=2.0, ms=True,
                                intensity=True)
    blob = bitstream.pack(
        np.asarray(enc.codes), np.asarray(enc.bark16), ms=True,
        threshold_scale=2.0, sidecar_grid=codec_g.sidecar_grid,
        is_gains=np.asarray(enc.is_gains), is_start=codec_g.is_start,
        **meta_kw,
    )
    out = codec_g.decode_bitstream_ms(
        enc.codes, enc.bark16, threshold_scale=2.0,
        is_gains=enc.is_gains,
    )[0, N:-N]
    record("intensity.acz", blob, out, np.asarray(enc.codes))

    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {len(only) if only else len(manifest)} vectors -> "
          f"{VEC_DIR}")


if __name__ == "__main__":
    args = sys.argv[1:]
    names = None
    if args and args[0] == "--only":
        names = set(args[1:])
        if not names:
            sys.exit("--only requires at least one vector name")
    elif args:
        sys.exit(f"unknown arguments: {args}")
    main(only=names)
