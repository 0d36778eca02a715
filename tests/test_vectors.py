"""Conformance vectors: committed golden containers (tests/vectors/)
frozen by tests/make_vectors.py. These protect the WIRE FORMAT across
refactors and rounds:

* the committed bytes must keep parsing,
* the recovered integer codes must match the recorded hash bit-exactly
  (container parsing + entropy decoding are deterministic), and
* the decoded waveform must stay within +-4 of the recorded 16-bit PCM
  (float synthesis may drift by ulps across XLA versions/backends; the
  bit contract is the step-size derivation, whose breakage would move
  the output by far more than a few LSBs).

If a test here fails after an INTENTIONAL format change, regenerate
with `python tests/make_vectors.py` and say so in the commit message;
if you didn't intend a format change, you broke decode compatibility.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from audiocodec_tpu.codec import Codec
from audiocodec_tpu.io import bitstream
from audiocodec_tpu.io import stream_container as sc

VEC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "vectors")
SR, N, BARK = 16000, 64, 16


@pytest.fixture(scope="module")
def manifest():
    with open(os.path.join(VEC_DIR, "manifest.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def codec():
    return Codec.create(SR, filters_n=N, bark_bands_n=BARK)


def _check(name, codes, wave, manifest):
    want = manifest[name]
    got_hash = hashlib.sha256(
        np.ascontiguousarray(codes, np.int32).tobytes()
    ).hexdigest()
    assert got_hash == want["codes_sha256"], (
        f"{name}: recovered codes changed — entropy decoding or "
        "container parsing regressed"
    )
    pcm16 = np.load(os.path.join(VEC_DIR, name + ".pcm.npy"))
    assert list(pcm16.shape) == want["pcm_shape"]
    got = np.round(
        np.clip(np.asarray(wave, np.float64), -1, 1) * 32767.0
    ).astype(np.int64)
    diff = np.abs(got - pcm16.astype(np.int64))
    assert diff.max() <= 4, (
        f"{name}: decoded PCM moved {diff.max()} LSBs from the frozen "
        "vector — step-size derivation or synthesis regressed"
    )


class TestVectors:
    def test_plain(self, codec, manifest):
        import jax.numpy as jnp

        codes, bark, meta = bitstream.load(
            os.path.join(VEC_DIR, "plain.acz")
        )
        out = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, jnp.bfloat16)
        )[0, N:-N]
        _check("plain.acz", codes, out, manifest)

    def test_ladder(self, codec, manifest):
        import jax.numpy as jnp

        codes, bark, meta = bitstream.load(
            os.path.join(VEC_DIR, "ladder.acz")
        )
        assert meta["tns_idx"] is not None
        assert meta["nf_levels"] is not None
        assert meta["bs_flags"] is not None
        assert meta["orig_samples"] == 12 * N - 5
        out = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, jnp.bfloat16),
            dz_recon=meta["dz_recon"],
            tns_idx=jnp.asarray(meta["tns_idx"]),
            tns_band_start=meta["tns_band_start"],
            nf_levels=jnp.asarray(meta["nf_levels"]),
            nf_band_start=meta["nf_band_start"],
            nf_seed=np.uint32(meta["nf_seed"]),
            bs_flags=jnp.asarray(meta["bs_flags"]),
        )[0, N:-N][: meta["orig_samples"]]
        _check("ladder.acz", codes, out, manifest)

    def test_stereo_ms(self, codec, manifest):
        import jax.numpy as jnp

        codes, bark, meta = bitstream.load(
            os.path.join(VEC_DIR, "stereo_ms.acz")
        )
        assert meta["ms"] and meta["threshold_scale"] == 4.0
        out = codec.decode_bitstream_ms(
            jnp.asarray(codes), jnp.asarray(bark, jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
        )[0, N:-N]
        _check("stereo_ms.acz", codes, out, manifest)

    def test_scq(self, codec, manifest):
        import jax.numpy as jnp

        codes, bark, meta = bitstream.load(
            os.path.join(VEC_DIR, "scq.acz")
        )
        assert meta["sidecar_grid"] == 4
        out = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
        )[0, N:-N]
        _check("scq.acz", codes, out, manifest)

    def test_intensity(self, codec, manifest):
        import jax.numpy as jnp

        codes, bark, meta = bitstream.load(
            os.path.join(VEC_DIR, "intensity.acz")
        )
        assert meta["is_gains"] is not None
        assert meta["is_start"] == codec.is_start
        assert (codes[..., codec.is_start:, 1] == 0).all()
        out = codec.decode_bitstream_ms(
            jnp.asarray(codes), jnp.asarray(bark, jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
            is_gains=jnp.asarray(meta["is_gains"]),
            is_start=meta["is_start"],
        )[0, N:-N]
        _check("intensity.acz", codes, out, manifest)

    def test_bwe(self, codec, manifest):
        import jax.numpy as jnp

        codes, bark, meta = bitstream.load(
            os.path.join(VEC_DIR, "bwe.acz")
        )
        assert meta["bwe_gains"] is not None
        assert meta["bwe_start"] == codec.bwe_start
        assert meta["nf_levels"] is not None
        out = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
            nf_levels=jnp.asarray(meta["nf_levels"]),
            nf_band_start=meta["nf_band_start"],
            nf_seed=np.uint32(meta["nf_seed"]),
            bwe_gains=jnp.asarray(meta["bwe_gains"]),
            bwe_start=meta["bwe_start"],
        )[0, N:-N]
        _check("bwe.acz", codes, out, manifest)

    def test_cbr_stream(self, codec, manifest):
        path = os.path.join(VEC_DIR, "cbr_stream.acs")
        with sc.StreamReader(path) as r:
            assert r.meta.get("cbr")
            assert r.meta.get("bs") == {"factor": 8}
            assert r.meta.get("nsamp") == 16 * N - 9
            all_codes = np.concatenate(
                [r.read_chunk(i).codes for i in range(r.n_chunks)],
                axis=0,
            )
        dec = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )[0][: 16 * N - 9]
        _check("cbr_stream.acs", all_codes, dec, manifest)
