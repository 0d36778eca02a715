"""Seekable stream container (.acs) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu import native
from audiocodec_tpu.codec import Codec
from audiocodec_tpu.io import stream_container as sc

pytestmark = pytest.mark.skipif(
    not native.available(), reason="stream container needs the Rice coder"
)


@pytest.fixture(scope="module")
def codec():
    return Codec.create(16000, filters_n=64, bark_bands_n=16)


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    t = np.arange(24 * 64) / 16000
    wave = (
        0.5 * np.sin(2 * np.pi * 500 * t)
        + 0.1 * rng.normal(size=t.size)
    ).astype(np.float32)
    return jnp.asarray(np.clip(wave, -1, 1)[None, :, None])


class TestContainerRoundTrip:
    def test_write_read_chunks(self, codec, signal, tmp_path):
        path = str(tmp_path / "s.acs")
        n_chunks = sc.encode_stream(codec, signal, path, chunk_blocks=8)
        assert n_chunks == 4  # 3 body chunks + flush frame
        with sc.StreamReader(path) as r:
            assert r.n_chunks == 4
            assert r.meta["filters_n"] == 64
            codes, bark = r.read_chunk(0)
            assert codes.shape == (8, 64, 1)
            assert bark.shape == (8, 16, 1)
            # flush chunk is a single frame
            codes_last, _ = r.read_chunk(3)
            assert codes_last.shape == (1, 64, 1)

    def test_full_decode_matches_monolithic(self, codec, signal, tmp_path):
        """Streaming encode+decode == the monolithic bitstream round trip."""
        path = str(tmp_path / "m.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8)
        chunks = list(sc.decode_stream(codec, path))
        streamed = np.concatenate([np.asarray(c) for c in chunks], axis=1)

        codes, bark16 = codec.encode_bitstream(signal)
        mono = np.asarray(codec.decode_bitstream(codes, bark16))
        np.testing.assert_allclose(streamed, mono, atol=1e-5)

    def test_seek_mid_stream(self, codec, signal, tmp_path):
        """Decoding from chunk k matches the same samples of a full decode
        (one-frame context re-priming works)."""
        path = str(tmp_path / "k.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8)
        full = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)], axis=1
        )
        partial = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path, start_chunk=2)],
            axis=1,
        )
        # chunk 0,1 cover 16 blocks = 16*64 samples of output
        np.testing.assert_allclose(
            partial, full[:, 16 * 64 :], atol=1e-6
        )

    def test_bad_magic_raises(self, tmp_path):
        path = str(tmp_path / "x.acs")
        with open(path, "wb") as f:
            f.write(b"nope" * 10)
        with pytest.raises(ValueError, match="magic"):
            sc.StreamReader(path)

    def test_chunk_index_bounds(self, codec, signal, tmp_path):
        path = str(tmp_path / "b.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8)
        with sc.StreamReader(path) as r:
            with pytest.raises(IndexError):
                r.read_chunk(99)

    def test_corruption_detected(self, codec, signal, tmp_path):
        path = str(tmp_path / "c.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8)
        with sc.StreamReader(path) as r:
            off = r._index[1]
        with open(path, "r+b") as f:
            f.seek(off + 12)
            f.write(b"\xff\xff")  # flip payload bytes
        with sc.StreamReader(path) as r:
            r.read_chunk(0)  # untouched chunk still reads
            with pytest.raises(ValueError, match="CRC"):
                r.read_chunk(1)

    def test_corrupt_trailer_rejected(self, codec, signal, tmp_path):
        """Implausible trailer fields must be a clean ValueError, not a
        multi-terabyte allocation or struct crash."""
        path = str(tmp_path / "t.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8)
        blob = bytearray(open(path, "rb").read())
        import struct as _struct

        blob[-16:] = _struct.pack("<QQ", 2**40, 12)  # absurd n_chunks
        evil = str(tmp_path / "evil.acs")
        open(evil, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="corrupt|bounds"):
            sc.StreamReader(evil)

    def test_truncated_file_rejected(self, codec, signal, tmp_path):
        path = str(tmp_path / "tr.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8)
        blob = open(path, "rb").read()
        cut = str(tmp_path / "cut.acs")
        open(cut, "wb").write(blob[: len(blob) // 2])
        with pytest.raises(ValueError, match="corrupt|bounds|truncated"):
            r = sc.StreamReader(cut)
            for i in range(r.n_chunks):
                r.read_chunk(i)

    def test_drown_plumbed_through_stream(self, codec, signal, tmp_path):
        """encode_stream(drown=1.0) must produce coarser codes than 0.0."""
        a = str(tmp_path / "d0.acs")
        b = str(tmp_path / "d1.acs")
        sc.encode_stream(codec, signal, a, chunk_blocks=8, drown=0.0)
        sc.encode_stream(codec, signal, b, chunk_blocks=8, drown=1.0)
        import os as _os

        assert _os.path.getsize(b) < _os.path.getsize(a)
