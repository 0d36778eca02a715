"""Native C++ WAV loader tests (auto-built with g++; skip if unavailable)."""

import numpy as np
import pytest

from audiocodec_tpu import native
from audiocodec_tpu.io.wav import write_wav as py_write_wav

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.build_error()}",
)


def _make_wav(tmp_path, name, frames=4096, channels=1, rate=16000, width=2,
              seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.9, 0.9, size=(frames, channels)).astype(np.float32)
    path = str(tmp_path / name)
    py_write_wav(path, x, rate, width=width)
    return path, x


class TestDecode:
    @pytest.mark.parametrize("width", [2, 4])
    @pytest.mark.parametrize("channels", [1, 2])
    def test_matches_python_reader(self, tmp_path, width, channels):
        path, x = _make_wav(
            tmp_path, "a.wav", channels=channels, width=width, seed=width
        )
        data, rate = native.decode_wav(path)
        assert rate == 16000
        assert data.shape == (1, 4096, channels)
        tol = 2.0 / 32768 if width == 2 else 2e-9
        np.testing.assert_allclose(data[0], x, atol=tol)

    def test_native_write_read(self, tmp_path):
        rng = np.random.default_rng(3)
        x = rng.uniform(-0.9, 0.9, size=(1000, 2)).astype(np.float32)
        path = str(tmp_path / "w.wav")
        native.write_wav(path, x, 48000, width=4)
        data, rate = native.decode_wav(path)
        assert rate == 48000
        np.testing.assert_allclose(data[0], x, atol=2e-9)

    def test_bad_file_raises(self, tmp_path):
        path = str(tmp_path / "junk.wav")
        with open(path, "wb") as f:
            f.write(b"not a wav at all" * 10)
        with pytest.raises(ValueError, match="RIFF"):
            native.decode_wav(path)


class TestCorpusLoader:
    def test_bulk_load(self, tmp_path):
        paths, clips = [], []
        for i in range(16):
            p, x = _make_wav(tmp_path, f"c{i}.wav", frames=3000, seed=i)
            paths.append(p)
            clips.append(x)
        out, status = native.load_corpus(
            paths, clip_seconds=0.25, sample_rate=16000, channels=1
        )
        assert out.shape == (16, 4000, 1)
        assert (status == 0).all()
        for i in range(16):
            # first 3000 frames match, rest zero-padded
            np.testing.assert_allclose(
                out[i, :3000], clips[i], atol=2.0 / 32768
            )
            assert (out[i, 3000:] == 0).all()

    def test_truncation(self, tmp_path):
        p, x = _make_wav(tmp_path, "long.wav", frames=8000, seed=42)
        out, status = native.load_corpus(
            [p], clip_seconds=0.25, sample_rate=16000, channels=1
        )
        assert status[0] == 0
        np.testing.assert_allclose(out[0], x[:4000], atol=2.0 / 32768)

    def test_channel_mismatch_reported(self, tmp_path):
        p, _ = _make_wav(tmp_path, "stereo.wav", channels=2)
        out, status = native.load_corpus(
            [p], clip_seconds=0.1, sample_rate=16000, channels=1
        )
        assert status[0] == -5
        assert (out[0] == 0).all()

    def test_missing_file_reported(self, tmp_path):
        out, status = native.load_corpus(
            [str(tmp_path / "nope.wav")],
            clip_seconds=0.1,
            sample_rate=16000,
            channels=1,
        )
        assert status[0] == -1

    def test_int16_wire_load_bit_exact_for_pcm16(self, tmp_path):
        """dtype='int16' decodes PCM16 sources to the exact stored
        integers (memcpy path — no float round trip), identical to
        re-quantizing the float path onto the wire."""
        paths = []
        for i in range(4):
            p, _ = _make_wav(tmp_path, f"w{i}.wav", frames=3000, seed=100 + i)
            paths.append(p)
        f32, st_f = native.load_corpus(
            paths, clip_seconds=0.25, sample_rate=16000, channels=1
        )
        i16, st_i = native.load_corpus(
            paths, clip_seconds=0.25, sample_rate=16000, channels=1,
            dtype="int16",
        )
        assert i16.dtype == np.int16 and (st_i == 0).all()
        want = np.clip(np.rint(f32 * 32768.0), -32768, 32767).astype(np.int16)
        np.testing.assert_array_equal(i16, want)

    def test_int16_wire_bad_dtype_rejected(self):
        with pytest.raises(ValueError, match="dtype"):
            native.load_corpus(
                [], clip_seconds=0.1, sample_rate=16000, dtype="int8"
            )

    def test_int16_wire_half_even_parity_for_float_wav(self, tmp_path):
        """Float-format WAVs must produce the SAME int16 wire through the
        native direct decode as through the float path re-quantized with
        np.rint (half-to-even) — including exact half-LSB samples, so the
        same corpus encodes identically with or without the C++ lib."""
        import struct

        # includes exact halves 0.5/32768-style values and specials
        vals = np.asarray(
            [0.5 / 32768, 1.5 / 32768, -0.5 / 32768, -1.5 / 32768,
             2.5 / 32768, 0.25, -0.75, 1.5, -2.0, 0.0],
            np.float32,
        )
        frames = vals.size
        data = vals.tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
            + b"data" + struct.pack("<I", len(data))
        )
        p = str(tmp_path / "f32.wav")
        with open(p, "wb") as f:
            f.write(hdr + data)

        f32, _ = native.load_corpus(
            [p], clip_seconds=frames / 16000, sample_rate=16000
        )
        i16, _ = native.load_corpus(
            [p], clip_seconds=frames / 16000, sample_rate=16000,
            dtype="int16",
        )
        want = np.clip(np.rint(f32 * 32768.0), -32768, 32767).astype(
            np.int16
        )
        np.testing.assert_array_equal(i16, want)


class TestRiceCoding:
    def test_roundtrip_geometric(self):
        rng = np.random.default_rng(0)
        # zero-heavy geometric-ish codes like the quantizer produces
        codes = (rng.geometric(0.4, size=20000) - 1) * rng.choice(
            [-1, 1], size=20000
        )
        codes = codes.astype(np.int32)
        data = native.rice_encode(codes)
        got = native.rice_decode(data, codes.size)
        np.testing.assert_array_equal(got, codes)
        # must beat 16-bit storage comfortably on this distribution
        assert len(data) < codes.size * 2 * 0.5

    def test_roundtrip_extremes(self):
        codes = np.asarray(
            [0, 1, -1, 2**30, -(2**30), 47, -48, 2**31 - 1, -(2**31)],
            dtype=np.int32,
        )
        data = native.rice_encode(codes)
        got = native.rice_decode(data, codes.size)
        np.testing.assert_array_equal(got, codes)

    def test_python_fallback_decoder_matches(self):
        rng = np.random.default_rng(1)
        codes = (rng.geometric(0.5, size=700) - 1).astype(np.int32)
        codes[::7] *= -1
        codes[13] = 123456789  # force an escape
        data = native.rice_encode(codes)
        buf = np.frombuffer(data, dtype=np.uint8)
        got = native._rice_decode_py(buf, codes.size, native.RICE_GROUP)
        np.testing.assert_array_equal(got, codes)

    def test_python_fallback_multi_window(self):
        """A stream spanning several of the fallback decoder's 512 KB bit
        windows, with k-parameter churn and escapes crossing window
        boundaries, must decode exactly (the windowed tables slide)."""
        rng = np.random.default_rng(3)
        parts = []
        # alternate dense/sparse sections so per-group k varies a lot
        for i in range(8):
            if i % 2:
                parts.append(
                    rng.integers(-(1 << 20), 1 << 20, 300_000).astype(
                        np.int32
                    )
                )
            else:
                parts.append(
                    (rng.geometric(0.6, 300_000) - 1).astype(np.int32)
                )
        codes = np.concatenate(parts)
        codes[::100_003] = 2**30  # sprinkle escapes everywhere
        data = native.rice_encode(codes)
        assert len(data) > 3 * (1 << 19)  # really spans >3 windows
        buf = np.frombuffer(data, dtype=np.uint8)
        got = native._rice_decode_py(buf, codes.size, native.RICE_GROUP)
        np.testing.assert_array_equal(got, codes)

    def test_all_zeros_compresses_hard(self):
        codes = np.zeros(10000, dtype=np.int32)
        data = native.rice_encode(codes)
        assert len(data) < 10000 // 8 + 64  # ~1 bit per value

    def test_corrupt_stream_raises(self):
        codes = np.arange(-50, 50, dtype=np.int32)
        data = bytearray(native.rice_encode(codes))
        with pytest.raises(ValueError, match="corrupt"):
            native.rice_decode(bytes(data[: len(data) // 4]), codes.size)


class TestRunLengthRice:
    def _roundtrip(self, codes):
        data = native.rrice_encode(codes)
        got = native.rrice_decode(data, codes.size)
        np.testing.assert_array_equal(got, codes)
        # pure-Python fallback must agree bit-for-bit
        got_py = native._rrice_decode_py(
            np.frombuffer(data, np.uint8), codes.size, native.RICE_GROUP
        )
        np.testing.assert_array_equal(got_py, codes)
        return data

    def test_roundtrip_distributions(self):
        rng = np.random.default_rng(0)
        for codes in (
            np.where(
                rng.random(20000) < 0.01,
                rng.integers(-2000, 2000, 20000), 0,
            ).astype(np.int32),
            rng.integers(-200, 200, 20000).astype(np.int32),
            np.zeros(20000, np.int32),
            (rng.geometric(0.4, 20000) - 1).astype(np.int32)
            * rng.choice([-1, 1], 20000).astype(np.int32),
        ):
            self._roundtrip(codes)

    def test_roundtrip_extremes(self):
        self._roundtrip(np.asarray(
            [0, 1, -1, 2**30, -(2**30), 47, -48, 2**31 - 1, -(2**31), 0, 0],
            dtype=np.int32,
        ))

    def test_group_boundary_alternation(self):
        """Runs and values straddling group boundaries: nonzero at the
        last slot of a group, runs covering exactly a group, etc."""
        g = native.RICE_GROUP
        codes = np.zeros(3 * g + 7, np.int32)
        codes[g - 1] = 5       # nonzero at a group's last slot
        codes[g] = -3          # and at the next group's first
        codes[2 * g - 1] = 1
        self._roundtrip(codes)

    def test_sparse_much_smaller_than_rice(self):
        rng = np.random.default_rng(1)
        codes = np.where(
            rng.random(100000) < 0.01,
            rng.integers(-50, 50, 100000), 0,
        ).astype(np.int32)
        assert len(native.rrice_encode(codes)) * 4 < len(
            native.rice_encode(codes)
        )

    def test_dense_never_meaningfully_larger(self):
        """Per-group plain fallback: on dense data rrice pays only the
        one mode bit per group over rice."""
        rng = np.random.default_rng(2)
        codes = rng.integers(-200, 200, 100000).astype(np.int32)
        r = len(native.rice_encode(codes))
        rr = len(native.rrice_encode(codes))
        assert rr <= r + (codes.size // native.RICE_GROUP) // 8 + 16

    def test_corrupt_stream_raises(self):
        codes = np.where(
            np.arange(5000) % 100 == 0, np.arange(5000), 0
        ).astype(np.int32)
        data = native.rrice_encode(codes)
        with pytest.raises(ValueError, match="corrupt"):
            native.rrice_decode(data[: len(data) // 4], codes.size)
        with pytest.raises(ValueError, match="corrupt"):
            native._rrice_decode_py(
                np.frombuffer(data[: len(data) // 4], np.uint8),
                codes.size, native.RICE_GROUP,
            )

    def test_bit_flip_fuzz_never_crashes(self):
        """Flipped bits either decode to SOME array or raise ValueError —
        never crash, hang, or over-allocate."""
        rng = np.random.default_rng(3)
        codes = np.where(
            rng.random(4096) < 0.05, rng.integers(-99, 99, 4096), 0
        ).astype(np.int32)
        data = bytearray(native.rrice_encode(codes))
        for trial in range(200):
            flip = rng.integers(0, len(data))
            mut = bytearray(data)
            mut[flip] ^= 1 << int(rng.integers(0, 8))
            try:
                native.rrice_decode(bytes(mut), codes.size)
            except ValueError:
                pass


class TestWriteClipping:
    def test_full_scale_positive_not_wrapped(self, tmp_path):
        """Full-scale +1.0 must not wrap to INT32_MIN (float32 cannot
        represent 2^31-1; scaling must happen in double)."""
        path = str(tmp_path / "fs.wav")
        x = np.asarray([[1.0], [0.5], [-1.0], [2.0]], dtype=np.float32)
        native.write_wav(path, x, 16000, width=4)
        data, _ = native.decode_wav(path)
        got = data[0, :, 0]
        assert got[0] > 0.999  # NOT -1.0
        assert abs(got[1] - 0.5) < 1e-6
        assert got[2] < -0.999
        assert got[3] > 0.999  # clamped, not wrapped


class TestParserFuzz:
    def test_random_garbage_never_crashes(self, tmp_path):
        """The native RIFF parser must reject arbitrary bytes with an error
        code, never crash or hang (it backs a network-facing CLI)."""
        rng = np.random.default_rng(0)
        for i in range(50):
            path = str(tmp_path / f"fuzz{i}.bin")
            size = int(rng.integers(0, 2000))
            blob = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            if i % 3 == 0:  # bias toward almost-valid headers
                blob = b"RIFF" + blob
            if i % 5 == 0:
                blob = b"RIFF\xff\xff\xff\xffWAVE" + blob
            with open(path, "wb") as f:
                f.write(blob)
            try:
                native.decode_wav(path)
            except ValueError:
                pass  # expected for malformed input

    def test_truncated_real_wav(self, tmp_path):
        from audiocodec_tpu.io.wav import write_wav

        rng = np.random.default_rng(1)
        x = rng.uniform(-0.5, 0.5, size=(1000, 1)).astype(np.float32)
        full = str(tmp_path / "full.wav")
        write_wav(full, x, 16000)
        blob = open(full, "rb").read()
        for frac in (0.3, 0.6, 0.95):
            cut = str(tmp_path / f"cut{frac}.wav")
            with open(cut, "wb") as f:
                f.write(blob[: int(len(blob) * frac)])
            try:
                data, _ = native.decode_wav(cut)
                assert data.shape[1] <= 1000  # partial decode is fine
            except ValueError:
                pass


class TestEntropyFormatCompat:
    def test_old_rice_acz_still_decodes(self, tmp_path):
        """A container in the pre-rrice layout (members 'rice' +
        'bark_rice') must keep decoding — files already on disk."""
        import io as _io

        import ml_dtypes

        from audiocodec_tpu.io import bitstream

        rng = np.random.default_rng(0)
        codes = np.where(
            rng.random((1, 9, 64, 1)) < 0.2,
            rng.integers(-40, 40, (1, 9, 64, 1)), 0,
        ).astype(np.int32)
        bark = (
            rng.uniform(0.1, 2.0, (1, 9, 16, 1)).astype(ml_dtypes.bfloat16)
        )
        bark_i32 = bark.view(np.uint16).astype(np.int32)
        deltas = np.diff(bark_i32, axis=1, prepend=0)
        buf = _io.BytesIO()
        np.savez_compressed(
            buf,
            meta=np.asarray([16000, 64, 16, 1], dtype=np.int64),
            alphaw=np.asarray([0.6]),
            window=np.asarray(["vorbis"]),
            dtype=np.asarray(["float32"]),
            ms=np.asarray([0], dtype=np.int64),
            tscale=np.asarray([1.0]),
            barkprec=np.asarray(["highest"]),
            rice=np.frombuffer(native.rice_encode(codes), dtype=np.uint8),
            shape=np.asarray(codes.shape, dtype=np.int64),
            bark_rice=np.frombuffer(
                native.rice_encode(deltas), dtype=np.uint8
            ),
            bark_shape=np.asarray(bark.shape, dtype=np.int64),
        )
        c2, b2, meta = bitstream.unpack(buf.getvalue())
        np.testing.assert_array_equal(c2, codes)
        np.testing.assert_array_equal(
            np.asarray(b2).view(np.uint16), bark.view(np.uint16)
        )
        assert meta["sample_rate"] == 16000

    def test_old_acs_without_coder_field_decodes(self, tmp_path):
        """.acs streams written before the coder field default to plain
        rice on read."""
        import json
        import struct

        import jax
        import jax.numpy as jnp

        from audiocodec_tpu.codec import Codec
        from audiocodec_tpu.io import bitstream as _bs
        from audiocodec_tpu.io import stream_container as sc

        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        t = np.arange(16 * 64) / 16000
        x = jnp.asarray(
            (0.5 * np.sin(2 * np.pi * 700 * t)).astype(np.float32)[
                None, :, None
            ]
        )
        codes, bark = codec.encode_bitstream(x)
        # hand-write an old-format stream: no coder field, rice payloads
        path = str(tmp_path / "old.acs")
        meta = {
            "sample_rate": 16000, "filters_n": 64, "bark_bands_n": 16,
            "alpha": 0.6, "window_type": "vorbis", "channels": 1,
            "compute_dtype": "float32", "ms": False,
            "threshold_scale": 1.0, "bark_precision": "highest",
        }
        with open(path, "wb") as f:
            header = json.dumps(meta).encode()
            f.write(b"ACS1" + struct.pack("<I", len(header)) + header)
            import zlib as _zlib

            c = np.asarray(codes)[0]
            code_bytes = native.rice_encode(c.astype(np.int32))
            bark_bytes = _bs.encode_bark_sidecar(
                np.asarray(bark)[0], block_axis=0, coder="rice"
            )
            crc = _zlib.crc32(bark_bytes, _zlib.crc32(code_bytes))
            off = f.tell()
            f.write(struct.pack("<II", c.shape[0], len(code_bytes)))
            f.write(code_bytes)
            f.write(struct.pack("<I", len(bark_bytes)))
            f.write(bark_bytes)
            f.write(struct.pack("<I", crc))
            index_off = f.tell()
            f.write(struct.pack("<Q", off))
            f.write(struct.pack("<QQ", 1, index_off))
        with sc.StreamReader(path) as r:
            chunk = r.read_chunk(0)
            got_codes, got_bark = chunk.codes, chunk.bark
        np.testing.assert_array_equal(got_codes, np.asarray(codes)[0])
        np.testing.assert_array_equal(
            np.asarray(got_bark).view(np.uint16),
            np.asarray(bark)[0].view(np.uint16),
        )

    def test_unknown_coder_rejected(self, tmp_path):
        import json
        import struct

        path = str(tmp_path / "future.acs")
        meta = {
            "sample_rate": 16000, "filters_n": 64, "bark_bands_n": 16,
            "alpha": 0.6, "window_type": "vorbis", "channels": 1,
            "compute_dtype": "float32", "coder": "quantum",
        }
        from audiocodec_tpu.io import stream_container as sc

        with open(path, "wb") as f:
            header = json.dumps(meta).encode()
            f.write(b"ACS1" + struct.pack("<I", len(header)) + header)
            off = f.tell()
            f.write(struct.pack("<II", 1, 4) + b"\x00" * 4)
            f.write(struct.pack("<I", 4) + b"\x00" * 4)
            import zlib as _zlib

            f.write(struct.pack("<I", _zlib.crc32(b"\x00" * 8)))
            f.write(struct.pack("<Q", off))
            f.write(struct.pack("<QQ", 1, off))

        with pytest.raises(ValueError):
            with sc.StreamReader(path) as r:
                r.read_chunk(0)
