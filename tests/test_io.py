"""WAV I/O round-trip tests."""

import numpy as np
import pytest

from audiocodec_tpu.io import read_wav, write_wav


class TestWavRoundTrip:
    @pytest.mark.parametrize("width", [2, 4])
    @pytest.mark.parametrize("channels", [1, 2])
    def test_write_read(self, tmp_path, width, channels):
        rng = np.random.default_rng(0)
        x = rng.uniform(-0.9, 0.9, size=(4096, channels)).astype(np.float32)
        path = str(tmp_path / "t.wav")
        write_wav(path, x, 16000, width=width)
        y, rate = read_wav(path)
        assert rate == 16000
        assert y.shape == (1, 4096, channels)
        # write scales by 2^15-1, read by 2^15 (standard asymmetric PCM
        # convention): worst case ~1.5 LSB
        tol = 2.0 / 32768 if width == 2 else 1e-6
        np.testing.assert_allclose(y[0], x, atol=tol)

    def test_batched_clip_accepted(self, tmp_path):
        x = np.zeros((1, 100, 1), dtype=np.float32)
        path = str(tmp_path / "b.wav")
        write_wav(path, x, 8000)
        y, _ = read_wav(path)
        assert y.shape == (1, 100, 1)

    def test_multi_batch_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="single clip"):
            write_wav(
                str(tmp_path / "x.wav"),
                np.zeros((2, 10, 1), dtype=np.float32),
                8000,
            )

    def test_clipping(self, tmp_path):
        x = np.asarray([[2.0], [-2.0], [0.5]], dtype=np.float32)
        path = str(tmp_path / "c.wav")
        write_wav(path, x, 8000)
        y, _ = read_wav(path)
        assert float(y.max()) <= 1.0
        assert float(y.min()) >= -1.0


class TestFloat32Wav:
    def test_read_float32_wav(self, tmp_path):
        """IEEE-float WAVs (format 3) must read in the pure-Python path —
        stdlib wave rejects them, hence the hand-rolled RIFF parser."""
        import struct

        rng = np.random.default_rng(9)
        x = rng.uniform(-0.9, 0.9, size=(500, 2)).astype(np.float32)
        pcm = x.astype("<f4").tobytes()
        path = str(tmp_path / "f32.wav")
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
        hdr += struct.pack("<IHHIIHH", 16, 3, 2, 48000, 48000 * 8, 8, 32)
        hdr += b"data" + struct.pack("<I", len(pcm))
        with open(path, "wb") as f:
            f.write(hdr + pcm)
        data, rate = read_wav(path)
        assert rate == 48000
        np.testing.assert_allclose(data[0], x, atol=1e-7)

    def test_unsupported_format_raises(self, tmp_path):
        import struct

        path = str(tmp_path / "alaw.wav")
        hdr = b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        hdr += struct.pack("<IHHIIHH", 16, 6, 1, 8000, 8000, 1, 8)  # A-law
        hdr += b"data" + struct.pack("<I", 0)
        with open(path, "wb") as f:
            f.write(hdr)
        with pytest.raises(ValueError, match="unsupported encoding"):
            read_wav(path)

    def test_garbage_raises(self, tmp_path):
        path = str(tmp_path / "junk.wav")
        with open(path, "wb") as f:
            f.write(b"garbage" * 10)
        with pytest.raises(ValueError, match="RIFF"):
            read_wav(path)
