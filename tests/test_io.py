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
