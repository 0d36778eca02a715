"""Audio I/O: wav read/write and corpus loading."""

from audiocodec_tpu.io.wav import read_wav, write_wav

__all__ = ["read_wav", "write_wav"]
