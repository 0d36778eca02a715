"""WAV read/write in the framework's tensor convention.

The reference has no audio I/O at all — its tests synthesize sines
in-memory (SURVEY.md §2.2). This gives the framework a real ingress/egress:
stdlib ``wave`` + numpy, supporting 16/24/32-bit integer PCM and 32-bit
float, mapped to the [-1, 1] [batches, samples, channels] convention.
"""

from __future__ import annotations

import wave

import numpy as np


def read_wav(path: str, dtype=np.float32):
    """Read a WAV file.

    :return: (data [1, samples, channels] in [-1, 1], sample_rate).
    """
    with wave.open(path, "rb") as f:
        channels = f.getnchannels()
        width = f.getsampwidth()
        rate = f.getframerate()
        frames = f.readframes(f.getnframes())

    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    elif width == 3:
        raw = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        as32 = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        as32 = np.where(as32 >= 1 << 23, as32 - (1 << 24), as32)
        x = as32.astype(np.float64) / float(1 << 23)
    else:
        raise ValueError(f"unsupported sample width: {width} bytes")

    x = x.reshape(-1, channels)
    return x[None, :, :].astype(dtype), rate


def write_wav(path: str, data, sample_rate: int, width: int = 2) -> None:
    """Write [samples, channels] or [1, samples, channels] in [-1, 1]."""
    x = np.asarray(data, dtype=np.float64)
    if x.ndim == 3:
        if x.shape[0] != 1:
            raise ValueError(
                f"write_wav takes a single clip; got batch {x.shape[0]}"
            )
        x = x[0]
    if x.ndim == 1:
        x = x[:, None]
    x = np.clip(x, -1.0, 1.0)

    if width == 2:
        pcm = (x * 32767.0).round().astype("<i2").tobytes()
    elif width == 4:
        pcm = (x * 2147483647.0).round().astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported sample width: {width} bytes")

    with wave.open(path, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(width)
        f.setframerate(sample_rate)
        f.writeframes(pcm)
