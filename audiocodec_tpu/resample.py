"""TPU-native polyphase sample-rate conversion.

The reference assumes its input is already at the model's sample rate (it
has no I/O or rate conversion at all; this framework's CLI refused
mismatched rates up to now). This module closes that gap the TPU way: a
rational-ratio (L/M) windowed-sinc polyphase resampler expressed as ONE
strided convolution that XLA lowers onto the MXU — no per-sample Python,
no dynamic shapes, differentiable end to end.

Design:

* For output rate L/M times the input rate (L, M coprime), the classic
  zero-stuff -> lowpass -> decimate pipeline collapses to
  ``y[bL+i] = sum_u h[iM - uL + c] * x[bM + u]`` — every block of M input
  samples produces L output samples through a single [W_in, L] matrix of
  filter taps (c centers the filter so output n sits at time n*M/L).
* That is exactly a stride-M convolution with L output channels over a
  window of W_in samples: one ``lax.conv_general_dilated`` call, batched
  over batch x channels, which XLA tiles onto the MXU. No gather, no
  scatter, no zero-stuffed intermediate at rate fs*L.
* The prototype lowpass is a Kaiser-windowed sinc designed in numpy
  float64 on the host and downcast once (the framework's constant
  policy); cutoff min(fs_in, fs_out)/2 with unity passband gain L.
* f32 matmuls pin Precision.HIGHEST by default — the MXU's native f32 is
  a single bf16 pass, which would put -40 dB artifacts in the passband
  (same policy as the DCT matmuls, ops/dct.py).

Quality defaults (zeros=16 sinc zero-crossings, Kaiser beta 8.6) give a
~90 dB stopband and <0.01 dB passband ripple — transparent next to the
codec's own quantization noise at any usable bitrate.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from audiocodec_tpu.ops.dct import PRECISIONS
from audiocodec_tpu.utils import dtypes as _dtypes


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["kernel"],
    meta_fields=[
        "sr_in", "sr_out", "up", "down", "pad_left", "window_n",
        "zeros", "beta", "compute_dtype", "precision",
    ],
)
@dataclasses.dataclass(frozen=True)
class Resampler:
    """Polyphase rational resampler as an immutable pytree.

    Build with :meth:`create`; apply with :meth:`resample`.

    :param sr_in: input sample rate in Hz.
    :param sr_out: output sample rate in Hz.
    :param up: interpolation factor L = sr_out / gcd.
    :param down: decimation factor M = sr_in / gcd.
    :param pad_left: zeros prepended so the first window's context exists.
    :param window_n: input window W_in feeding each L-sample output block.
    :param zeros: sinc zero-crossings per side (filter quality).
    :param beta: Kaiser window beta.
    :param kernel: [L, 1, W_in] conv taps in ``compute_dtype``.
    """

    sr_in: int
    sr_out: int
    up: int
    down: int
    pad_left: int
    window_n: int
    zeros: int
    beta: float
    compute_dtype: object
    precision: str
    kernel: jax.Array

    @classmethod
    def create(
        cls,
        sr_in: int,
        sr_out: int,
        *,
        zeros: int = 16,
        beta: float = 8.6,
        compute_dtype=jnp.float32,
        precision: str = "highest",
    ) -> "Resampler":
        if sr_in <= 0 or sr_out <= 0:
            raise ValueError(
                f"sample rates must be positive, got {sr_in} -> {sr_out}"
            )
        if precision not in PRECISIONS:
            raise ValueError(
                f"precision must be one of {sorted(PRECISIONS)}, "
                f"got {precision!r}"
            )
        dtype = _dtypes.canonicalize_compute_dtype(compute_dtype)
        g = math.gcd(sr_in, sr_out)
        up, down = sr_out // g, sr_in // g
        if up == down:
            # identity: resample() short-circuits; keep a 1-tap kernel so
            # the pytree stays well-formed
            kernel = jnp.asarray(np.ones((1, 1, 1)), dtype)
            return cls(
                sr_in=sr_in, sr_out=sr_out, up=1, down=1, pad_left=0,
                window_n=1, zeros=zeros, beta=beta, compute_dtype=dtype,
                precision=precision, kernel=kernel,
            )
        if max(up, down) > 1024:
            raise ValueError(
                f"rate ratio {sr_out}/{sr_in} reduces to {up}/{down}; "
                "phases > 1024 would need an impractically large filter "
                "bank — resample in two stages or pick related rates"
            )

        # Host-side float64 prototype (the framework's constant policy).
        # In the fs_in*L domain: cutoff at min Nyquist, gain L to undo the
        # zero-stuffing loss, Kaiser window for the stopband.
        half = zeros * max(up, down)  # taps per side at the upsampled rate
        t_total = 2 * half + 1
        k = np.arange(t_total, dtype=np.float64)
        cutoff = 1.0 / max(up, down)  # as a fraction of fs_in*L Nyquist
        h = up * cutoff * np.sinc(cutoff * (k - half))
        h = h * np.kaiser(t_total, beta)

        # y[bL+i] = sum_u h[iM - uL + c] x[bM+u], c = half. Global u-range
        # over i in [0, L): u_min = ceil(-c/L), u_max = floor(((L-1)M+c)/L).
        c = half
        u_min = math.ceil(-c / up)
        u_max = math.floor(((up - 1) * down + c) / up)
        window_n = u_max - u_min + 1
        mat = np.zeros((up, window_n), dtype=np.float64)
        u = np.arange(u_min, u_max + 1)
        for i in range(up):
            idx = i * down - u * up + c
            valid = (idx >= 0) & (idx < t_total)
            mat[i, valid] = h[idx[valid]]
        kernel = jnp.asarray(mat[:, None, :], dtype)  # [L, 1, W_in] OIH
        return cls(
            sr_in=sr_in, sr_out=sr_out, up=up, down=down,
            pad_left=-u_min, window_n=window_n, zeros=zeros, beta=beta,
            compute_dtype=dtype, precision=precision, kernel=kernel,
        )

    def out_length(self, samples_n: int) -> int:
        """Output sample count for an input of ``samples_n`` samples."""
        return samples_n * self.up // self.down

    def resample(self, x: jax.Array) -> jax.Array:
        """[B, samples, C] at sr_in -> [B, out_length(samples), C] at
        sr_out. Output sample n sits at input time n*down/up (the filter's
        group delay is compensated), so a resampled pure tone aligns with
        its analytic counterpart.
        """
        if x.ndim != 3:
            raise ValueError(
                f"expected [batch, samples, channels], got shape {x.shape}"
            )
        _dtypes.check_input_dtype(x, self.compute_dtype, "resample input")
        if self.up == self.down:
            return x
        b, s, ch = x.shape
        out_n = self.out_length(s)
        n_blocks = -(-out_n // self.up)  # blocks of L output samples
        # conv input must cover [u_min, (n_blocks-1)*M + u_max]
        need = (n_blocks - 1) * self.down + self.window_n
        pad_right = max(0, need - (s + self.pad_left))
        lhs = jnp.moveaxis(x, -1, 1).reshape(b * ch, 1, s)
        lhs = jnp.pad(lhs, ((0, 0), (0, 0), (self.pad_left, pad_right)))
        y = jax.lax.conv_general_dilated(
            lhs, self.kernel,
            window_strides=(self.down,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=PRECISIONS[self.precision],
        )  # [B*C, L, >=n_blocks]
        y = y[:, :, :n_blocks]
        y = jnp.moveaxis(y, 1, 2).reshape(b * ch, n_blocks * self.up)
        y = y[:, :out_n].reshape(b, ch, out_n)
        return jnp.moveaxis(y, 1, 2).astype(x.dtype)


def resample_waveform(
    x: jax.Array, sr_in: int, sr_out: int, **kwargs
) -> jax.Array:
    """One-shot convenience: build a :class:`Resampler` and apply it."""
    return Resampler.create(sr_in, sr_out, **kwargs).resample(x)


class StreamingResampler:
    """Chunked driver for :class:`Resampler` (composes with the .acs
    streaming pipeline, which also processes audio in bounded chunks).

    Feed arbitrary-length chunks with :meth:`step`; the internal buffer
    carries the filter history and the rational-phase position, so the
    concatenated outputs equal the one-shot :meth:`Resampler.resample`
    of the concatenated inputs exactly (the same tap matrix sees the
    same window values). :meth:`flush` zero-pads the tail and emits the
    remaining samples so the total output length is exactly
    ``out_length(total_input)``.

    The driver is host-side state + the same MXU conv per step; with a
    fixed chunk size the conv sees at most two distinct shapes (first
    step and steady state), so jit caching behaves.
    """

    def __init__(self, resampler: Resampler):
        self._r = resampler
        self._buf = None  # [B, buffered, C] numpy in compute dtype
        self._in_total = 0
        self._out_total = 0

    def _identity(self):
        return self._r.up == self._r.down

    def step(self, chunk: jax.Array) -> jax.Array:
        """Consume a [B, s, C] chunk; return all output samples that are
        now fully determined (possibly zero-length on short chunks)."""
        r = self._r
        if chunk.ndim != 3:
            raise ValueError(
                f"expected [batch, samples, channels], got {chunk.shape}"
            )
        _dtypes.check_input_dtype(chunk, r.compute_dtype, "chunk")
        if self._identity():
            self._in_total += chunk.shape[1]
            self._out_total += chunk.shape[1]
            return chunk
        c_np = np.asarray(chunk)
        if self._buf is None:
            # buffer index 0 is stream position u_min (= -pad_left):
            # block b's window is buf[b*M : b*M + W_in] forever after
            b, _, ch = c_np.shape
            self._buf = np.zeros(
                (b, r.pad_left, ch), dtype=c_np.dtype
            )
        self._buf = np.concatenate([self._buf, c_np], axis=1)
        self._in_total += chunk.shape[1]
        return self._drain()

    def _drain(self) -> jax.Array:
        r = self._r
        n_blocks = (self._buf.shape[1] - r.window_n) // r.down + 1
        b, _, ch = self._buf.shape
        if n_blocks <= 0:
            return jnp.zeros((b, 0, ch), dtype=r.compute_dtype)
        x_in = self._buf[:, : (n_blocks - 1) * r.down + r.window_n]
        lhs = jnp.asarray(
            np.moveaxis(x_in, -1, 1).reshape(b * ch, 1, x_in.shape[1])
        )
        y = jax.lax.conv_general_dilated(
            lhs, r.kernel, window_strides=(r.down,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=PRECISIONS[r.precision],
        )
        y = jnp.moveaxis(y, 1, 2).reshape(b * ch, n_blocks * r.up)
        y = jnp.moveaxis(y.reshape(b, ch, -1), 1, 2)
        self._buf = self._buf[:, n_blocks * r.down :]
        self._out_total += n_blocks * r.up
        return y

    def flush(self) -> jax.Array:
        """Zero-pad and emit the buffered tail; total output is trimmed
        to exactly ``out_length(total_input)``. Resets the stream."""
        r = self._r
        if self._identity() or self._buf is None:
            self._buf = None
            self._in_total = self._out_total = 0
            b = 1
            return jnp.zeros((1, 0, 1), dtype=r.compute_dtype)
        want = r.out_length(self._in_total)
        missing = want - self._out_total
        b, _, ch = self._buf.shape
        if missing > 0:
            # enough zeros that _drain covers the remaining blocks
            need_blocks = -(-missing // r.up)
            pad = (
                (need_blocks - 1) * r.down + r.window_n
                - self._buf.shape[1]
            )
            if pad > 0:
                self._buf = np.concatenate(
                    [self._buf,
                     np.zeros((b, pad, ch), dtype=self._buf.dtype)],
                    axis=1,
                )
            out = self._drain()[:, :missing]
        else:
            out = jnp.zeros((b, 0, ch), dtype=r.compute_dtype)
        self._buf = None
        self._in_total = self._out_total = 0
        return out
