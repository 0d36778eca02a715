"""Masking-driven quantization — the vectorized quantize/dequantize stage.

The reference has no quantizer at all: its entire "lossy encoding" is
masked-noise injection (audiocodec/psychoacoustic.py:151-167), which
simulates quantization noise for differentiable training. This module adds
the real thing as a fully vectorized step over (batch, block, band, channel):
a uniform mid-tread quantizer whose step size per band is derived from the
masking threshold, calibrated so the quantization noise power matches the
reference's noise-injection calibration.

Calibration: uniform quantization with step delta has noise variance
delta^2 / 12; the reference injects noise with sigma = threshold / 6. Setting
delta = threshold * sqrt(12) / 6 = threshold / sqrt(3) makes the quantizer's
noise power equal to the injected-noise power, so SNR behavior matches the
noise-injection path while producing actual integer codes.

A straight-through estimator variant is provided so the quantizer can sit
inside a differentiable training pipeline.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def step_size(masking_threshold: jax.Array, floor: float = 1e-12) -> jax.Array:
    """Quantization step per band: threshold / sqrt(3), floored for safety."""
    return jnp.maximum(
        masking_threshold * jnp.asarray(1.0 / math.sqrt(3.0),
                                        dtype=masking_threshold.dtype),
        jnp.asarray(floor, dtype=masking_threshold.dtype),
    )


def quantize(mdct_amplitudes: jax.Array, masking_threshold: jax.Array):
    """Quantize spectra to integer codes.

    :param mdct_amplitudes: [batches_n, blocks_n, filter_bands_n, channels_n].
    :param masking_threshold: same shape, from
        PsychoacousticModel.global_masking_threshold.
    :return: (codes int32 of the same shape, step sizes of the same shape).
        The step sizes are a deterministic function of the threshold; a
        bitstream would transmit the (much smaller) Bark-domain threshold.
    """
    delta = step_size(masking_threshold)
    codes = jnp.round(mdct_amplitudes / delta).astype(jnp.int32)
    return codes, delta


def dequantize(codes: jax.Array, delta: jax.Array, dtype=None) -> jax.Array:
    """Reconstruct spectra from integer codes and step sizes."""
    out = codes.astype(delta.dtype) * delta
    return out if dtype is None else out.astype(dtype)


@jax.custom_vjp
def quantize_ste(mdct_amplitudes: jax.Array, masking_threshold: jax.Array):
    """Quantize-dequantize round trip with a straight-through gradient.

    Forward: dequantize(quantize(x)); backward: identity on the amplitudes,
    zero on the threshold. Lets training pipelines optimize through the
    quantizer (the role the reference's add_noise plays, made exact).
    """
    codes, delta = quantize(mdct_amplitudes, masking_threshold)
    return dequantize(codes, delta, dtype=mdct_amplitudes.dtype)


def _quantize_ste_fwd(mdct_amplitudes, masking_threshold):
    return quantize_ste(mdct_amplitudes, masking_threshold), None


def _quantize_ste_bwd(_, g):
    return g, jnp.zeros_like(g)


quantize_ste.defvjp(_quantize_ste_fwd, _quantize_ste_bwd)
