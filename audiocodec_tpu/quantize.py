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


def quantize(mdct_amplitudes: jax.Array, masking_threshold: jax.Array,
             deadzone: float = 0.5):
    """Quantize spectra to integer codes.

    :param mdct_amplitudes: [batches_n, blocks_n, filter_bands_n, channels_n].
    :param masking_threshold: same shape, from
        PsychoacousticModel.global_masking_threshold.
    :param deadzone: zero-bin half-width in step units. 0.5 is the plain
        mid-tread rounder; larger values widen only the zero bin (every
        other bin keeps width 1), trading a little SNR for materially
        fewer bits on near-threshold content. Measured at matched
        container bitrate (benchmarks/rd_curve.py --deadzone) this wins
        below ~80 kbps per 44.1 kHz channel (+0.4..+1.2 dB SNR at
        40 kbps across speech-like, noise, and tonal signals), is
        signal-dependent around ~96, and is neutral-to-negative at 128+;
        see rate.resolve_deadzone for the target-rate heuristic. Decoders
        need only the reconstruction offset (:func:`dz_recon_offset`),
        recorded in the container as ``dzr``.
    :return: (codes int32 of the same shape, step sizes of the same shape).
        The step sizes are a deterministic function of the threshold; a
        bitstream would transmit the (much smaller) Bark-domain threshold.
    """
    if not 0.5 <= deadzone <= 2.0:
        raise ValueError(f"deadzone must be in [0.5, 2.0], got {deadzone}")
    delta = step_size(masking_threshold)
    if deadzone == 0.5:
        codes = jnp.round(mdct_amplitudes / delta).astype(jnp.int32)
    else:
        u = jnp.abs(mdct_amplitudes) / delta
        mag = jnp.maximum(
            jnp.asarray(0.0, u.dtype),
            jnp.floor(u - jnp.asarray(deadzone - 1.0, u.dtype)),
        )
        codes = (jnp.sign(mdct_amplitudes) * mag).astype(jnp.int32)
    return codes, delta


def dz_recon_offset(deadzone: float, recon_point=None) -> float:
    """Decoder-side reconstruction offset for a dead-zone quantizer.

    Nonzero bins span [(|c| - 1 + z)d, (|c| + z)d); reconstructing at
    fraction m inside the bin gives x_hat = sign(c)(|c| + rho)d with
    rho = z + m - 1. m defaults to the bin midpoint for mild dead zones
    and slightly below it (0.45, toward the Laplacian centroid — measured
    +0.1 dB at wide zones) otherwise. rho = 0 reproduces the plain
    ``codes * delta`` reconstruction exactly.
    """
    if recon_point is None:
        recon_point = 0.5 if deadzone <= 0.75 else 0.45
    return deadzone + recon_point - 1.0


def dequantize(codes: jax.Array, delta: jax.Array, dtype=None,
               recon_offset: float = 0.0) -> jax.Array:
    """Reconstruct spectra from integer codes and step sizes.

    :param recon_offset: dead-zone reconstruction offset rho (the
        container's ``dzr`` field); 0 is the plain ``codes * delta``.
        Must be a static Python float — the zero test happens at trace
        time so the default path stays a single multiply.
    """
    mag = codes.astype(delta.dtype)
    if recon_offset:
        mag = mag + jnp.sign(mag) * jnp.asarray(recon_offset, delta.dtype)
    out = mag * delta
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
