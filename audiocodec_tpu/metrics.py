"""Objective quality metrics: waveform SNR, segmental SNR, and NMR.

The reference has no evaluation tooling; its calibration story (dB_MAX,
masking thresholds — reference audiocodec/psychoacoustic.py:24-43) is
exactly what a noise-to-mask ratio needs, so this module turns the codec's
own psychoacoustic model into a measurement instrument. NMR is the metric
raw SNR cannot replace: noise moved ABOVE the masking threshold at
constant power is audible but SNR-invariant (that asymmetry is why every
benchmark quality gate here pairs an SNR floor with an NMR ceiling).

All metric cores are pure jittable functions of (codec, ref, deg); the
CLI's ``eval`` command wraps them for wav-file pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audiocodec_tpu.codec import Codec


def snr_db(ref: jax.Array, deg: jax.Array) -> jax.Array:
    """Time-domain SNR in dB over the whole signal: both [B, samples, C]."""
    noise = jnp.sum((ref - deg) ** 2)
    sig = jnp.sum(ref**2)
    return 10.0 * jnp.log10(sig / jnp.maximum(noise, 1e-30))


def segmental_snr_db(
    ref: jax.Array, deg: jax.Array, frame: int = 1024,
    floor_db: float = -10.0, ceil_db: float = 35.0,
) -> jax.Array:
    """Mean per-frame SNR in dB, frames clamped to [floor, ceil].

    The standard speech-quality variant: long silences and easy passages
    cannot buy back a badly coded segment (global SNR lets them)."""
    s = ref.shape[1] - ref.shape[1] % frame
    r = ref[:, :s].reshape(ref.shape[0], -1, frame, ref.shape[-1])
    d = deg[:, :s].reshape(deg.shape[0], -1, frame, deg.shape[-1])
    sig = jnp.sum(r**2, axis=2)
    noise = jnp.maximum(jnp.sum((r - d) ** 2, axis=2), 1e-30)
    per = 10.0 * jnp.log10(jnp.maximum(sig, 1e-30) / noise)
    return jnp.mean(jnp.clip(per, floor_db, ceil_db))


def nmr(codec: Codec, ref: jax.Array, deg: jax.Array) -> jax.Array:
    """Mean squared noise-to-mask ratio of ``deg`` against ``ref``.

    The error spectrum (MDCT of both signals, differenced) is compared
    bin-by-bin to the masking threshold of the REFERENCE — the same
    quantity the codec's quantizer is calibrated against (quantize.py:
    step = threshold/√3, noise power threshold²/36), so the codec's own
    quantization lands at NMR ≈ 1/36 ≈ 0.03 and NMR << 1 generally means
    the degradation hides under the mask. Same formula as the
    training-loss metric (parallel/train.py:61) and the benchmark gates
    (benchmarks/run_benchmarks.py:67).

    Calibration note: the model's dB_MAX=120 convention (reference
    psychoacoustic.py:24-33) maps full scale to 120 dB SPL, so even the
    −96 dBFS dither of a 16-bit PCM wav registers as NMR ≈ 1 (at 120 dB
    playback it IS marginally audible). Comparing wav files therefore
    floors around NMR ~1; in-memory float comparisons (the benchmark
    gates) see the codec's true ≈ 0.03."""
    spec_ref = codec.mdct.transform(ref)
    spec_deg = codec.mdct.transform(deg)
    tonality = codec.psycho.tonality(spec_ref)
    threshold = codec.psycho.global_masking_threshold(spec_ref, tonality)
    r = ((spec_deg - spec_ref) / threshold).astype(jnp.float32)
    return jnp.mean(r * r)


def nmr_db(codec: Codec, ref: jax.Array, deg: jax.Array) -> jax.Array:
    """NMR in dB (negative = inaudible on average)."""
    return 10.0 * jnp.log10(jnp.maximum(nmr(codec, ref, deg), 1e-30))


@jax.jit
def _evaluate_jit(codec, ref, deg):
    return {
        "snr_db": snr_db(ref, deg),
        "seg_snr_db": segmental_snr_db(
            ref, deg, frame=codec.mdct.filters_n
        ),
        "nmr": nmr(codec, ref, deg),
        "nmr_db": nmr_db(codec, ref, deg),
    }


def evaluate(codec: Codec, ref: jax.Array, deg: jax.Array) -> dict:
    """All metrics as python floats. ``ref``/``deg``: [B, samples, C] of
    the codec's compute dtype, equal shapes, samples a multiple of N."""
    if ref.shape != deg.shape:
        raise ValueError(
            f"reference and degraded shapes differ: {ref.shape} vs "
            f"{deg.shape}; align them first (the CLI trims to the common "
            "length)"
        )
    n = codec.mdct.filters_n
    if ref.shape[1] % n:
        raise ValueError(
            f"samples ({ref.shape[1]}) must be a multiple of filters_n "
            f"({n}) for the MDCT-domain metrics"
        )
    out = _evaluate_jit(codec, ref, deg)
    return {k: float(v) for k, v in out.items()}
