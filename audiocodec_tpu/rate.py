"""Rate control: encode to a target bitrate.

The codec is natively VBR — bits follow the masking threshold. For
transport budgets, this module finds the threshold scale gamma whose
packed size hits a target bitrate: scaling every quantization step by
gamma > 1 coarsens codes monotonically (fewer bits, gracefully degrading
fidelity starting with the least audible content — the perceptual model
keeps ordering the damage). A bisection over log2(gamma) against the
ACTUAL packed size (entropy coding included) converges in ~8 encodes;
only quantize+pack re-run per trial — the MDCT/threshold pass is computed
once.

    result = rate.encode_with_target_bitrate(codec, x, target_kbps=96)
    result.codes, result.bark16, result.threshold_scale, result.kbps
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from audiocodec_tpu import quantize as _quantize
from audiocodec_tpu.io import bitstream as _bitstream


@dataclasses.dataclass
class RateControlResult:
    codes: np.ndarray
    bark16: np.ndarray
    threshold_scale: float
    kbps: float
    packed: bytes


def encode_with_target_bitrate(
    codec,
    x,
    target_kbps: float,
    drown=0.0,
    tolerance: float = 0.05,
    max_iters: int = 10,
    log2_scale_range=(-4.0, 10.0),
    ms: bool = False,
) -> RateControlResult:
    """Bisect the threshold scale until the packed bitrate is within
    ``tolerance`` of ``target_kbps`` (or the best achievable at the range
    edges — a silent clip cannot be inflated to 320 kbps).

    :param x: waveform [1, samples, channels] (single clip — bitrate is a
        per-clip property).
    """
    if x.shape[0] != 1:
        raise ValueError("rate control operates on a single clip")
    if not (np.isfinite(target_kbps) and target_kbps > 0):
        raise ValueError(f"target_kbps must be positive, got {target_kbps}")
    sample_rate = codec.psycho.sample_rate
    seconds = x.shape[1] / sample_rate

    # one-time analysis (the bitstream-critical derivation lives in ONE
    # place — Codec.analyze_for_quantization); trials only re-quantize+pack
    spectrum_q, bark16, base_threshold = codec.analyze_for_quantization(
        codec.mdct.transform(x), drown, ms=ms
    )

    quantize_trial = jax.jit(
        lambda scale: _quantize.quantize(
            spectrum_q,
            base_threshold
            * jnp.asarray(scale, dtype=codec.mdct.compute_dtype),
        )[0]
    )

    meta = dict(
        sample_rate=sample_rate,
        filters_n=codec.mdct.filters_n,
        bark_bands_n=codec.psycho.bark_bands_n,
        alpha=codec.psycho.alpha,
        window_type=codec.mdct.window_type,
        compute_dtype=str(jnp.dtype(codec.mdct.compute_dtype)),
        ms=ms,
    )

    def trial(log2_scale):
        scale = float(2.0**log2_scale)
        codes = np.asarray(quantize_trial(scale))
        packed = _bitstream.pack(
            codes, bark16, threshold_scale=scale, **meta
        )
        kbps = len(packed) * 8 / seconds / 1000
        return codes, packed, scale, kbps

    lo, hi = log2_scale_range
    best = None
    for _ in range(max_iters):
        mid = 0.5 * (lo + hi)
        codes, packed, scale, kbps = trial(mid)
        if best is None or abs(kbps - target_kbps) < abs(
            best.kbps - target_kbps
        ):
            best = RateControlResult(
                codes=codes,
                bark16=np.asarray(bark16),
                threshold_scale=scale,
                kbps=kbps,
                packed=packed,
            )
        if abs(kbps - target_kbps) <= tolerance * target_kbps:
            break
        if kbps > target_kbps:
            lo = mid  # too many bits: raise thresholds
        else:
            hi = mid
    return best
