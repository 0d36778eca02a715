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


def nmr(codec: Codec, ref: jax.Array, deg: jax.Array,
        tmask: float = 0.0) -> jax.Array:
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
    gates) see the codec's true ≈ 0.03.

    :param tmask: forward-masking decay in dB/s (psycho.temporal_masking).
        0 (default) judges against the SIMULTANEOUS threshold only — the
        strictest lens, which counts noise that post-masking actually
        hides. Pass the encoder's tmask value to evaluate a tmask'd
        encode against the model's own audibility claim (the spread
        threshold); use the default to compare tmask ON vs OFF on equal
        (stricter-than-true) terms."""
    spec_ref = codec.mdct.transform(ref)
    spec_deg = codec.mdct.transform(deg)
    tonality = codec.psycho.tonality(spec_ref)
    if tmask:
        from audiocodec_tpu import psycho as _psycho

        bark = codec.psycho.global_masking_intensity_in_bark(
            spec_ref, tonality
        )
        bark = _psycho.temporal_masking(
            bark, codec._tmask_db_per_frame(tmask)
        )
        threshold = codec.psycho.bark_intensity_to_threshold(bark)
    else:
        threshold = codec.psycho.global_masking_threshold(
            spec_ref, tonality
        )
    r = ((spec_deg - spec_ref) / threshold).astype(jnp.float32)
    return jnp.mean(r * r)


def nmr_db(codec: Codec, ref: jax.Array, deg: jax.Array,
           tmask: float = 0.0) -> jax.Array:
    """NMR in dB (negative = inaudible on average)."""
    return 10.0 * jnp.log10(
        jnp.maximum(nmr(codec, ref, deg, tmask=tmask), 1e-30)
    )


def _k_weighting_coeffs(sample_rate: float):
    """BS.1770 K-weighting as two biquads at an arbitrary sample rate.

    The standard tabulates 48 kHz coefficients; any other rate needs the
    analog prototypes re-discretized (the pre-warped bilinear transform
    below — the same redesign pyloudnorm/ffmpeg use). Stage 1 is a
    +4 dB high shelf (head diffraction), stage 2 the RLB high-pass.
    Host-side float64 precompute, like every constant here."""
    def shelf(fc, gain_db, q, fs):
        k = np.tan(np.pi * fc / fs)
        vh = 10.0 ** (gain_db / 20.0)
        vb = vh ** 0.4996667741545416
        a0 = 1.0 + k / q + k * k
        b = np.array([
            (vh + vb * k / q + k * k) / a0,
            2.0 * (k * k - vh) / a0,
            (vh - vb * k / q + k * k) / a0,
        ])
        a = np.array([
            1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0
        ])
        return b, a

    def highpass(fc, q, fs):
        k = np.tan(np.pi * fc / fs)
        a0 = 1.0 + k / q + k * k
        b = np.array([1.0, -2.0, 1.0]) / a0
        a = np.array([
            1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0
        ])
        return b, a

    b1, a1 = shelf(1681.974450955533, 3.999843853973347,
                   0.7071752369554196, sample_rate)
    b2, a2 = highpass(38.13547087602444, 0.5003270373238773, sample_rate)
    return (b1, a1), (b2, a2)


def _biquad(x: jax.Array, b, a) -> jax.Array:
    """Direct-form-II-transposed biquad along axis 1 of [B, samples, C]
    (a lax.scan carrying two states per lane — metric path, not the
    codec hot path)."""
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    xt = jnp.moveaxis(x, 1, 0)  # [S, B, C]

    def step(state, xn):
        z1, z2 = state
        yn = b[0] * xn + z1
        z1n = b[1] * xn - a[1] * yn + z2
        z2n = b[2] * xn - a[2] * yn
        return (z1n, z2n), yn

    zeros = jnp.zeros_like(xt[0])
    _, y = jax.lax.scan(step, (zeros, zeros), xt, unroll=8)
    return jnp.moveaxis(y, 0, 1)


def loudness_lufs(x: jax.Array, sample_rate: int) -> float:
    """Integrated loudness (LUFS) per ITU-R BS.1770-4 / EBU R128.

    K-weighting (shelf + RLB high-pass, re-discretized for the given
    rate), 400 ms blocks with 75 % overlap, −70 LUFS absolute gate, then
    a −10 LU relative gate. Channels are summed with unit weights
    (correct for mono/stereo; surround side-channel weighting is out of
    scope). Calibration: a full-scale 997 Hz sine reads −3.0 LUFS.

    :param x: [B, samples, C] float waveform in [−1, 1].
    :return: integrated loudness of the batch's first clip, as a float.
    """
    return float(loudness_lufs_batch(x, sample_rate)[0])


def loudness_lufs_batch(x: jax.Array, sample_rate: int) -> np.ndarray:
    """Per-clip integrated loudness for a batch: [B, samples, C] ->
    float64 [B]. Same algorithm as :func:`loudness_lufs` (which is this
    function's first element), with the block powers and both gates
    vectorized over the batch axis — one device pass tags a whole
    corpus batch."""
    x = jnp.asarray(x, jnp.float32)
    (b1, a1), (b2, a2) = _k_weighting_coeffs(float(sample_rate))
    z = _biquad(_biquad(x, b1, a1), b2, a2)
    block = max(1, int(round(0.400 * sample_rate)))
    step = max(1, block // 4)  # 75% overlap
    s = z.shape[1]
    if s < block:
        block = s
        step = s
    n_blocks = 1 + (s - block) // step
    starts = np.arange(n_blocks) * step
    # power per block, channels summed with unit weights
    idx = starts[:, None] + np.arange(block)[None, :]
    zb = z[:, idx]  # [B, n_blocks, block, C]
    # l_j = -0.691 + 10 log10( sum_ch mean_t z^2 ) — unit channel weights
    power = jnp.maximum(
        jnp.sum(jnp.mean(zb**2, axis=2), axis=-1), 1e-12
    )  # [B, n_blocks]
    l_blocks = -0.691 + 10.0 * jnp.log10(power)
    abs_mask = l_blocks > -70.0
    p_abs = jnp.sum(
        jnp.where(abs_mask, power, 0.0), axis=1
    ) / jnp.maximum(jnp.sum(abs_mask, axis=1), 1)
    rel_gate = (
        -0.691 + 10.0 * jnp.log10(jnp.maximum(p_abs, 1e-12)) - 10.0
    )
    mask = abs_mask & (l_blocks > rel_gate[:, None])
    p_int = jnp.sum(
        jnp.where(mask, power, 0.0), axis=1
    ) / jnp.maximum(jnp.sum(mask, axis=1), 1)
    return np.asarray(
        -0.691 + 10.0 * jnp.log10(jnp.maximum(p_int, 1e-12)), np.float64
    )


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
