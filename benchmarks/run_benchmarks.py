#!/usr/bin/env python
"""Full benchmark suite: the five BASELINE.json configs on real hardware.

  1. MDCT analysis-synthesis round trip, 1 s mono 16 kHz sine, N=256
     (perfect-reconstruction check + throughput)
  2. Psychoacoustic masking threshold on a two-tone signal
  3. Full encode/decode of a 10 s mono 44.1 kHz clip with quantization
     (SNR-gated)
  4. Batched encode of a 1k-clip 44.1 kHz corpus (jit, sharded batch,
     includes host->device transfer)
  5. Stereo 48 kHz long-form streaming encode/decode, chunked overlap-add

Timing methodology (remote-attached TPU): every timed region ends in a
scalar host readback; multi-iteration regions chain on-device via lax.scan
over loop-variant data so nothing hoists (see bench.py).

Writes benchmarks/RESULTS.md and prints one JSON line per config.
Use --quick for small shapes (CI smoke).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = {  # measured TF-CPU numbers from BASELINE.md
    "full_encode_decode": 92.0,  # audio-sec/sec
    "mdct_roundtrip": 218.0,  # transform alone: audio-sec/sec
}

# Regression floors = recorded nominal minus a noise margin (RESULTS.md
# on v5e, kernels-on defaults). A deliberate regression below any floor
# fails that config's row.
GATES = {
    "mdct_floor": 700_000.0,             # nominal ~968,000 audio-s/s
    # lossless archival mode (config 6; CPU-pinned — entropy-coder-bound).
    # Ratio nominals: music-ish 0.616 (0.569 at level 2, whose measured
    # entropy floor on that workload is 0.551 — DESIGN.md §22b), sine
    # 0.033-0.051 (a pad-tail order near-tie moves the deflate-raw
    # payload; both sides of the tie are inside the gate), noise 1.005,
    # silence 0.0006; throughput nominals ~230 enc / ~179 dec audio-s/s
    # level 1 and ~265 enc level 2 on this rig's single core (round 5:
    # one-pass native order-searched analysis). Level 1's floor carries
    # an in-suite allowance: config 7 runs LAST, and the jax-CPU select
    # degrades to ~135-140 after ~40 min of in-process axon RPC churn
    # while the native level-2 path holds ~226 in the same run —
    # measured NOT a code regression (round-4 code A/B'd equal in the
    # same conditions). The floor still fails a genuine 2x regression.
    "lossless_music_ratio": 0.70,
    "lossless_music_lpc_ratio": 0.60,    # nominal 0.569; floor 0.551
    "lossless_sine_ratio": 0.06,
    "lossless_noise_ratio": 1.01,
    "lossless_silence_ratio": 0.01,
    "lossless_encode_floor": 110.0,
    "lossless_lpc_encode_floor": 150.0,  # nominal ~265; native path
    "lossless_decode_floor": 110.0,
    "psycho_floor": 45_000.0,            # nominal ~60,000 audio-s/s
    "full_floor": 90_000.0,              # f32 HIGHEST nominal ~108-110k
    "bf16_floor": 330_000.0,             # bf16-fast nominal ~404,000
    "corpus_device_floor": 100_000.0,    # nominal ~118-122,000 audio-s/s
    "corpus_ingest_floor": 250.0,        # best-path nominal ~410-480
                                         # (run-to-run tunnel noise ~30%)
    "streaming_floor": 40_000.0,         # HIGHEST nominal ~45-47k audio-s/s
    # default-precision nominal ~94-97k standalone. The rig's tunnel/
    # device state degrades up to ~2x during long multi-config runs
    # (observed 55k in a full-suite pass whose transport ceiling had
    # also halved), so this NOMINAL-based floor is scaled at run time by
    # transport_health(): a healthy tunnel gates at the full 80k (a 2x
    # code regression fails), a degraded tunnel scales down pro rata
    # (no false alarm on rig weather)
    "streaming_default_floor": 80_000.0,
    "streaming_snr_floor": 26.0,         # quantized stereo nominal 28.41 dB
    "bf16_snr_floor": 17.2,              # dense-bf16 nominal 17.36 dB
    # noise-to-mask ratio, mean((err/threshold)^2) on the quantized path.
    # A psycho-model regression that moves noise above the masking
    # threshold at constant power blows this up while raw SNR stays put.
    # Measured nominals: 0.0213 (config 3, f32), 0.0217 (bf16), 0.0014
    # (streaming stereo sines); ceiling ~4x the batch nominals.
    "nmr_ceiling": 0.08,
    # .acz bitrate on the config-3 signal (two tones + 0.05 noise — only
    # ~40% zero codes, so run-length Rice wins just barely there; tonal
    # content compresses 2-6x better). Nominal 141.7 kbps auto-coded; a
    # quantizer or entropy-coder regression shows up here before SNR moves.
    "full_kbps_ceiling": 150.0,
    # .acs container bitrate on the config-5 stereo sines (tonal content;
    # raw run-length-Rice payloads, no deflate wrapper, per-chunk sidecar
    # resets). Measured nominal 43.3 kbps for the 48 kHz stereo pair.
    "streaming_kbps_ceiling": 48.0,
}


def nmr_quantized(codec, x, drown=0.0):
    """Mean squared noise-to-mask ratio of the quantized path (the metric
    of parallel/train.py's perceptual loss, used here as a quality gate
    that raw SNR cannot replace)."""
    import jax
    import jax.numpy as jnp

    from audiocodec_tpu import quantize as _quantize

    @jax.jit
    def _nmr(c, x):
        spec = c.mdct.transform(x)
        tonality = c.psycho.tonality(spec)
        threshold = c.psycho.global_masking_threshold(spec, tonality, drown)
        codes, delta = _quantize.quantize(spec, threshold)
        err = _quantize.dequantize(
            codes, delta, dtype=c.mdct.compute_dtype
        ) - spec
        r = (err / threshold).astype(jnp.float32)
        return jnp.mean(r * r)

    return float(_nmr(codec, x))


def snr_db(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return 10 * np.log10((x**2).sum() / max(((x - y) ** 2).sum(), 1e-30))


_RTT = None


def _rtt() -> float:
    """Fixed per-host-call round trip on this rig (~26 ms through the
    remote tunnel), measured once with a no-op and subtracted from every
    timing — device work is invariant to it."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        x = jnp.zeros((8, 8), jnp.float32)
        f = jax.jit(lambda x: jnp.sum(x))
        float(f(x))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        _RTT = best
    return _RTT


_NOMINAL_H2D_MBPS = 37.0  # honest forced-completion tunnel ceiling
#                           (benchmarks/transport_probe.py, CLAUDE.md)


def transport_health(nominal_mbps=_NOMINAL_H2D_MBPS):
    """Measured marginal H2D bandwidth over the rig's nominal ceiling,
    clamped to [0.2, 1.0] — the gate scaler for transport-coupled
    configs. A degraded tunnel (observed up to ~2x during long runs)
    lowers the factor so floors track rig weather instead of being set
    permanently below nominal; on a healthy tunnel the factor is 1.0 and
    a genuine 2x code regression fails the gate (round-3 weakness: the
    default-precision streaming floor was simply lowered under an
    observed transient, hiding real regressions).

    Slope method (transport_probe.py): 3 puts vs 1 put of 8 MB int16,
    each forced complete by a full-buffer reduction + scalar readback;
    the difference cancels the per-call RTT. ~2-4 s on a healthy tunnel.
    """
    import jax
    import jax.numpy as jnp

    base = np.random.default_rng(0).integers(
        -32768, 32767, 4 * 1024 * 1024, dtype=np.int16
    )  # 8 MB
    touch = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))

    def put_k(k):
        acc = None
        t0 = time.perf_counter()
        for i in range(k):
            d = jax.device_put(base + np.int16(i))
            s = touch(d)
            acc = s if acc is None else acc + s
        float(acc)
        return time.perf_counter() - t0

    put_k(1)  # warm compile + page-touch
    t1 = min(put_k(1) for _ in range(2))
    t3 = min(put_k(3) for _ in range(2))
    mbps = 2 * 8.0 / max(t3 - t1, 1e-6)
    return max(0.2, min(1.0, mbps / nominal_mbps)), round(mbps, 1)


def timed(fn, iters=3):
    """Best-of wall time of fn() minus the fixed host-call RTT (fn must
    end in a host readback). For chain timings prefer slope_timed."""
    fn()  # warm / compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    # never let RTT fluctuation report absurd throughput: device time is
    # at least 10% of the observed wall (conservative floor for short runs)
    return max(best - _rtt(), best * 0.1)


def slope_timed(make_chain, l_short=6, l_long=18, min_delta_s=0.05):
    """Per-iteration device time via two chain lengths: the difference
    cancels the fluctuating per-call tunnel RTT exactly.

    The tunnel RTT fluctuates by up to a few ms between calls, so the
    slope is only trustworthy when the long chain is measurably longer
    than the short one. If the delta lands under ``min_delta_s`` (cheap
    per-iteration work), the chain lengths escalate 4x until the device
    time dominates the noise — otherwise a ~0 delta would report absurd
    throughput.

    :param make_chain: length -> zero-arg callable ending in a readback.
    """

    def best_of(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(6):
        short, long_ = make_chain(l_short), make_chain(l_long)
        short(), long_()  # warm / compile
        t_s, t_l = best_of(short), best_of(long_)
        if t_l - t_s >= min_delta_s:
            return (t_l - t_s) / (l_long - l_short)
        l_short, l_long = l_short * 4, l_long * 4
    return max((t_l - t_s) / (l_long - l_short), 1e-9)


def config1_mdct_roundtrip(quick):
    import jax
    import jax.numpy as jnp

    from audiocodec_tpu.mdct import MDCT

    n = 256
    sr = 16000
    mdct = MDCT.create(n)
    t = np.arange(sr) / sr
    wave = (0.8 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    wave = wave[: sr // n * n]
    batch = 4 if quick else 64
    x = jnp.asarray(np.tile(wave[None, :, None], (batch, 1, 1)))

    @jax.jit
    def rt_err(x):
        y = mdct.inverse_transform(mdct.transform(x))
        return jnp.max(jnp.abs(x - y[:, n:-n]))

    err = float(rt_err(x))

    def make_chain(length):
        # feedback through abs: the MDCT is linear and XLA's simplifier
        # can decouple a linear op on a scalar-scaled carry (see
        # kernel_bench.py) — the output must drive the next input
        @jax.jit
        def chain(x0):
            def body(c, _):
                y = mdct.inverse_transform(mdct.transform(c))
                nxt = jnp.abs(y[:, n:-n]) * 0.4 + c * 0.4
                return nxt, jnp.float32(0)
            c, _ = jax.lax.scan(body, x0, None, length=length)
            return jnp.sum(jnp.abs(c))
        return lambda: float(chain(x))

    if quick:  # smoke test: slope of tiny chains is noise-dominated
        dt = timed(make_chain(2)) / 2
    else:
        # ~40 us/iter: start long so the slope delta clears the RTT noise
        dt = slope_timed(make_chain, 512, 2048)
    audio_s = batch * wave.size / sr
    thr = audio_s / dt
    # Gate: PR error at the reference's own tolerance, plus (non-quick,
    # where slope timing is trustworthy) the >=100x BASELINE multiplier.
    ok = bool(err < 1e-5)
    if not quick:
        ok = ok and thr >= max(
            100.0 * REFERENCE["mdct_roundtrip"], GATES["mdct_floor"]
        )
    return {
        "config": "mdct_roundtrip",
        "pr_max_abs_error": err,
        "throughput_audio_s_per_s": round(thr, 1),
        "pass": ok,
    }


def config2_psycho_twotone(quick):
    import jax
    import jax.numpy as jnp

    from audiocodec_tpu.mdct import MDCT
    from audiocodec_tpu.psycho import PsychoacousticModel

    sr, n = 44100, 1024
    mdct = MDCT.create(n)
    pa = PsychoacousticModel.create(sr, filter_bands_n=n, bark_bands_n=64)
    t = np.arange(sr) / sr
    wave = (
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 3000 * t)
    ).astype(np.float32)
    wave = wave[: wave.size // n * n]
    x = jnp.asarray(wave[None, :, None])

    @jax.jit
    def threshold(x):
        spec = mdct.transform(x)
        return pa.global_masking_threshold(spec, pa.tonality(spec))

    thr = np.asarray(threshold(x))
    # masking sanity: at the 440 Hz masker's bin, the two-tone threshold
    # must sit far above the threshold-in-quiet at that same bin
    bin_440 = int(440 / (sr / 2) * n)
    thr_silence = np.asarray(threshold(jnp.zeros_like(x)))
    quiet_floor = float(thr_silence[0, 1:-1, bin_440, 0].mean())
    near_masker = float(thr[0, 1:-1, bin_440, 0].mean())
    def make_chain(length):
        @jax.jit
        def chain(x):
            def body(c, _):
                return c * 0.999, jnp.sum(threshold(c))
            _, s = jax.lax.scan(body, x, None, length=length)
            return jnp.sum(s)
        return lambda: float(chain(x))

    if quick:
        dt = timed(make_chain(2)) / 2
    else:
        # ~100 us/iter single-clip chain: start long (see slope_timed)
        dt = slope_timed(make_chain, 256, 1024)
    return {
        "config": "psycho_twotone",
        "masker_to_floor_ratio": round(near_masker / quiet_floor, 1),
        "throughput_audio_s_per_s": round((wave.size / sr) / dt, 1),
        "pass": bool(
            near_masker > 10 * quiet_floor
            and (quick or (wave.size / sr) / dt >= GATES["psycho_floor"])
        ),
    }


def config3_full_encode_decode(quick):
    import jax
    import jax.numpy as jnp

    from audiocodec_tpu.codec import Codec

    sr, n = 44100, 1024
    codec = Codec.create(sr, filters_n=n, bark_bands_n=64)
    dur = 2.0 if quick else 10.0
    t = np.arange(int(sr * dur)) / sr
    rng = np.random.default_rng(0)
    wave = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1320 * t)
        + 0.05 * rng.normal(size=t.size)
    ).astype(np.float32)
    wave = wave[: wave.size // n * n]
    batch = 2 if quick else 32
    x = jnp.asarray(np.tile(wave[None, :, None], (batch, 1, 1)))

    out = np.asarray(jax.jit(codec.round_trip_quantized)(x))[:, n:-n]
    snr = snr_db(np.asarray(x), out)

    def make_chain(length):
        @jax.jit
        def chain(c, x0):
            def body(acc, i):
                xi = x0 * (1.0 + 0.001 * i.astype(jnp.float32))
                return acc + jnp.sum(jnp.abs(c.round_trip_quantized(xi))), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(length))
            return acc
        return lambda: float(chain(codec, x))

    if quick:
        dt = timed(make_chain(2)) / 2
    else:
        dt = slope_timed(make_chain, 6, 18)
    audio_s = batch * wave.size / sr
    thr = audio_s / dt
    nmr = nmr_quantized(codec, x)

    # Bitrate of the actual .acz container on one clip: the coder choice
    # (rice vs run-length rice vs zlib) and the quantizer both land here.
    from audiocodec_tpu.io import bitstream

    codes, bark = jax.jit(codec.encode_bitstream)(x[:1])
    c0, b0 = np.asarray(codes), np.asarray(bark)
    dur = wave.size / sr
    pack_kw = dict(
        sample_rate=sr, filters_n=n, bark_bands_n=64,
        alpha=codec.psycho.alpha, window_type="vorbis",
        compute_dtype="float32",
    )
    size_auto = len(bitstream.pack(c0, b0, entropy="auto", **pack_kw))
    size_rice = len(bitstream.pack(c0, b0, entropy="rice", **pack_kw))
    size_zlib = len(bitstream.pack(c0, b0, entropy="zlib", **pack_kw))
    kbps = size_auto * 8 / dur / 1000

    # Gates derived from recorded nominals minus a small margin (RESULTS.md:
    # 18.96 dB, 1106x): a real quality regression (>0.5 dB), a psycho-model
    # regression (NMR), a bitrate regression, or a perf regression below
    # the 100x BASELINE target fails loudly. "auto" must also never pick a
    # coder worse than the alternatives it costs.
    ok = bool(snr > (15.0 if quick else 18.5))
    ok = ok and nmr < GATES["nmr_ceiling"]
    ok = ok and size_auto <= min(size_rice, size_zlib)
    if not quick:
        ok = ok and kbps <= GATES["full_kbps_ceiling"]
        ok = ok and thr >= max(
            100.0 * REFERENCE["full_encode_decode"], GATES["full_floor"]
        )
    return {
        "config": "full_encode_decode",
        "snr_db": float(round(snr, 2)),
        "nmr": float(round(nmr, 4)),
        "kbps": float(round(kbps, 1)),
        "kbps_rice": float(round(size_rice * 8 / dur / 1000, 1)),
        "kbps_zlib": float(round(size_zlib * 8 / dur / 1000, 1)),
        "throughput_audio_s_per_s": round(thr, 1),
        "vs_reference_cpu": round(thr / REFERENCE["full_encode_decode"], 1),
        "pass": ok,
    }


def config3b_full_encode_decode_bf16(quick):
    """The speed configuration: bfloat16 compute with native-bf16 DCT
    matmuls (f32 accumulation) — the reference offers a bf16 path too."""
    import jax
    import jax.numpy as jnp

    from audiocodec_tpu.codec import Codec

    sr, n = 44100, 1024
    codec = Codec.create(
        sr, filters_n=n, bark_bands_n=64,
        compute_dtype=jnp.bfloat16, fast_bf16=True,
        # the recommended bf16 deployment: dense two-matmul formulation —
        # faster AND more accurate than the sparse bf16 fold (the folded
        # intermediate no longer rounds to bf16 before the matmul)
        dct_precision="default",
    )
    dur = 2.0 if quick else 10.0
    t = np.arange(int(sr * dur)) / sr
    rng = np.random.default_rng(0)
    wave = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.05 * rng.normal(size=t.size)
    ).astype(np.float32)
    wave = wave[: wave.size // n * n]
    batch = 2 if quick else 32
    x = jnp.asarray(
        np.tile(wave[None, :, None], (batch, 1, 1)), dtype=jnp.bfloat16
    )

    out = np.asarray(
        jax.jit(codec.round_trip_quantized)(x).astype(jnp.float32)
    )[:, n:-n]
    snr = snr_db(np.asarray(x.astype(jnp.float32)), out)

    def make_chain(length):
        @jax.jit
        def chain(c, x0):
            def body(acc, i):
                xi = x0 * (1.0 + 0.001 * i.astype(jnp.bfloat16))
                out = c.round_trip_quantized(xi)
                return acc + jnp.sum(jnp.abs(out).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(length))
            return acc
        return lambda: float(chain(codec, x))

    if quick:
        dt = timed(make_chain(2)) / 2
    else:
        dt = slope_timed(make_chain, 6, 18)
    audio_s = batch * wave.size / sr
    thr = audio_s / dt
    nmr = nmr_quantized(codec, x)
    return {
        "config": "full_encode_decode_bf16",
        "snr_db": float(round(snr, 2)),
        "snr_signal": "sine(440)+noise 10s B=32 N=1024 (not bench.py's)",
        "nmr": float(round(nmr, 4)),
        "throughput_audio_s_per_s": round(thr, 1),
        # the reference was only ever measured in f32 on CPU; no bf16
        # reference number exists, so label the denominator honestly
        "vs_reference_cpu_f32": round(
            thr / REFERENCE["full_encode_decode"], 1
        ),
        # NOTE this 10 s sine+noise signal is config 3's, NOT bench.py's
        # two-tone+noise headline signal — which is why this row's bf16
        # SNR (nominal 17.36 dB) differs from BENCH's 18.98 dB; both are
        # correct for their own workloads. Quick mode runs a shorter
        # signal so only the catastrophic gate applies there.
        "pass": bool(
            snr > (10.0 if quick else GATES["bf16_snr_floor"])
            and nmr < GATES["nmr_ceiling"]
            and (quick or thr >= GATES["bf16_floor"])
        ),
    }


def config4_corpus(quick):
    import jax
    import jax.numpy as jnp

    from audiocodec_tpu.codec import Codec
    from audiocodec_tpu.parallel import make_corpus_encoder, make_mesh

    sr, n = 44100, 1024
    codec = Codec.create(sr, filters_n=n, bark_bands_n=64)
    clips_n = 32 if quick else 1024
    dur = 2.0 if quick else 10.0
    samples = int(sr * dur) // n * n
    batch = 8 if quick else 64

    mesh = make_mesh()
    encoder = make_corpus_encoder(codec, mesh, quantized=True)

    rng = np.random.default_rng(0)
    base = rng.uniform(-0.6, 0.6, (batch, samples, 1)).astype(np.float32)

    from audiocodec_tpu.parallel import waveform_sharding

    wsh = waveform_sharding(mesh)

    # NOTE every ingest loop stages batches with an EXPLICIT
    # jax.device_put (what the production loaders do) before invoking the
    # jitted encoder: on this rig jit's implicit numpy transfer is ~30x
    # slower than device_put for the same bytes (measured 1200 ms vs
    # 37 ms for a 56 MB batch) — benchmarking through it would measure a
    # JAX dispatch artifact, not the pipeline.
    def run_corpus():
        # fresh host batch every step: includes H2D transfer like a real
        # ingestion pipeline
        for start in range(0, clips_n, batch):
            hb = base * np.float32(1.0 - 0.3 * (start / max(clips_n, 1)))
            codes, delta = encoder(jax.device_put(hb, wsh))
        # single readback at the end drains the pipeline
        return float(jnp.sum(jnp.abs(delta)))

    dt_ingest = timed(run_corpus, iters=2)

    # int16 wire (parallel/pipeline.py wire_dtype): half the H2D bytes,
    # dequantized to float on-device inside the encode program. Same
    # methodology as the float baseline — fresh loop-variant host batch
    # each step (including the host-side int16 conversion, a real wire
    # cost) through the same mesh-sharded encoder.
    import functools

    @functools.partial(jax.jit, in_shardings=(waveform_sharding(mesh),))
    def encode_i16(b):
        x = b.astype(jnp.float32) * (1.0 / 32768.0)
        return codec.encode_quantized(x)[:2]

    def run_corpus_i16():
        for start in range(0, clips_n, batch):
            hb = base * np.float32(1.0 - 0.3 * (start / max(clips_n, 1)))
            hb16 = np.clip(np.rint(hb * 32768.0), -32768, 32767).astype(
                np.int16
            )
            codes, delta = encode_i16(jax.device_put(hb16, wsh))
        return float(jnp.sum(jnp.abs(delta)))

    dt_ingest_i16 = timed(run_corpus_i16, iters=2)

    # cached-PCM ingest (parallel/pipeline.build_corpus_cache): repeat
    # epochs read page-cached int16 straight off a memmap — no WAV parse,
    # no float round trip, no host conversion; only memmap read + H2D +
    # encode remain. This is the epoch>=2 production ingest path.
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npy", delete=False) as tf:
        cache_file = tf.name
    all16 = np.clip(np.rint(base * 32768.0), -32768, 32767).astype(np.int16)
    cache_arr = np.lib.format.open_memmap(
        cache_file, mode="w+", dtype=np.int16,
        shape=(clips_n, samples, 1),
    )
    for start in range(0, clips_n, batch):
        cache_arr[start : start + batch] = all16
    cache_arr.flush()
    del cache_arr

    # meta sidecar so CachedCorpusLoader (the production epoch>=2 path,
    # with its prefetch thread overlapping staging and encode) can drive
    # the measurement
    np.savez(
        cache_file + ".meta.npz",
        status=np.zeros(clips_n, dtype=np.int32),
        sample_rate=np.asarray([sr], dtype=np.int64),
        clip_seconds=np.asarray([samples / sr], dtype=np.float64),
    )
    from audiocodec_tpu.parallel.pipeline import CachedCorpusLoader

    def run_corpus_cached():
        loader = CachedCorpusLoader(
            cache_file, batch_size=batch, prefetch=2, sharding=wsh
        )
        for dev, status in loader:
            codes, delta = encode_i16(dev)
        return float(jnp.sum(jnp.abs(delta)))

    dt_ingest_cached = timed(run_corpus_cached, iters=2)

    # transport ceiling: a bare staged device_put of one int16 batch,
    # measured in the same process state as the ingest loops. When this
    # ceiling sits at/near the end-to-end ingest numbers, ingest is
    # TRANSPORT-bound on this rig — the software path (C++ direct
    # decode, PCM cache, contiguous staging, explicit puts) is not the
    # limiter. The tunnel's put latency swings ~50x between idle and
    # loaded process states (37 ms to ~2 s for the same 56 MB batch,
    # measured), so treat all ingest rows as rig-transport numbers.
    one = np.ascontiguousarray(np.load(cache_file, mmap_mode="r")[:batch])

    # honest completion signal: block_until_ready does NOT guarantee
    # device completion on this remote backend (CLAUDE.md) — end in a
    # scalar readback that cannot exist before the transfer landed
    @jax.jit
    def _touch(a):
        return jnp.sum(a[:, :: max(1, a.shape[1] // 8)].astype(jnp.float32))

    def _staged_put():
        return float(_touch(jax.device_put(one, wsh)))

    _staged_put()
    t_put = min(timed(_staged_put, iters=3) for _ in range(2))
    put_ceiling = (batch * samples / sr) / t_put
    os.unlink(cache_file)
    os.unlink(cache_file + ".meta.npz")

    # device-resident throughput: batches pre-staged, scan-chained
    steps = clips_n // batch
    xs = jnp.asarray(
        np.stack(
            [base * np.float32(1.0 - 0.2 * i / steps) for i in range(min(steps, 8))]
        )
    )

    @jax.jit
    def chain(c, xs):
        def body(acc, xi):
            codes, delta, _ = c.encode_quantized(xi)
            return acc + jnp.sum(jnp.abs(delta)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    dt_dev = timed(lambda: float(chain(codec, xs))) / xs.shape[0] * steps
    audio_s = clips_n * samples / sr
    thr_dev = audio_s / dt_dev
    thr_i16 = audio_s / dt_ingest_i16
    thr_cached = audio_s / dt_ingest_cached
    # Regression gates (non-quick only: quick shapes are noise-dominated):
    # device throughput and the best ingest path against recorded-nominal
    # floors — an end-to-end corpus encode regression fails this row.
    ok = True
    if not quick:
        ok = bool(
            thr_dev >= GATES["corpus_device_floor"]
            and max(thr_i16, thr_cached) >= GATES["corpus_ingest_floor"]
        )
    return {
        "config": "corpus_batched_encode",
        "clips": clips_n,
        "throughput_audio_s_per_s": round(thr_dev, 1),
        # end-to-end (ingest-bound) numbers, honest next to the device
        # number: f32 wire / int16 wire / cached-PCM memmap (epoch >= 2)
        "ingest_bound_audio_s_per_s": round(audio_s / dt_ingest, 1),
        "ingest_int16_wire_audio_s_per_s": round(thr_i16, 1),
        "ingest_cached_pcm_audio_s_per_s": round(thr_cached, 1),
        "ingest_put_ceiling_audio_s_per_s": round(put_ceiling, 1),
        "pass": ok,
    }


def config5_streaming(quick):
    import jax
    import jax.numpy as jnp

    from audiocodec_tpu import streaming
    from audiocodec_tpu.codec import Codec

    sr, n = 48000, 1024
    codec = Codec.create(sr, filters_n=n, bark_bands_n=64)
    minutes = 0.05 if quick else 60.0
    chunk_blocks = 32 if quick else 256
    total_blocks = int(minutes * 60 * sr) // n
    total_blocks -= total_blocks % chunk_blocks
    samples = total_blocks * n

    rng = np.random.default_rng(0)
    t = np.arange(samples) / sr
    wave = np.stack(
        [
            0.4 * np.sin(2 * np.pi * 440 * t),
            0.4 * np.sin(2 * np.pi * 554 * t),
        ],
        axis=-1,
    ).astype(np.float32)
    x = jnp.asarray(wave[None])

    stream_rt = jax.jit(
        lambda c, x: jnp.sum(
            jnp.abs(streaming.streaming_round_trip(c, x, chunk_blocks))
        )
    )
    dt = timed(lambda: float(stream_rt(codec, x)), iters=2)
    # production-precision variant: the streaming steps follow the dense
    # two-matmul formulation at dct_precision="default"
    codec_d = Codec.create(
        sr, filters_n=n, bark_bands_n=64, dct_precision="default"
    )
    dt_d = timed(lambda: float(stream_rt(codec_d, x)), iters=2)
    audio_s = samples / sr
    thr = audio_s / dt
    thr_d = audio_s / dt_d

    # Quality gates on a short prefix of the SAME stereo signal through
    # the SAME chunked path (deterministic quantized streaming): SNR for
    # gross regressions, NMR for psycho-model regressions SNR cannot see.
    n_head = max(1, min(4, total_blocks // chunk_blocks))
    head = x[:, : n_head * chunk_blocks * n]
    out = np.asarray(
        jax.jit(
            lambda c, x: streaming.streaming_round_trip(c, x, chunk_blocks)
        )(codec, head)
    )[:, n:-n]
    snr = snr_db(np.asarray(head), out)
    nmr = nmr_quantized(codec, head)

    # Actual .acs container bitrate on the head — stereo sines are the
    # run-length coder's best case (>99% zero codes) and a regression in
    # either quantizer or entropy coder shows up here first.
    import os
    import tempfile

    from audiocodec_tpu.io import stream_container as sc

    with tempfile.TemporaryDirectory() as td:
        acs = os.path.join(td, "bench.acs")
        sc.encode_stream(codec, head, acs, chunk_blocks=chunk_blocks)
        acs_bytes = os.path.getsize(acs)
    head_s = head.shape[1] / sr
    kbps = acs_bytes * 8 / head_s / 1000

    ok = bool(snr > GATES["streaming_snr_floor"] and nmr < GATES["nmr_ceiling"])
    health = 1.0
    h2d_mbps = None
    if not quick:
        # gate floors track measured rig weather, not a permanently
        # lowered constant (see transport_health)
        health, h2d_mbps = transport_health()
        ok = ok and bool(
            thr >= GATES["streaming_floor"] * health
            and thr_d >= GATES["streaming_default_floor"] * health
            and kbps <= GATES["streaming_kbps_ceiling"]
        )
    return {
        "config": "streaming_longform",
        "audio_minutes": round(audio_s / 60, 2),
        "channels": 2,
        "snr_db": float(round(snr, 2)),
        "nmr": float(round(nmr, 4)),
        "acs_kbps": float(round(kbps, 1)),
        "throughput_audio_s_per_s": round(thr, 1),
        "realtime_factor": round(thr, 1),
        "default_precision_audio_s_per_s": round(thr_d, 1),
        "transport_health": round(health, 3),
        "h2d_mbps": h2d_mbps,
        "pass": ok,
    }


def config6_lossless(quick):
    """Lossless archival mode: exactness is a hard gate, the per-class
    compression ratios catch coder/selector regressions, and throughput
    is gated on the host path (the mode is entropy-coder-bound; its
    device work is five shifted subtractions, so it runs pinned to the
    CPU backend — tunnel transfer would measure the rig, not the code)."""
    import jax

    from audiocodec_tpu import lossless

    cpu = jax.local_devices(backend="cpu")[0]
    rng = np.random.default_rng(0)
    secs = 2 if quick else 30
    sr = 44100
    t = np.arange(sr * secs) / sr
    l = (12000 * np.sin(2 * np.pi * 440 * t)
         + rng.normal(0, 120, t.size)).astype(np.int32)
    music = np.stack([l, (l * 0.9 + rng.normal(0, 90, t.size)).astype(np.int32)],
                     axis=1)
    sine = (20000 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
            ).astype(np.int32)[:, None]
    noise = rng.integers(-32768, 32767, size=(sr, 2), dtype=np.int16)
    silence = np.zeros((sr * 5, 2), dtype=np.int16)

    ratios = {}
    exact = True
    with jax.default_device(cpu):
        for name, x in [("music", music), ("sine", sine),
                        ("noise", noise), ("silence", silence)]:
            blob = lossless.encode_lossless(np.asarray(x, np.int32), sr)
            y, _, _ = lossless.decode_lossless(blob)
            exact = exact and bool(
                np.array_equal(np.asarray(x, np.int32), y)
            )
            ratios[name] = round(len(blob) / (x.size * 2), 4)

        blob = lossless.encode_lossless(music, sr)  # warm jit for shape
        enc_dt = timed(lambda: len(lossless.encode_lossless(music, sr)),
                       iters=2)
        dec_dt = timed(lambda: int(lossless.decode_lossless(blob)[0][0, 0]),
                       iters=2)
        # level-2 (quantized LPC) tier: exactness is the same hard gate;
        # the ratio gate is RELATIVE — the tier must actually beat the
        # fixed ladder on predictable content, else its margin logic
        # regressed. Throughput is informational (the tier is the
        # opt-in "max" mode; FLAC -8 is slow on purpose too).
        blob2 = lossless.encode_lossless(music, sr, level=2)
        y2, _, _ = lossless.decode_lossless(blob2)
        exact = exact and bool(np.array_equal(np.asarray(music, np.int32), y2))
        ratio_l2 = len(blob2) / (music.size * 2)
        enc2_dt = timed(
            lambda: len(lossless.encode_lossless(music, sr, level=2)),
            iters=2,
        )
        dec2_dt = timed(lambda: int(lossless.decode_lossless(blob2)[0][0, 0]),
                        iters=2)
    enc_thr = secs / enc_dt
    dec_thr = secs / dec_dt
    enc2_thr = secs / enc2_dt
    dec2_thr = secs / dec2_dt

    ok = exact and bool(
        ratios["music"] <= GATES["lossless_music_ratio"]
        and ratios["sine"] <= GATES["lossless_sine_ratio"]
        and ratios["noise"] <= GATES["lossless_noise_ratio"]
        and ratios["silence"] <= GATES["lossless_silence_ratio"]
        and ratio_l2 < ratios["music"]
        and ratio_l2 <= GATES["lossless_music_lpc_ratio"]
    )
    if not quick:
        ok = ok and bool(
            enc_thr >= GATES["lossless_encode_floor"]
            and dec_thr >= GATES["lossless_decode_floor"]
            and enc2_thr >= GATES["lossless_lpc_encode_floor"]
        )
    return {
        "config": "lossless_archival",
        "bit_exact": exact,
        "ratio": ratios,
        "ratio_music_lpc": round(ratio_l2, 4),
        "decode_audio_s_per_s": round(dec_thr, 1),
        "lpc_decode_audio_s_per_s": round(dec2_thr, 1),
        "throughput_audio_s_per_s": round(enc_thr, 1),
        "lpc_encode_audio_s_per_s": round(enc2_thr, 1),
        "pass": ok,
    }


CONFIGS = [
    config1_mdct_roundtrip,
    config2_psycho_twotone,
    config3_full_encode_decode,
    config3b_full_encode_decode_bf16,
    config4_corpus,
    config5_streaming,
    config6_lossless,
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument(
        "--only", type=str, default="", help="comma-separated config indices"
    )
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    only = {int(i) for i in args.only.split(",") if i}
    results = []
    for i, cfg in enumerate(CONFIGS, start=1):
        if only and i not in only:
            continue
        res = cfg(args.quick)
        results.append(res)
        print(json.dumps(res), flush=True)

    if only:
        # partial runs must not clobber the full RESULTS.md table
        print("(--only run: RESULTS.md left untouched)")
        return

    md = ["# Benchmark results", "", f"Backend: {jax.default_backend()}, "
          f"device: {jax.devices()[0].device_kind}", ""]
    md.append("| config | key metrics | throughput (audio-s/s) | pass |")
    md.append("|---|---|---|---|")
    for r in results:
        extras = {
            k: v
            for k, v in r.items()
            if k not in ("config", "throughput_audio_s_per_s", "pass")
        }
        md.append(
            f"| {r['config']} | {extras} | "
            f"{r.get('throughput_audio_s_per_s', '-')} | {r['pass']} |"
        )
    out = os.path.join(os.path.dirname(__file__), "RESULTS.md")
    # Preserve the hand-maintained sections (transport-ceiling notes,
    # campaign tables) that follow the generated config table: keep
    # everything from the first markdown section heading onward.
    tail = ""
    if os.path.exists(out):
        old = open(out).read()
        for marker in ("\nNote:", "\n## "):
            idx = old.find(marker)
            if idx != -1:
                tail = old[idx:]
                break
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n" + tail)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
