#!/usr/bin/env python
"""Headline benchmark: PRODUCTION encode/decode throughput on one chip.

Workload (BASELINE.md config 3): 10 s mono 44.1 kHz clips, filters_n=1024,
bark_bands_n=64, batched, one jit program — the deployable path: MDCT ->
tonality -> masking threshold -> quantize -> dequantize -> inverse MDCT
(round_trip_quantized, the codec a user actually ships) at
dct_precision="default". Both production configurations are measured —
float32 (quality default) and bfloat16 fast (speed deployment) — and the
headline value is the faster one with the path named; the f32 throughput
and both measured quantized SNRs ride along in the same JSON line. On the QUANTIZED path the HIGHEST-precision pin is
pointless: quantization noise sits ~60 dB above f32 matmul error, and the
measured quantized SNR changes by 0.004 dB (18.9549 vs 18.9593 dB) while
throughput doubles. Fidelity-critical no-noise paths keep HIGHEST (the
default) and are covered by benchmarks/run_benchmarks.py; dct_precision is
not bitstream-critical (step sizes derive from the transmitted sidecar on
both ends). The reference's noise-injection parity path is slower only
because threefry normal sampling dominates it (ops/pallas_noise.py).

Methodology notes (this is a remote-attached TPU):
* iterations are chained on-device with lax.scan over *fresh* input batches
  (loop-variant data, so XLA cannot hoist the encode out of the loop);
* the timed quantity ends in a single scalar host readback, because
  block_until_ready on the remote backend does not guarantee device
  completion — only a value transfer does; and
* every host call pays a ~26 ms tunnel round trip that FLUCTUATES with
  tunnel load, so device time is extracted as a slope: the same chained
  program is timed at two lengths and differenced —
  (t(L2) - t(L1)) / (L2 - L1) cancels the per-call constant exactly.

Reference baseline: TF 2.21 on 1 CPU core measures ~92 audio-seconds/sec on
its full lossy-encode chain — MDCT -> threshold -> NOISE INJECTION ->
inverse (BASELINE.md; the reference has no quantizer, so noise injection
IS its encode). vs_baseline therefore compares lossy-encode capability
for capability, not op for op: this framework's quantized chain replaces
the noise stage with real integer coding. Like-for-like numbers for the
noise-injection chain itself are in benchmarks/RESULTS.md (~950x f32
HIGHEST). Target: >= 100x on TPU v5e-1.

Budget discipline (round-3 lesson: the driver's run timed out with
NOTHING parsed): the script emits a COMPLETE headline JSON line as soon
as the first configuration is measured, then re-emits an enriched line
after each further stage — the driver keeps the LAST complete line, so
a timeout mid-stage still leaves a real number behind. An overall
wall-clock budget (env BENCH_BUDGET_S, default 480 s) skips remaining
stages rather than overrunning, and each config costs ONE compile (a
dynamic-trip-count fori_loop chain timed at two lengths) instead of two.

The last printed line is the result: {"metric", "value", "unit",
"vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

BASELINE_AUDIO_SEC_PER_SEC = 92.0  # reference TF-CPU, measured (BASELINE.md)

_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))


def _remaining():
    return _BUDGET_S - (time.monotonic() - _T0)


def _require_backend(deadline_s: float = 300.0):
    """Fail fast (one honest JSON error line) when the remote TPU tunnel
    is down: backend init then hangs indefinitely, which would otherwise
    turn the whole bench run into a silent timeout. The probe runs in a
    daemon thread because a hung init RPC cannot be cancelled."""
    import os
    import threading

    import jax

    got = {}

    def probe():
        try:
            got["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report, don't crash
            got["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(deadline_s)
    if "devices" in got:
        return
    err = got.get(
        "error", f"backend init exceeded {deadline_s:.0f}s (tunnel down?)"
    )
    out = {
        "metric": "encode_decode_throughput",
        "value": 0.0,
        "unit": "audio_sec_per_sec",
        "vs_baseline": 0.0,
        "error": f"TPU backend unavailable: {err}",
    }
    # Context for the reader: the last successful round's measurement of
    # the SAME benchmark (clearly labeled as prior — NOT this run's).
    try:
        import glob

        here = os.path.dirname(os.path.abspath(__file__))
        prior = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
        for p in reversed(prior):
            with open(p) as f:
                rec = json.load(f)
            parsed = rec.get("parsed") or {}
            if parsed.get("value"):
                out["last_good_round"] = os.path.basename(p)
                out["last_good"] = parsed
                break
    except Exception:  # noqa: BLE001 — context only, never fail the report
        pass
    print(json.dumps(out))
    os._exit(1)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _require_backend(deadline_s=min(240.0, max(_remaining(), 30.0)))

    import jax.numpy as jnp

    from audiocodec_tpu.codec import Codec

    sample_rate = 44100
    duration_s = 10.0
    filters_n = 1024
    batch = 32
    # ~1.7 ms/iter f32 / ~1.0 ms bf16: a 64-iteration slope delta is
    # ~60-110 ms of device time, well above the tunnel's RTT fluctuation
    iters_short, iters_long = 16, 80

    samples = int(sample_rate * duration_s) // filters_n * filters_n
    rng = np.random.default_rng(0)
    t = np.arange(samples) / sample_rate
    base = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1320 * t)
        + 0.05 * rng.normal(size=samples)
    ).astype(np.float32)
    scales = rng.uniform(0.5, 1.0, size=(iters_short, batch, 1, 1)).astype(
        np.float32
    )
    base8 = (
        np.broadcast_to(
            base[None, None, :, None], (iters_short, batch, samples, 1)
        )
        * scales
    )

    def best_of(fn, reps=4):
        best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - start)
        return best

    def measure_snr(codec, xs8):
        """Quantized round-trip SNR (dB) on the first resident batch."""
        x = xs8[0]
        out = np.asarray(
            jax.jit(codec.round_trip_quantized)(x).astype(jnp.float32)
        )[:, filters_n:-filters_n]
        ref = np.asarray(x.astype(jnp.float32), dtype=np.float64)
        err = ((ref - out.astype(np.float64)) ** 2).sum()
        return 10 * np.log10((ref**2).sum() / max(err, 1e-30))

    def measure(codec, xs8):
        # ONE compiled program per config: the trip count is a traced
        # scalar, so the two chain lengths share the compile (round 3's
        # two-scan layout paid two cold tunnel compiles per config)
        one = jnp.asarray(1.0, dtype=xs8.dtype)

        @jax.jit
        def chained(c, xs, iters):
            def body(i, acc):
                # cycle the resident batches, rescaled per step so the
                # encode stays loop-variant and cannot hoist
                x = xs[i % xs.shape[0]] * (
                    one + jnp.asarray(0.001, xs.dtype) * i.astype(xs.dtype)
                )
                out = c.round_trip_quantized(x)
                return acc + jnp.sum(jnp.abs(out).astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        i_s = jnp.asarray(iters_short, jnp.int32)
        i_l = jnp.asarray(iters_long, jnp.int32)
        # warmup / compile (host readback forces completion)
        float(chained(codec, xs8, i_s))
        float(chained(codec, xs8, i_l))
        t_short = best_of(lambda: float(chained(codec, xs8, i_s)))
        t_long = best_of(lambda: float(chained(codec, xs8, i_l)))
        per_iter = max((t_long - t_short) / (iters_long - iters_short), 1e-9)
        return batch * (samples / sample_rate) / per_iter

    # Stage order is budget order: the expected headline winner first so
    # the first emitted line already carries the real number, then the
    # quality-default ride-alongs, then the SNR garnish.
    results = {}
    snrs = {}

    def emit():
        named = {
            "bf16_int8": "round_trip_quantized bf16 fast_bf16 dct_precision=int8",
            "bf16": "round_trip_quantized bf16 fast_bf16 dct_precision=default",
            "f32": "round_trip_quantized f32 dct_precision=default",
        }
        best = max(results, key=results.get)
        out = {
            "metric": "encode_pipeline_throughput",
            "value": round(results[best], 1),
            "unit": "audio-sec/sec",
            "vs_baseline": round(results[best] / BASELINE_AUDIO_SEC_PER_SEC, 2),
            "path": named[best],
            "configs_measured": sorted(results),
            "budget_s": _BUDGET_S,
            "elapsed_s": round(time.monotonic() - _T0, 1),
        }
        if "f32" in results:
            out["f32_quantized_value"] = round(results["f32"], 1)
            out["f32_vs_baseline"] = round(
                results["f32"] / BASELINE_AUDIO_SEC_PER_SEC, 2
            )
        if "bf16" in results:
            out["bf16_default_value"] = round(results["bf16"], 1)
        if snrs:
            # NOTE: SNRs are for THIS file's workload (10 s 440+1320 Hz
            # two-tone + noise, B=32, N=1024) — intentionally different
            # from RESULTS.md config 3b's single-tone signal.
            out["snr_db"] = {k: round(float(v), 2) for k, v in snrs.items()}
            out["snr_signal"] = "two-tone(440,1320)+noise 10s B=32 N=1024"
        print(json.dumps(out), flush=True)

    xs_f32 = jnp.asarray(base8)
    xs_bf16 = jnp.asarray(base8, dtype=jnp.bfloat16)
    # Speed deployments run the Bark/threshold einsums one-pass too
    # (bark_precision="default"): measured +6.7% composed throughput
    # with IDENTICAL quantized SNR (18.93 dB) and NMR (0.0306) on this
    # workload — the threshold only picks step sizes, and the field is
    # recorded in container meta so both ends always agree
    # (docs/DESIGN.md §3d). The f32 quality default keeps HIGHEST.
    codec_i8 = Codec.create(
        sample_rate=sample_rate, filters_n=filters_n, bark_bands_n=64,
        compute_dtype=jnp.bfloat16, fast_bf16=True, dct_precision="int8",
        bark_precision="default",
    )
    codec_bf16 = Codec.create(
        sample_rate=sample_rate, filters_n=filters_n, bark_bands_n=64,
        compute_dtype=jnp.bfloat16, fast_bf16=True, dct_precision="default",
        bark_precision="default",
    )
    codec_f32 = Codec.create(
        sample_rate=sample_rate, filters_n=filters_n, bark_bands_n=64,
        dct_precision="default",
    )

    # Stage 1 — bfloat16 fast + int8 MXU transforms (the maximum-
    # throughput deployment — docs/DESIGN.md §3c: flat-int8 analysis
    # kernel, per-128-bin grouped-int8 synthesis kernel; measured
    # -0.08 dB SNR vs the "default" tier, inside the codec's own
    # calibration margin). This is the round-3 headline winner.
    results["bf16_int8"] = measure(codec_i8, xs_bf16)
    emit()

    # Stage 2 — bfloat16 fast (speed deployment without int8)
    if _remaining() > 30:
        results["bf16"] = measure(codec_bf16, xs_bf16)
        emit()

    # Stage 3 — float32 quantized (the quality-default deployment)
    if _remaining() > 30:
        results["f32"] = measure(codec_f32, xs_f32)
        emit()

    # Stage 4 — quantized round-trip SNRs (garnish; one extra compile per
    # config, so they go last and are skipped first under budget)
    for key, codec, xs in (
        ("bf16_int8", codec_i8, xs_bf16),
        ("bf16", codec_bf16, xs_bf16),
        ("f32", codec_f32, xs_f32),
    ):
        if key not in results or _remaining() <= 30:
            break
        snrs[key] = measure_snr(codec, xs)
    if snrs:
        emit()


if __name__ == "__main__":
    main()
