#!/bin/bash
# The pending radix-kernel hardware campaign, runnable the moment the
# remote-TPU tunnel returns (it has been down for whole sessions at a
# stretch — this packages every blocked measurement as one command).
#
#   bash benchmarks/tpu_campaign.sh [logfile]
#
# Steps (each independently tee'd to the log; a failure skips forward):
#  1. backend probe (fail fast if the tunnel is still down)
#  2. radix parity smoke on the real chip
#  3. kernel_bench rows where the radix design could change the winner
#  4. composed_bench radix column (whole-pipeline effect)
#  5. the -m tpu hardware test lane
#  6. bench.py headline
#
# Afterwards: read the kernel_bench/composed_bench rows; if radix wins
# where "auto" currently resolves to "mono" (mdct.py), flip the auto
# table, update docs/DESIGN.md §3, and re-run step 6.
set -u
LOG=${1:-benchmarks/campaign_$(date +%Y%m%d_%H%M).log}
cd "$(dirname "$0")/.."

step() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  timeout "${STEP_TIMEOUT:-3600}" "$@" 2>&1 | tee -a "$LOG"
  echo "--- exit: $? ---" | tee -a "$LOG"
}

step "backend probe" python - <<'EOF'
import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((256, 256))
print("devices:", d, "| matmul:", float((x @ x).sum()),
      "| init s:", round(time.time() - t0, 1))
EOF
grep -q "matmul: " "$LOG" || { echo "TUNNEL STILL DOWN — aborting" | tee -a "$LOG"; exit 1; }

step "radix parity smoke" python - <<'EOF'
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from audiocodec_tpu.mdct import MDCT
for n, dtype, fast, prec in [
    (1024, jnp.float32, False, "highest"),
    (1024, jnp.bfloat16, True, "default"),
    (2048, jnp.float32, False, "highest"),
]:
    m = MDCT.create(n, compute_dtype=dtype, fast_bf16=fast,
                    dct_precision=prec)
    mr = MDCT.create(n, compute_dtype=dtype, fast_bf16=fast,
                     dct_precision=prec, use_pallas=True,
                     pallas_kernel="radix")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8 * n, 1)), dtype=dtype)
    f = np.abs(np.asarray(mr.transform(x), np.float32)
               - np.asarray(m.transform(x), np.float32)).max()
    y = m.transform(x)
    i = np.abs(np.asarray(mr.inverse_transform(y), np.float32)
               - np.asarray(m.inverse_transform(y), np.float32)).max()
    print(f"N={n} {np.dtype(dtype).name} {prec}: fwd err {f:.2e}, "
          f"inv err {i:.2e}")
EOF

step "kernel_bench (radix-relevant rows)" python benchmarks/kernel_bench.py \
  --only f32_highest_n1024,bf16_fast_n1024,f32_high_n1024,f32_high_n2048,f32_highest_n2048,bf16_fast_n2048,bf16_int8_n1024,bf16_int8_n2048

step "composed_bench" python benchmarks/composed_bench.py

step "int8 matmul probes" bash -c \
  "python benchmarks/int8_probe.py && python benchmarks/pallas_int8_probe.py"

step "tpu hardware lane" python -m pytest tests/ -m tpu -q

step "coded-feature device cost (bs/tmask/tns/nf)" python - <<'EOF'
# Slope-timed composed encode cost of the coded-path features on the
# real chip: quantize_frames baseline vs +tmask vs +bs vs the full
# ladder. bs adds one [N,N] HIGHEST einsum + a where; tmask adds
# log-doubling maxes — both should be small next to the MDCT+psycho
# core. Chains feed abs() back into the input (linear-chain trap).
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from audiocodec_tpu.codec import Codec

codec = Codec.create(44100, filters_n=1024, bark_bands_n=64)
codec_def = Codec.create(44100, filters_n=1024, bark_bands_n=64,
                         dct_precision="default")
B, SECONDS = 32, 10
n = 1024
samples = SECONDS * 44100 // n * n
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(
    (0.3 * rng.standard_normal((B, samples, 1))).astype(np.float32)
))

def chain(fn, iters):
    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(c)
            # nonlinear feedback so XLA cannot decouple iterations
            probe = jnp.abs(out[0].astype(jnp.float32)).mean() * 1e-6
            return c * (1.0 + probe * 0.0) + probe.astype(c.dtype), out[0][0, 0, 0, 0]
        return jax.lax.scan(body, x0, None, length=iters)[1]
    return run

variants = {
    "baseline": lambda v: codec.quantize_frames(codec.mdct.transform(v)),
    "tmask": lambda v: codec.quantize_frames(codec.mdct.transform(v), tmask=130.0),
    "bs": lambda v: codec.quantize_frames(codec.mdct.transform(v), bs=True),
    "full": lambda v: codec.encode_frames(
        codec.mdct.transform(v), tns=True, nf=True, tmask=130.0, bs=True,
        bwe=True
    ),
    # the default-precision ladder: block switching now follows the
    # codec's precision knob (one-pass basis einsum instead of the
    # HIGHEST pin), so its marginal cost should shrink ~3-6x here
    "baseline@default": lambda v: codec_def.quantize_frames(
        codec_def.mdct.transform(v)),
    "bs@default": lambda v: codec_def.quantize_frames(
        codec_def.mdct.transform(v), bs=True),
}
for name, fn in variants.items():
    # slope-timed with chains long enough that the differenced time
    # (~tens of ms) dwarfs tunnel-RTT fluctuation (a 4/12 split once
    # measured a NEGATIVE baseline); best-of-3 on each length
    times = {}
    for iters in (16, 64):
        run_i = chain(fn, iters)
        float(run_i(x).sum())  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_i(x).sum())
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    per_iter = (times[64] - times[16]) / 48
    thr = B * SECONDS / per_iter
    print(f"{name}: {per_iter*1e3:.2f} ms/encode, {thr:,.0f} audio-s/s")
EOF

step "serving throughput" python benchmarks/serve_bench.py \
  --clients 8 --requests 64 --seconds 2.0

step "serve transport decomposition" python benchmarks/serve_probe.py

step "composed stage profile (int8 flagship)" python \
  benchmarks/stage_profile.py --config bf16_int8 --bark-precision default

step "bench.py headline" python bench.py

echo "campaign complete -> $LOG" | tee -a "$LOG"
