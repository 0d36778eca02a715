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
  --only f32_highest_n1024,bf16_fast_n1024,f32_high_n1024,f32_high_n2048,f32_highest_n2048,bf16_fast_n2048

step "composed_bench" python benchmarks/composed_bench.py

step "tpu hardware lane" python -m pytest tests/ -m tpu -q

step "bench.py headline" python bench.py

echo "campaign complete -> $LOG" | tee -a "$LOG"
