#!/bin/bash
# Self-terminating tunnel watcher: probe every 5 minutes (ATTEMPTS
# times, default 144 = 12 h); the moment the backend answers, run the
# full TPU campaign. Launch detached:
#   setsid nohup bash benchmarks/auto_campaign.sh &
# Logs to benchmarks/auto_campaign.log; PID in /tmp/auto_campaign.pid.
set -u
ATTEMPTS="${ATTEMPTS:-144}" 
cd "$(dirname "$0")/.."
LOG=benchmarks/auto_campaign.log
echo $$ > /tmp/auto_campaign.pid
echo "[$(date +%H:%M:%S)] watcher started" >> "$LOG"
for attempt in $(seq 1 "$ATTEMPTS"); do
  if timeout 280 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import jax.numpy as jnp
jax.devices()
print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))
" >> "$LOG" 2>&1; then
    echo "[$(date +%H:%M:%S)] tunnel UP (attempt $attempt) — campaign" >> "$LOG"
    bash benchmarks/tpu_campaign.sh benchmarks/campaign_auto.log >> "$LOG" 2>&1
    echo "[$(date +%H:%M:%S)] campaign finished" >> "$LOG"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] attempt $attempt: still down" >> "$LOG"
  sleep 300
done
echo "[$(date +%H:%M:%S)] gave up after $ATTEMPTS attempts" >> "$LOG"
