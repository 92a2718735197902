#!/bin/bash
# Probe the axon worker until it answers a COMPUTE op, then run the full
# bench (all stages, disk caches warm as a side effect). Unbuffered log.
# Usage: bash scripts/chipwatch.sh <logfile> [budget_s]
LOG=${1:-/tmp/chipwatch.log}
BUDGET=${2:-7200}
cd "$(dirname "$0")/.."
for i in $(seq 1 24); do
  if timeout 150 python -c "import jax, jax.numpy as jnp; jax.devices(); jnp.ones((8,8)).sum().block_until_ready(); print('ok')" 2>/dev/null | grep -q ok; then
    echo "$(date +%H:%M:%S) chip healthy (probe $i)" >> "$LOG"
    ZEROG_BENCH_BUDGET=$BUDGET ZEROG_BENCH_BACKEND_OK=1 \
      stdbuf -oL -eL python bench.py >> "$LOG" 2>&1
    echo "$(date +%H:%M:%S) bench done rc=$?" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) chip still wedged (probe $i)" >> "$LOG"
  sleep 300
done
echo "$(date +%H:%M:%S) gave up: chip never recovered" >> "$LOG"
exit 1
