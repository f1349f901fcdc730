#!/bin/bash
# Pending-on-tunnel TPU measurements. QUEUE EMPTY as of 2026-08-19:
# everything from the round-3 queue — full-scale int8 sampling, serving
# percentiles, trained-weights PSNR, the 4.90-vs-4.65 variance ruling,
# and both optimizer-offload rows (after the memory-space placement fix)
# — is measured and transcribed into benchmarks/results.md ("Round 4"
# sections). Raw logs: benchmarks/logs/r4/.
#
# Template for future queued measurements:
set -x
cd "$(dirname "$0")/.."
LOGDIR=benchmarks/logs/r4
mkdir -p "$LOGDIR"

# ADVICE r3: do not burn serial timeouts against a dead tunnel.
timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu', jax.devices()" \
  || { echo "TPU tunnel down — aborting pending run"; exit 1; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" 2>&1 | tee "$LOGDIR/$name.log"
}

echo "Nothing pending."
