#!/bin/bash
# Round-5 follow-up TPU queue: measurements for work landed AFTER the main
# r5 queue started. Chained behind run_pending_r5.sh by the watcher.
set -x
cd "$(dirname "$0")/.."
LOGDIR=benchmarks/logs/r5
mkdir -p "$LOGDIR"

timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu', jax.devices()" \
  || { echo "TPU tunnel down — aborting pending run"; exit 1; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" 2>&1 | tee "$LOGDIR/$name.log"
}

# Selective remat sweet spot: half the recompute at half the memory
# saving (commit 1a5032d). Compare against the noremat/remat A/B rows.
run train_step_remathalf 2400 python bench.py --metric train_step --size 512 \
    --batches 4 --grad-accum 2 --iters 10 --remat-mode half

# Retry of the failed r5 lora_full_int8 item with exception detail now
# printed (all three batches died as bare "JaxRuntimeError" — suspect
# tunnel-host compile OOM, same signature as the r5 noremat SIGKILL that
# succeeded on retry).
run lora_full_int8_retry 4200 python benchmarks/lora_step_bench.py \
    --blocks full --quant int8
