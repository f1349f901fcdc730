#!/bin/bash
# Round-5 follow-up TPU queue: runs AFTER run_pending_r5.sh (chained by a
# watcher on its PID). Two jobs:
#  1. The remat A/B trio measured back-to-back under the SAME host load
#     (the first remat_ref re-measure read 4.444 vs the pinned 4.65 —
#     its timed window overlapped a concurrent verify compile + the
#     pytest suite; these reruns are the clean comparison set).
#  2. Retry of the failed lora_full_int8 item with exception detail now
#     printed (all three batches died as bare "JaxRuntimeError").
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

run lora_full_int8_retry 4200 python benchmarks/lora_step_bench.py \
    --blocks full --quant int8

# remat A/B trio + the everything-resident point, one quiet block
run train_step_remat_ref_clean 2400 python bench.py --metric train_step \
    --size 512 --batches 4 --grad-accum 2 --iters 10
run train_step_noremat_clean 2400 python bench.py --metric train_step \
    --size 512 --batches 4 --grad-accum 2 --iters 10 --no-remat
run train_step_remathalf 2400 python bench.py --metric train_step \
    --size 512 --batches 4 --grad-accum 2 --iters 10 --remat-mode half
run train_step_noremat_lpipsres 2400 python bench.py --metric train_step \
    --size 512 --batches 4 --grad-accum 2 --iters 10 --no-remat --lpips-no-remat
