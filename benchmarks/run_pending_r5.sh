#!/bin/bash
# Round-5 TPU measurement queue (run serially against the tunneled chip).
# Logs tee'd into benchmarks/logs/r5/; transcribe into results.md.
# Ordered by value: the never-measured full-scale QLoRA step first, then
# the train-step remat A/B (feeds the 43.8%-MFU gap-vs-ceiling ruling),
# then the auto-batch serving validation, then the headline re-measure.
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

# 1. VERDICT r4 item 2: full-scale QLoRA training step, measured
run lora_full_int8 4200 python benchmarks/lora_step_bench.py \
    --blocks full --quant int8

# 2. train-step remat A/B: is the 44%-MFU gap remat's extra work?
#    (512^2 microbatch-2 should fit without remat: activations ~4x under
#    the 1024^2 envelope that measured 22.17G)
#    NOTE first attempt 2026-08-20: remote tpu_compile_helper SIGKILL(9)
#    on the no-remat program (60 MB MLIR) — likely tunnel-host OOM;
#    retry, and if it repeats treat no-remat-at-b4 as unmeasurable and
#    fall back to --batches 2.
run train_step_noremat 2400 python bench.py --metric train_step --size 512 \
    --batches 4 --grad-accum 2 --iters 10 --no-remat
grep -q '"metric"' "$LOGDIR/train_step_noremat.log" || \
  run train_step_noremat_b2 2400 python bench.py --metric train_step --size 512 \
      --batches 2 --grad-accum 4 --iters 10 --no-remat
run train_step_remat_ref 2400 python bench.py --metric train_step --size 512 \
    --batches 4 --grad-accum 2 --iters 10

# 3. VERDICT r4 item 3: serving bench at full scale through the measured
#    auto-batch policy (warmup compiles b1 AND b4 programs — long)
run serving_full_int8_auto 5400 python benchmarks/serving_bench.py \
    --blocks full --quant int8 --clients 4 --requests 8

# 4. full-scale int8 sampling re-measure repeat (epilogue path). NOTE:
#    the persistent XLA compile cache does NOT hit across processes on
#    the tunneled axon backend (observed round 5: rep2 recompiled the
#    full ~25 min despite run1's warm cache) — budget every full-scale
#    run for host-build (~10 min) + upload (~2) + compile (~25) + run
run sample_full_int8_remeasure_rep2 3300 python benchmarks/sample_bench.py \
    --blocks full --quant int8 --batches 1
