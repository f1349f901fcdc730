#!/bin/bash
# Round-4 pending-on-tunnel TPU measurements, HEADLINE FIRST (VERDICT r3
# item 2). Gated on tunnel liveness (ADVICE r3); logs tee'd into the repo
# (benchmarks/logs/r4/, gitignored) so a reboot cannot lose them before
# transcription into results.md.
set -x
cd "$(dirname "$0")/.."
LOGDIR=benchmarks/logs/r4
mkdir -p "$LOGDIR"

# ADVICE r3: do not burn eight serial timeouts against a dead tunnel.
timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu', jax.devices()" \
  || { echo "TPU tunnel down — aborting pending run"; exit 1; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" 2>&1 | tee "$LOGDIR/$name.log"
}

# (a) THE serving headline: full FLUX.1 (11.9 B) 20-step sampling
#     throughput on one chip via weight-only int8 (replaces the
#     ">=0.167 img/s est." in results.md with a measured number).
run sample_full_int8 5400 python benchmarks/sample_bench.py --blocks full --quant int8 --batches 1

# (b) Regression check of the single-chip training/throughput headlines
#     (the 512^2 b4 accum2 point x3 for the README 4.90-vs-4.669 variance
#     ruling, VERDICT r3 weak #4).
run bench_headline 1800 python bench.py
run train_512_r1 1800 python bench.py --metric train_step --size 512 --batches 4 --grad-accum 2
run train_512_r2 1800 python bench.py --metric train_step --size 512 --batches 4 --grad-accum 2
run train_512_r3 1800 python bench.py --metric train_step --size 512 --batches 4 --grad-accum 2

# (c) Trained-weights numerics: 300 real train steps, then fused-bf16 vs
#     torch-fp32 PSNR delta through trained weights (target <= 0.1 dB).
run trained_psnr 3600 python benchmarks/trained_psnr.py --steps 300 --size 256 --batch 2

# (d) Optimizer-state host offload: overhead at the 512^2 point, and does
#     1024^2 microbatch-2 now fit.
run offload_512 1800 python bench.py --metric train_step --size 512 --batches 4 --grad-accum 2 --optimizer-offload
run offload_1024 1800 python bench.py --metric train_step --size 1024 --batches 2 --optimizer-offload

# (e) Serving-daemon load bench on-chip: batcher throughput + latency
#     percentiles (mid-size, then the full-scale int8 headline config).
run serving_mid 3600 python benchmarks/serving_bench.py --clients 8 --requests 32
run serving_full_int8 5400 python benchmarks/serving_bench.py --blocks full --quant int8 --clients 4 --requests 8

# (f) int8 sampler memory analysis on the real pass pipeline.
run quant_aot_full 1800 python benchmarks/quant_aot.py --blocks full

echo "DONE — transcribe $LOGDIR/*.log into benchmarks/results.md"
