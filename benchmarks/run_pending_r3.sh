#!/bin/bash
# Sequential runner for the remaining round-3 on-chip measurements
# (tpu_pending.sh items 3-7), ordered by value. One chip — never
# co-resident programs (HBM fragmentation kills b>=2 runs).
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_r3
mkdir -p "$LOG"

# Fast headline regressions first (also warms bench.py's on-chip cache
# so a later tunnel outage falls back to fresh numbers).
timeout 1800 python bench.py                                   >"$LOG/bench_headline.log" 2>&1
timeout 1800 python bench.py --metric train_step --size 512 --batches 4 --grad-accum 2 \
                                                               >"$LOG/bench_train.log" 2>&1

# THE serving headline: full FLUX.1 (11.9 B) 20-step int8 sampling.
timeout 3600 python benchmarks/sample_bench.py --blocks full --quant int8 --batches 1 \
                                                               >"$LOG/sample_full_int8.log" 2>&1

# Optimizer-state host offload: overhead + does 1024^2 microbatch-2 fit.
timeout 1800 python bench.py --metric train_step --size 512 --batches 4 --grad-accum 2 --optimizer-offload \
                                                               >"$LOG/bench_train_offload.log" 2>&1
timeout 1800 python bench.py --metric train_step --size 1024 --batches 2 --optimizer-offload \
                                                               >"$LOG/bench_train_1024b2_offload.log" 2>&1

# Trained-weights numerics: 300 real steps then fused-bf16 PSNR delta.
timeout 3600 python benchmarks/trained_psnr.py --steps 300 --size 256 --batch 2 \
                                                               >"$LOG/trained_psnr.log" 2>&1

# Serving-daemon load bench (mid-size, then full-scale int8).
timeout 3600 python benchmarks/serving_bench.py --clients 8 --requests 32 \
                                                               >"$LOG/serving_mid.log" 2>&1
timeout 5400 python benchmarks/serving_bench.py --blocks full --quant int8 --clients 4 --requests 8 \
                                                               >"$LOG/serving_full_int8.log" 2>&1

echo ALL_DONE
