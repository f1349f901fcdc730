#!/bin/bash
# Pending-on-tunnel TPU measurements (round 3). Run top to bottom once
# `python -c "import jax; print(jax.devices())"` shows the chip again;
# each step is independent and safe to re-run.
set -x
cd "$(dirname "$0")/.."

# 1. On-chip memory analysis of the int8 sampler (CPU AOT showed no
#    dequant hoisting; confirm on the TPU pass pipeline before trusting 2.)
timeout 1200 python benchmarks/quant_aot.py --blocks mid
timeout 1800 python benchmarks/quant_aot.py --blocks full

# 2. Full-scale existence + warm-up on the chip (16 GB envelope check)
timeout 2400 python benchmarks/full_scale_smoke.py --size 512 --steps 1

# 3. THE headline serving number: full FLUX.1 (11.9 B) 20-step sampling
#    throughput on one chip via weight-only int8
timeout 3600 python benchmarks/sample_bench.py --blocks full --quant int8 --batches 1

# 4. Regression check of the round-2/3 headline + training metrics
#    (train_step needs the 512^2 b4 accum-2 operating point explicitly:
#    its defaults inherit --size 1024 --batches 12, which OOMs a 16 GB v5e)
timeout 1800 python bench.py
timeout 1800 python bench.py --metric train_step --size 512 --batches 4 --grad-accum 2

# 5. Optimizer-state host offload (training.optimizer_offload):
#    (a) overhead at the 512^2 b4 accum-2 operating point,
#    (b) does 1024^2 microbatch-2 now fit (OOM'd without offload —
#        results.md "Training envelope")?
timeout 1800 python bench.py --metric train_step --size 512 --batches 4 --grad-accum 2 --optimizer-offload
timeout 1800 python bench.py --metric train_step --size 1024 --batches 2 --optimizer-offload

# 6. Trained-weights numerics (VERDICT r2 weak #4): 300 real train steps on
#    structured synthetic RGBA, then fused-bf16 vs torch-fp32 PSNR delta
#    through the trained weights (target <= 0.1 dB)
timeout 3600 python benchmarks/trained_psnr.py --steps 300 --size 256 --batch 2

# 7. Serving-daemon load bench: batcher throughput + latency percentiles
#    (mid-size, then full-scale int8 — the single-chip serving headline)
timeout 3600 python benchmarks/serving_bench.py --clients 8 --requests 32
timeout 5400 python benchmarks/serving_bench.py --blocks full --quant int8 --clients 4 --requests 8
