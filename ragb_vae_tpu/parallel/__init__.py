"""Mesh / sharding / gradient-accumulation layer.

TPU-native stand-in for the reference's Accelerate + DeepSpeed ZeRO-2 +
NCCL stack (SURVEY.md §2.2-2.3): one SPMD program over a `Mesh`, batch
sharded on the "data" axis, optimizer state ZeRO-sharded via GSPMD
annotations, gradient accumulation as a scan.
"""
from ragb_vae_tpu.parallel.grad_accum import accumulated_grads, split_microbatches
from ragb_vae_tpu.parallel.mesh import (
    DATA_AXIS,
    maybe_init_distributed,
    batch_sharding,
    create_dp_tp_mesh,
    create_hybrid_mesh,
    create_mesh,
    create_training_mesh,
    pad_batch_to_mesh,
    slice_groups,
    put_global_batch,
    replicated,
    shard_batch,
)
from ragb_vae_tpu.parallel.sharding import (
    fsdp_sharding,
    replicated_tree,
    shard_tree,
    zero_sharding,
)
from ragb_vae_tpu.parallel.zero_step import (
    init_zero2_state,
    make_zero2_train_step,
    zero2_optimizer,
)

__all__ = [
    "DATA_AXIS",
    "maybe_init_distributed",
    "accumulated_grads",
    "batch_sharding",
    "fsdp_sharding",
    "create_dp_tp_mesh",
    "create_hybrid_mesh",
    "create_mesh",
    "create_training_mesh",
    "slice_groups",
    "pad_batch_to_mesh",
    "replicated",
    "replicated_tree",
    "put_global_batch",
    "shard_batch",
    "shard_tree",
    "split_microbatches",
    "zero_sharding",
    "init_zero2_state",
    "make_zero2_train_step",
    "zero2_optimizer",
]
