"""Pallas TPU kernels for the hot ops (SURVEY.md §2.4, §7.6).

Kernels fall back to equivalent XLA implementations off-TPU so the CPU
test mesh exercises identical numerics.
"""
from ragb_vae_tpu.ops.pallas.flash_attention import attention, chunked_attention_3d, flash_attention_fwd_3d
from ragb_vae_tpu.ops.pallas.int8_matmul import int8_matmul

__all__ = [
    "attention",
    "chunked_attention_3d",
    "flash_attention_fwd_3d",
    "int8_matmul",
]
