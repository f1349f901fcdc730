"""Offline data-generation pipelines (host-side, embarrassingly parallel).

SURVEY.md §1 L5: bucket prep for multilayer renders, PrismLayers
bucketers, and the LAION downloader. These run on CPU hosts (optionally
many, via worker pools or rank-modulo sharding), never on TPU.
"""
from ragb_vae_tpu.data_generation.rgba_buckets import (
    iterate_foreground_groups,
    process_sample,
    run_prepare,
)

__all__ = ["iterate_foreground_groups", "process_sample", "run_prepare"]
