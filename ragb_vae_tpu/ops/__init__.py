"""Pure-function core math. Everything here is jittable and side-effect free."""

from ragb_vae_tpu.ops.rgba import (
    ensure_alpha,
    to_vae_range,
    from_vae_range,
    composite_over_background,
    composite_over_white,
    composite_over_black,
    blend_to_white,
    checkerboard,
    composite_over_checkerboard,
)
from ragb_vae_tpu.ops.gaussian import DiagonalGaussian
from ragb_vae_tpu.ops.metrics import psnr, alpha_mae
from ragb_vae_tpu.ops.buckets import (
    round_to_multiple,
    should_exclude_size,
    bucket_for_size,
    bucket_assignment,
    parse_bucket_dims,
    format_bucket_key,
    MAX_SIDE,
    MAX_PIXELS,
    MULTIPLE,
    MIN_BUCKET_SIDE,
    FILTER_MIN_SIDE,
    FILTER_MAX_AR,
)
from ragb_vae_tpu.ops.triplet import (
    detail_augmented_triplet,
    split_triplet,
)
from ragb_vae_tpu.ops.packing import (
    pack_latents,
    unpack_latents,
    prepare_latent_image_ids,
)

__all__ = [
    "ensure_alpha",
    "to_vae_range",
    "from_vae_range",
    "composite_over_background",
    "composite_over_white",
    "composite_over_black",
    "blend_to_white",
    "checkerboard",
    "composite_over_checkerboard",
    "DiagonalGaussian",
    "psnr",
    "alpha_mae",
    "round_to_multiple",
    "should_exclude_size",
    "bucket_for_size",
    "bucket_assignment",
    "parse_bucket_dims",
    "format_bucket_key",
    "detail_augmented_triplet",
    "split_triplet",
    "pack_latents",
    "unpack_latents",
    "prepare_latent_image_ids",
    "MAX_SIDE",
    "MAX_PIXELS",
    "MULTIPLE",
    "MIN_BUCKET_SIDE",
    "FILTER_MIN_SIDE",
    "FILTER_MAX_AR",
]
