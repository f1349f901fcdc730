"""Model zoo: RGBA VAE, AlphaVAE losses, Flux-Kontext text-alpha stack.

Public surface parity with /root/reference/src/models/__init__.py:6-31.
"""

from ragb_vae_tpu.models.flux_kontext_textalpha import (
    FluxTextAlphaModel,
    encode_empty_prompt,
    load_rgba_vae_from_path,
    load_scheduler,
    load_transformer,
    read_lora_metadata,
    write_lora_metadata,
)
from ragb_vae_tpu.models.flux_transformer import (
    FluxTransformer2D,
    FluxTransformerConfig,
)
from ragb_vae_tpu.models.scheduler import FlowMatchEulerScheduler
from ragb_vae_tpu.models.losses import (
    AlphaVaeLossConfig,
    alphavae_reconstruction_loss,
    kl_loss,
    perceptual_composites,
    reduce_loss,
)
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae import AutoencoderKL
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import (
    adapt_params_to_rgba,
    load_autoencoder_params,
    save_autoencoder_params,
)
from ragb_vae_tpu.ops.rgba import (
    composite_over_background,
    composite_over_black,
    composite_over_white,
)

# Back-compat alias mirroring the reference's AlphaVaeLoss class name.
AlphaVaeLoss = AlphaVaeLossConfig

__all__ = [
    "AlphaVaeLoss",
    "FlowMatchEulerScheduler",
    "FluxTextAlphaModel",
    "FluxTransformer2D",
    "FluxTransformerConfig",
    "encode_empty_prompt",
    "load_rgba_vae_from_path",
    "load_scheduler",
    "load_transformer",
    "read_lora_metadata",
    "write_lora_metadata",
    "AlphaVaeLossConfig",
    "AutoencoderKL",
    "AutoencoderConfig",
    "RgbaVAE",
    "adapt_params_to_rgba",
    "alphavae_reconstruction_loss",
    "composite_over_background",
    "composite_over_black",
    "composite_over_white",
    "kl_loss",
    "load_autoencoder_params",
    "perceptual_composites",
    "reduce_loss",
    "save_autoencoder_params",
]
