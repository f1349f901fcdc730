"""ragb_vae_tpu — TPU-native RGBA-VAE + layered-diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch stack (`jaejung-dev/ragb-vae`): RGBA adaptation of pretrained RGB
image VAEs (Flux/Qwen-Image AutoencoderKL), AlphaVAE-style training on
bucketed multi-resolution RGBA layer datasets, and FLUX.1-Kontext
"text_alpha" LoRA fine-tuning with flow matching.

Design principles (TPU-first, not a port):
- channels-last (NHWC) tensor layout everywhere: PIL decodes to HWC with no
  transpose and XLA's TPU conv emitters prefer NHWC.
- functional models (flax.linen) with explicit parameter pytrees so weight
  surgery (RGB->RGBA widening, LoRA grafting) is plain tree manipulation.
- one jitted train step per resolution bucket; compile-cache keyed on shape.
- SPMD via `jax.sharding.Mesh(("data",))`: batch sharded on the data axis,
  parameters replicated, optimizer state ZeRO-sharded over the data axis.
- explicit PRNG threading replaces torch's implicit global RNG.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import ragb_vae_tpu` light; heavy deps
    like flax load only when a symbol is touched)."""
    import importlib

    lazy = {
        "RgbaVAE": "ragb_vae_tpu.models.rgba_vae",
        "AutoencoderConfig": "ragb_vae_tpu.models.vae_config",
        "AlphaVaeLossConfig": "ragb_vae_tpu.models.losses",
        "FluxTextAlphaModel": "ragb_vae_tpu.models.flux_kontext_textalpha",
        "FluxTransformer2D": "ragb_vae_tpu.models.flux_transformer",
        "FluxTransformerConfig": "ragb_vae_tpu.models.flux_transformer",
        "FlowMatchEulerScheduler": "ragb_vae_tpu.models.scheduler",
        "RgbaComponentDataset": "ragb_vae_tpu.data.component_dataset",
        "create_component_dataloader": "ragb_vae_tpu.data.component_dataset",
        "MixedBucketDataset": "ragb_vae_tpu.data.bucket_dataset",
        "BucketBatchSampler": "ragb_vae_tpu.data.sampler",
        "TextAlphaBucketDataset": "ragb_vae_tpu.data.text_alpha_dataset",
        "MultiLayerDataset": "ragb_vae_tpu.data.multilayer_dataset",
        "DataLoader": "ragb_vae_tpu.data.loader",
        "load_config": "ragb_vae_tpu.config",
        "run_stage": "ragb_vae_tpu.training",
        "train_rgba_vae": "ragb_vae_tpu.training",
        "create_mesh": "ragb_vae_tpu.parallel",
    }
    if name in lazy:
        module = importlib.import_module(lazy[name])
        return getattr(module, name)
    raise AttributeError(f"module 'ragb_vae_tpu' has no attribute '{name}'")
