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
