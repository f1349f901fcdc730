"""Flux-Kontext text-alpha model: transformer + RGBA VAE + flow matching.

Parity with the reference `FluxTextAlphaModel`
(src/models/flux_kontext_textalpha.py:203-500) re-architected for JAX:
parameters travel explicitly, RNG is threaded through keys, and both the
training loss and the full sampling loop are single jitted programs
(`lax.fori_loop` over denoising steps instead of a Python loop around
per-step graph launches).

Faithfully reproduced quirks:
- in-context conditioning by concatenating packed cond+target token
  sequences, with the SAME latent-image-id grid repeated for both halves
  (:387-390, :468-471);
- per-step re-noising in `sample` — fresh noise is injected at every
  denoising step (`noisy_target = (1-σ)·latents + σ·randn`, :463);
- logit-normal timestep sampling with index clamping (:365-380), SD3
  weighting (identically 1.0 for "logit_normal", :410-414);
- guidance tensor (3.5) only when the checkpoint is guidance-distilled
  (:302-313).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ragb_vae_tpu.models.flux_transformer import (
    FluxTransformer2D,
    FluxTransformerConfig,
)
from ragb_vae_tpu.models.flux_weights import (
    load_flux_transformer_params,
    lora_params_to_peft_state,
    merge_params,
    peft_state_to_lora_params,
    split_lora_params,
)
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import (
    FlowMatchEulerConfig,
    FlowMatchEulerScheduler,
    calc_mu,
    compute_density_for_timestep_sampling,
    compute_loss_weighting_for_sd3,
)
from ragb_vae_tpu.models.weights import load_autoencoder_params
from ragb_vae_tpu.ops.packing import (
    pack_latents,
    prepare_latent_image_ids,
    unpack_latents,
)

Array = jnp.ndarray
PyTree = Any

EMPTY_PROMPT_FILE = "empty_prompt_embeds.npz"


# ---------------------------------------------------------------------------
# Loaders (parity with flux_kontext_textalpha.py:22-146)
# ---------------------------------------------------------------------------
def load_transformer(
    model_path: Union[str, Path],
    *,
    subfolder: str = "transformer",
) -> Tuple[FluxTransformerConfig, PyTree]:
    from ragb_vae_tpu.models.quantize import (
        is_quantized_checkpoint,
        load_quantized_transformer,
    )

    directory = Path(model_path) / subfolder if subfolder else Path(model_path)
    if is_quantized_checkpoint(directory):
        return load_quantized_transformer(directory)
    return load_flux_transformer_params(model_path, subfolder)


def _tree_is_quantized(params: PyTree) -> bool:
    paths = jax.tree_util.tree_leaves_with_path(params)
    return any(getattr(k, "key", None) == "kernel_q" for path, _ in paths for k in path)


def load_scheduler(model_path: Union[str, Path]) -> FlowMatchEulerScheduler:
    cfg_path = Path(model_path) / "scheduler" / "scheduler_config.json"
    config = FlowMatchEulerConfig.from_json(cfg_path) if cfg_path.exists() else FlowMatchEulerConfig()
    return FlowMatchEulerScheduler(config)


def load_rgba_vae_from_path(
    vae_path: Union[str, Path], *, subfolder: str = "ae", dtype=jnp.float32
) -> Tuple[RgbaVAE, PyTree]:
    """RGB checkpoints are widened to RGBA deterministically (the reference's
    ignore_mismatched_sizes + restore dance, :56-83, made explicit)."""
    try:
        config, params = load_autoencoder_params(vae_path, subfolder, adapt_to_rgba=True)
    except FileNotFoundError:
        config, params = load_autoencoder_params(vae_path, None, adapt_to_rgba=True)
    model = RgbaVAE(config=config, dtype=dtype)
    return model, params


def encode_empty_prompt(
    model_path: Union[str, Path],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(prompt_embeds, pooled_prompt_embeds, text_ids) for the empty prompt.

    Runs the CLIP+T5 encoders once via `transformers` (torch, host CPU) from
    LOCAL checkpoint dirs — this is startup-time work the reference also does
    once and caches in memory (:86-146). Precomputed embeddings stored as
    `empty_prompt_embeds.npz` beside the checkpoint take priority (the TPU
    pod has no hub access). CLIP/T5 hidden-dim mismatch falls back to the
    T5-only stream like the reference (:139-142).
    """
    model_path = Path(model_path)
    cached = model_path / EMPTY_PROMPT_FILE
    if cached.exists():
        data = np.load(cached)
        return data["prompt_embeds"], data["pooled_prompt_embeds"], data["text_ids"]

    import torch
    from transformers import CLIPTextModel, CLIPTokenizer, T5EncoderModel, T5TokenizerFast

    tokenizer_one = CLIPTokenizer.from_pretrained(model_path / "tokenizer")
    tokenizer_two = T5TokenizerFast.from_pretrained(model_path / "tokenizer_2")
    text_encoder_one = CLIPTextModel.from_pretrained(model_path / "text_encoder")
    text_encoder_two = T5EncoderModel.from_pretrained(model_path / "text_encoder_2")
    for m in (text_encoder_one, text_encoder_two):
        m.eval()

    empty = [""]
    inputs_one = tokenizer_one(
        empty, padding="max_length", max_length=tokenizer_one.model_max_length,
        truncation=True, return_tensors="pt",
    )
    inputs_two = tokenizer_two(
        empty, padding="max_length", max_length=tokenizer_two.model_max_length,
        truncation=True, return_tensors="pt",
    )
    with torch.no_grad():
        prompt_embeds = text_encoder_one(**inputs_one).last_hidden_state
        prompt_embeds_2 = text_encoder_two(**inputs_two).last_hidden_state
        pooled = text_encoder_one.text_model.final_layer_norm(prompt_embeds)[:, 0]

    if prompt_embeds.shape[-1] == prompt_embeds_2.shape[-1]:
        prompt = torch.cat([prompt_embeds, prompt_embeds_2], dim=1)
    else:
        prompt = prompt_embeds_2
    text_ids = np.zeros((prompt.shape[1], 3), dtype=np.float32)
    out = (
        prompt.float().numpy(),
        pooled.float().numpy(),
        text_ids,
    )
    np.savez(cached, prompt_embeds=out[0], pooled_prompt_embeds=out[1], text_ids=out[2])
    return out


def save_empty_prompt_embeds(
    path: Union[str, Path], prompt_embeds, pooled_prompt_embeds, text_ids
) -> None:
    np.savez(
        Path(path) / EMPTY_PROMPT_FILE,
        prompt_embeds=np.asarray(prompt_embeds, np.float32),
        pooled_prompt_embeds=np.asarray(pooled_prompt_embeds, np.float32),
        text_ids=np.asarray(text_ids, np.float32),
    )


# ---------------------------------------------------------------------------
# LoRA metadata (flux_kontext_textalpha_lora.py:58-76)
# ---------------------------------------------------------------------------
def write_lora_metadata(
    directory: Union[str, Path],
    *,
    model_id: str,
    rank: int,
    lora_alpha: float,
    dtype: str,
    step: int,
) -> None:
    meta = {
        "model_id": model_id,
        "rank": int(rank),
        "lora_alpha": float(lora_alpha),
        "dtype": dtype,
        "step": int(step),
    }
    Path(directory).mkdir(parents=True, exist_ok=True)
    (Path(directory) / "metadata.json").write_text(json.dumps(meta, indent=2))


def read_lora_metadata(directory: Union[str, Path]) -> Optional[Dict[str, Any]]:
    path = Path(directory) / "metadata.json"
    if not path.exists():
        return None
    return json.loads(path.read_text())


# ---------------------------------------------------------------------------
# The model
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class FluxTextAlphaModel:
    """Static container; parameters are explicit at every call."""

    transformer_config: FluxTransformerConfig
    vae: RgbaVAE
    scheduler: FlowMatchEulerScheduler
    prompt_embeds: Array  # (1, txt_seq, joint_dim)
    pooled_prompt_embeds: Array  # (1, pooled_dim)
    text_ids: Array  # (txt_seq, 3)
    guidance_scale: float = 3.5
    lora_rank: int = 0
    lora_alpha: float = 0.0
    dtype: Any = jnp.float32
    remat: bool = True
    # Weight-only int8 transformer storage ("int8") for serving full-scale
    # FLUX.1 on one 16 GB chip — see models/quantize.py. Param tree must be
    # produced by quantize_transformer_params (or *_like) in this mode.
    weight_quant: str = "none"
    # Training mesh for multichip runs: the Pallas flash-attention kernel
    # cannot be auto-partitioned by GSPMD, so with a mesh the attention is
    # shard_mapped over the batch axis (ops/pallas/flash_attention.py).
    attention_mesh: Any = None

    def __post_init__(self):
        attention_fn = None
        if self.attention_mesh is not None:
            import functools

            from ragb_vae_tpu.ops.pallas import attention as _attention

            attention_fn = functools.partial(_attention, mesh=self.attention_mesh)
        kwargs = {} if attention_fn is None else {"attention_fn": attention_fn}
        self.transformer = FluxTransformer2D(
            self.transformer_config,
            dtype=self.dtype,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            weight_quant=self.weight_quant,
            remat=self.remat,
            **kwargs,
        )
        self.vae_scale_factor = self.vae.config.spatial_scale_factor
        self.scaling_factor = float(self.vae.config.scaling_factor)
        self.shift_factor = float(self.vae.config.shift_factor)
        # Train-time schedule: full num_train_timesteps with dynamic-shift mu
        # derived from the VAE sample size (reference :242,257-283).
        sample = self.vae.config.sample_size or 256
        h = max(int(sample // self.vae_scale_factor), 1)
        self._train_sched = FlowMatchEulerScheduler(self.scheduler.config)
        self._train_sched.set_timesteps(
            self.scheduler.config.num_train_timesteps,
            mu=calc_mu(self.scheduler.config, h * h),
        )

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(
        cls,
        model_path: Union[str, Path],
        *,
        vae_path: Union[str, Path],
        vae_subfolder: str = "ae",
        dtype=jnp.float32,
        lora_rank: int = 0,
        lora_alpha: float = 0.0,
        use_gradient_checkpointing: bool = True,
        attention_mesh: Any = None,
        weight_quant: str = "none",
    ) -> Tuple["FluxTextAlphaModel", PyTree, PyTree]:
        """Returns (model, transformer_params, vae_params).

        weight_quant="int8": the transformer params are served in
        weight-only int8 (models/quantize.py). A pre-quantized checkpoint
        dir (scripts/quantize_flux_checkpoint.py) is loaded as-is; a plain
        bf16/f32 checkpoint is quantized host-side at load.
        """
        t_config, t_params = load_transformer(model_path)
        vae, vae_params = load_rgba_vae_from_path(vae_path, subfolder=vae_subfolder, dtype=dtype)
        scheduler = load_scheduler(model_path)
        prompt, pooled, text_ids = encode_empty_prompt(model_path)
        model = cls(
            transformer_config=t_config,
            vae=vae,
            scheduler=scheduler,
            prompt_embeds=jnp.asarray(prompt),
            pooled_prompt_embeds=jnp.asarray(pooled),
            text_ids=jnp.asarray(text_ids),
            lora_rank=lora_rank,
            lora_alpha=lora_alpha,
            dtype=dtype,
            remat=use_gradient_checkpointing,
            attention_mesh=attention_mesh,
            weight_quant=weight_quant,
        )
        if weight_quant == "int8" and not _tree_is_quantized(t_params):
            from ragb_vae_tpu.models.quantize import quantize_transformer_params

            t_params = quantize_transformer_params(
                jax.tree_util.tree_map(np.asarray, t_params)
            )
        if lora_rank > 0:
            t_params = model.init_lora(t_params, jax.random.PRNGKey(0))
        return model, t_params, vae_params

    def init_lora(self, base_params: PyTree, key: jax.Array) -> PyTree:
        """Attach fresh LoRA params (add_lora equivalent, :152-180)."""
        if self.lora_rank <= 0:
            raise ValueError("lora_rank must be > 0 to initialize LoRA.")
        latent_dim = self.transformer_config.in_channels
        dummy = dict(
            hidden_states=jnp.zeros((1, 4, latent_dim)),
            encoder_hidden_states=self.prompt_embeds[:, :2].astype(jnp.float32),
            pooled_projections=self.pooled_prompt_embeds.astype(jnp.float32),
            timestep=jnp.asarray([0.5]),
            img_ids=jnp.zeros((4, 3)),
            txt_ids=jnp.zeros((2, 3)),
            guidance=jnp.asarray([3.5]) if self.transformer_config.guidance_embeds else None,
        )
        real = self.transformer.init(key, **dummy)["params"]
        _, lora = split_lora_params(real)
        return merge_params(base_params, lora)

    def load_lora(self, base_params: PyTree, lora_dir: Union[str, Path]) -> PyTree:
        """Attach adapters and load peft-format weights (:183-197)."""
        from ragb_vae_tpu.models.weights import load_torch_state

        lora_dir = Path(lora_dir)
        for name in ("pytorch_lora_weights.safetensors", "pytorch_lora_weights.bin"):
            if (lora_dir / name).exists():
                state = load_torch_state(lora_dir / name)
                break
        else:
            raise FileNotFoundError(f"No LoRA weights in {lora_dir}.")
        lora = peft_state_to_lora_params(state)
        return merge_params(base_params, lora)

    def lora_state_dict(self, params: PyTree) -> Dict[str, np.ndarray]:
        # split FIRST, then fetch: device_get on the merged tree would copy
        # the whole frozen base (~22 GB bf16 at FLUX.1 scale) to host just
        # to discard it, and crashes outright when the base is FSDP/TP
        # sharded (non-addressable shards); the adapters are replicated and
        # tiny, so fetching only them is both safe and fast
        _, lora = split_lora_params(params)
        return lora_params_to_peft_state(jax.device_get(lora))

    def save_lora_weights(self, params: PyTree, output_dir: Union[str, Path]) -> None:
        """peft/FluxPipeline-compatible safetensors export."""
        from ragb_vae_tpu.models.weights import save_torch_state

        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        save_torch_state(self.lora_state_dict(params), out / "pytorch_lora_weights.safetensors")

    # ------------------------------------------------------------------
    # Core helpers (:330-349)
    # ------------------------------------------------------------------
    def encode_latents(self, vae_params: PyTree, x: Array, key: jax.Array) -> Array:
        """[0,1] image -> scaled/shifted latent (B, h, w, C), channels-last."""
        posterior = self.vae.encode(vae_params, (x * 2.0 - 1.0).astype(self.dtype))
        latents = posterior.sample(key, dtype=jnp.float32)
        return (latents - self.shift_factor) * self.scaling_factor

    def _guidance(self, batch_size: int) -> Optional[Array]:
        if not self.transformer_config.guidance_embeds:
            return None
        return jnp.full((batch_size,), self.guidance_scale, dtype=jnp.float32)

    def _constrain_seq(self, tokens: Array) -> Array:
        """Sequence parallelism: when `attention_mesh` carries an "sp" axis,
        pin the (B, S, C) token streams sequence-sharded so every per-token
        op (Dense/AdaLN/RoPE) runs on S/n_sp tokens per device; attention
        all-gathers k/v inside its shard_map (ops/pallas/flash_attention.py).
        The long stream at 1024² is 4096 image tokens — the activation
        memory, not the params, is what sp divides."""
        mesh = self.attention_mesh
        if mesh is None or mesh.shape.get("sp", 1) <= 1:
            return tokens
        if tokens.shape[1] % mesh.shape["sp"] != 0:
            return tokens
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = "data" if mesh.shape.get("data", 1) > 1 else None
        return jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, P(data, "sp", None))
        )

    def _transformer_pred(
        self,
        params: PyTree,
        packed: Array,
        timestep: Array,
        img_ids: Array,
        batch_size: int,
    ) -> Array:
        prompt = jnp.broadcast_to(
            self.prompt_embeds,
            (batch_size,) + self.prompt_embeds.shape[1:],
        ).astype(self.dtype)
        pooled = jnp.broadcast_to(
            self.pooled_prompt_embeds,
            (batch_size,) + self.pooled_prompt_embeds.shape[1:],
        ).astype(self.dtype)
        packed = self._constrain_seq(packed)
        prompt = self._constrain_seq(prompt)
        return self.transformer.apply(
            {"params": params},
            hidden_states=packed,
            encoder_hidden_states=prompt,
            pooled_projections=pooled,
            timestep=timestep,
            img_ids=img_ids,
            txt_ids=self.text_ids,
            guidance=self._guidance(batch_size),
        )

    # ------------------------------------------------------------------
    # Training loss (:354-425)
    # ------------------------------------------------------------------
    def compute_loss(
        self,
        params: PyTree,
        vae_params: PyTree,
        gt: Array,
        text_alpha: Array,
        key: jax.Array,
        weights: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """gt/text_alpha: (B, H, W, 4) RGBA in [0, 1]. `weights` (B,) makes
        the loss a weighted batch mean (zero-weight = mesh-padding sample)."""
        k_cond, k_tgt, k_noise, k_t = jax.random.split(key, 4)
        cond_latent = jax.lax.stop_gradient(self.encode_latents(vae_params, gt, k_cond))
        target_latent = jax.lax.stop_gradient(
            self.encode_latents(vae_params, text_alpha, k_tgt)
        )
        noise = jax.random.normal(k_noise, target_latent.shape, dtype=jnp.float32)
        u = compute_density_for_timestep_sampling(
            k_t, target_latent.shape[0], weighting_scheme="logit_normal"
        )
        return self.compute_loss_from_latents(
            params, cond_latent, target_latent, noise, u, weights=weights
        )

    def compute_loss_from_latents(
        self,
        params: PyTree,
        cond_latent: Array,
        target_latent: Array,
        noise: Array,
        u: Array,
        weights: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Deterministic core of the flow-matching loss (noise and the
        logit-normal draws injected — the bit-faithful comparison point
        called out in SURVEY.md §7's hard parts)."""
        bsz = target_latent.shape[0]
        sched = self._train_sched
        n_train = self.scheduler.config.num_train_timesteps
        max_idx = min(len(sched.timesteps) - 1, len(sched.sigmas) - 1)
        indices = jnp.clip((u * n_train).astype(jnp.int32), 0, max_idx)

        timesteps = jnp.asarray(sched.timesteps)[indices]
        sigmas = jnp.asarray(sched.sigmas)[indices].reshape(bsz, 1, 1, 1)

        noisy_target = (1.0 - sigmas) * target_latent + sigmas * noise
        packed_cond = pack_latents(cond_latent.astype(self.dtype))
        packed_tgt = pack_latents(noisy_target.astype(self.dtype))
        packed = jnp.concatenate([packed_cond, packed_tgt], axis=1)

        latent_h, latent_w = target_latent.shape[1], target_latent.shape[2]
        ids_single = prepare_latent_image_ids(latent_h // 2, latent_w // 2)
        img_ids = jnp.concatenate([ids_single, ids_single], axis=0)

        pred = self._transformer_pred(params, packed, timesteps / 1000.0, img_ids, bsz)
        seq_cond = packed_cond.shape[1]
        pred_target = unpack_latents(
            pred[:, seq_cond:, :].astype(jnp.float32), latent_h, latent_w
        )
        loss_target = noise - target_latent
        weighting = compute_loss_weighting_for_sd3(sigmas, weighting_scheme="logit_normal")
        per_sample = jnp.mean(
            (weighting * (pred_target - loss_target) ** 2).reshape(bsz, -1), axis=1
        )
        if weights is None:
            loss = jnp.mean(per_sample)
        else:
            w = weights.astype(jnp.float32)
            loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-8)
        stats = {
            "timesteps_mean": jnp.mean(timesteps),
            "sigmas_mean": jnp.mean(sigmas),
        }
        return loss, stats

    # ------------------------------------------------------------------
    # Sampling (:430-500) — whole loop in one jitted program
    # ------------------------------------------------------------------
    def sampling_schedule(self, num_inference_steps: int) -> FlowMatchEulerScheduler:
        """Inference schedule with dynamic-shift μ from the VAE sample size
        (the reference's `_set_timesteps`, :279-283)."""
        sched = FlowMatchEulerScheduler(self.scheduler.config)
        sample = self.vae.config.sample_size or 256
        h = max(int(sample // self.vae_scale_factor), 1)
        sched.set_timesteps(
            num_inference_steps, mu=calc_mu(self.scheduler.config, h * h)
        )
        return sched

    def sample_latents_from_noise(
        self,
        params: PyTree,
        cond_latent: Array,
        init_noise: Array,
        step_noises: Array,
        *,
        return_trajectory: bool = False,
    ) -> Array:
        """Deterministic core of `sample`: ALL noise is injected.

        `init_noise` is the latent initialization; `step_noises` is
        (num_steps, B, h, w, C) — one fresh tensor per denoising step for
        the reference's per-step re-noising quirk
        (`noisy_target = (1-σ)·latents + σ·randn`, reference :463). This is
        the bit-faithful comparison surface for the torch golden-trajectory
        parity test (tests/test_sample_parity.py): identical injected noise
        must yield an identical latent trajectory.

        With `return_trajectory` the full (num_steps, B, h, w, C) latent
        trajectory after each Euler step is returned alongside the final
        latents.
        """
        num_steps = step_noises.shape[0]
        sched = self.sampling_schedule(num_steps)
        sigmas = jnp.asarray(sched.sigmas)
        timesteps = jnp.asarray(sched.timesteps)

        bsz = cond_latent.shape[0]
        latent_h, latent_w = cond_latent.shape[1], cond_latent.shape[2]
        ids_single = prepare_latent_image_ids(latent_h // 2, latent_w // 2)
        img_ids = jnp.concatenate([ids_single, ids_single], axis=0)
        packed_cond = pack_latents(cond_latent.astype(self.dtype))
        seq_cond = packed_cond.shape[1]

        def step_fn(latents, scan_in):
            i, step_noise = scan_in
            if self.weight_quant == "int8":
                # Weight-only int8: the QDense dequants (int8 -> bf16) are
                # loop-invariant, and XLA's LICM hoists them out of the scan
                # — every dequantized kernel live at once (~24 GB at full
                # scale, measured in benchmarks/quant_aot.py). The barrier
                # is never hoisted, so dequant stays inside the step and at
                # most one layer's bf16 weights are live at a time.
                step_params = jax.lax.optimization_barrier(params)
            else:
                step_params = params
            sigma = sigmas[i]
            # reference quirk: fresh noise injected EVERY step (:463)
            noisy_target = (1.0 - sigma) * latents + sigma * step_noise
            packed = jnp.concatenate(
                [packed_cond, pack_latents(noisy_target.astype(self.dtype))], axis=1
            )
            timestep = jnp.broadcast_to(timesteps[i] / 1000.0, (bsz,))
            pred = self._transformer_pred(step_params, packed, timestep, img_ids, bsz)
            pred_target = unpack_latents(
                pred[:, seq_cond:, :].astype(jnp.float32), latent_h, latent_w
            )
            new_latents = sched.step(pred_target, i, latents)
            return new_latents, (new_latents if return_trajectory else None)

        latents, trajectory = jax.lax.scan(
            step_fn,
            init_noise.astype(jnp.float32),
            (jnp.arange(num_steps), step_noises.astype(jnp.float32)),
        )
        return (latents, trajectory) if return_trajectory else latents

    def sample(
        self,
        params: PyTree,
        vae_params: PyTree,
        gt: Array,
        *,
        num_inference_steps: int = 20,
        key: jax.Array,
    ) -> Array:
        k_enc, k_init, k_loop = jax.random.split(key, 3)
        cond_latent = self.encode_latents(vae_params, gt, k_enc)

        latents0 = jax.random.normal(k_init, cond_latent.shape, dtype=jnp.float32)
        step_noises = jax.vmap(
            lambda i: jax.random.normal(
                jax.random.fold_in(k_loop, i), cond_latent.shape, dtype=jnp.float32
            )
        )(jnp.arange(num_inference_steps))
        latents = self.sample_latents_from_noise(params, cond_latent, latents0, step_noises)
        decoded = self.vae.decode(
            vae_params, (latents / self.scaling_factor + self.shift_factor).astype(self.dtype)
        )
        return jnp.clip((decoded.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
