"""Tensor-parallel FLUX serving (parallel/tensor_parallel.py).

The 8-device CPU mesh (conftest) validates: (a) the Megatron spec tree
covers every leaf with the intended column/row pattern, (b) the sharded
sampler produces the single-device trajectory, (c) the int8 quantized
tree shards the same way, (d) at least one kernel is actually
distributed (per-device bytes < replicated bytes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import (
    FluxTransformer2D,
    FluxTransformerConfig,
)
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerConfig, FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.parallel.tensor_parallel import (
    shard_transformer_params,
    sharded_sample_fn,
    transformer_param_specs,
)


def tp_config() -> FluxTransformerConfig:
    """Tiny-but-alignable: 8 heads so the 8-way model axis divides H."""
    return FluxTransformerConfig(
        in_channels=16,
        num_layers=2,
        num_single_layers=2,
        attention_head_dim=32,
        num_attention_heads=8,
        joint_attention_dim=64,
        pooled_projection_dim=32,
        guidance_embeds=True,
        axes_dims_rope=(8, 12, 12),
    )


def make_model(cfg, vae_cfg):
    vae = RgbaVAE(config=vae_cfg)
    rng = np.random.default_rng(0)
    return FluxTextAlphaModel(
        transformer_config=cfg,
        vae=vae,
        scheduler=FlowMatchEulerScheduler(FlowMatchEulerConfig()),
        prompt_embeds=jnp.asarray(
            rng.standard_normal((1, 4, cfg.joint_attention_dim)), jnp.float32
        ),
        pooled_prompt_embeds=jnp.asarray(
            rng.standard_normal((1, cfg.pooled_projection_dim)), jnp.float32
        ),
        text_ids=jnp.zeros((4, 3), jnp.float32),
        dtype=jnp.float32,
    ), vae


def init_params(model, cfg):
    dummy = dict(
        hidden_states=jnp.zeros((1, 4, cfg.in_channels)),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((4, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    return model.transformer.init(jax.random.PRNGKey(1), **dummy)["params"]


def test_spec_tree_pattern():
    cfg = tp_config()
    model, _ = make_model(cfg, AutoencoderConfig.tiny())
    params = init_params(model, cfg)
    specs = transformer_param_specs(params)

    # structure matches exactly
    assert jax.tree_util.tree_structure(
        specs, is_leaf=lambda x: isinstance(x, P)
    ) == jax.tree_util.tree_structure(params)

    blk = specs["transformer_blocks_0"]
    assert blk["attn"]["to_q"]["base"]["kernel"] == P(None, "model")
    assert blk["attn"]["to_q"]["base"]["bias"] == P("model")
    assert blk["attn"]["to_out_0"]["base"]["kernel"] == P("model", None)
    assert blk["attn"]["to_out_0"]["base"]["bias"] == P()
    assert blk["ff"]["net_0_proj"]["base"]["kernel"] == P(None, "model")
    assert blk["ff"]["net_2"]["base"]["kernel"] == P("model", None)
    assert blk["norm1"]["linear"]["kernel"] == P(None, "model")

    single = specs["single_transformer_blocks_0"]
    assert single["proj_mlp"]["kernel"] == P(None, "model")
    assert single["proj_out"]["kernel"] == P("model", None)  # block down-proj

    assert specs["x_embedder"]["kernel"] == P()  # replicated residual stream
    assert specs["proj_out"]["kernel"] == P()  # top-level head
    # RMSNorm weights replicated
    assert blk["attn"]["norm_q"]["weight"] == P()


def test_quantized_tree_specs():
    from ragb_vae_tpu.models.quantize import quantize_transformer_params

    cfg = tp_config()
    model, _ = make_model(cfg, AutoencoderConfig.tiny())
    params = init_params(model, cfg)
    qparams = quantize_transformer_params(jax.device_get(params))
    specs = transformer_param_specs(qparams)
    blk = specs["transformer_blocks_0"]
    assert blk["attn"]["to_q"]["base"]["kernel_q"] == P(None, "model")
    assert blk["attn"]["to_q"]["base"]["kernel_scale"] == P("model")
    assert blk["attn"]["to_out_0"]["base"]["kernel_q"] == P("model", None)
    assert blk["attn"]["to_out_0"]["base"]["kernel_scale"] == P()


def test_tp_sample_matches_single_device():
    cfg = tp_config()
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 32
    model, vae = make_model(cfg, vae_cfg)
    params = init_params(model, cfg)
    vae_params = vae.init_params(jax.random.PRNGKey(2))
    gt = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 4)), jnp.float32)
    key = jax.random.PRNGKey(4)

    ref = model.sample(params, vae_params, gt, num_inference_steps=2, key=key)

    mesh = Mesh(np.array(jax.devices()), ("model",))
    sharded, shardings = shard_transformer_params(params, mesh)
    # the big kernels are genuinely distributed
    qkern = sharded["transformer_blocks_0"]["attn"]["to_q"]["base"]["kernel"]
    shard_bytes = qkern.addressable_shards[0].data.nbytes
    assert shard_bytes * 8 == qkern.nbytes

    fn = sharded_sample_fn(model, mesh, num_inference_steps=2, shardings=shardings)
    out = fn(sharded, vae_params, gt, key)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_tp_sample_int8():
    """TP + weight-only int8 compose (full-scale-on-small-pod serving)."""
    from ragb_vae_tpu.models.quantize import quantize_transformer_params

    cfg = tp_config()
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 32
    model, vae = make_model(cfg, vae_cfg)
    qmodel = FluxTextAlphaModel(
        transformer_config=cfg,
        vae=vae,
        scheduler=model.scheduler,
        prompt_embeds=model.prompt_embeds,
        pooled_prompt_embeds=model.pooled_prompt_embeds,
        text_ids=model.text_ids,
        dtype=jnp.float32,
        weight_quant="int8",
    )
    params = init_params(model, cfg)
    qparams = quantize_transformer_params(jax.device_get(params))
    vae_params = vae.init_params(jax.random.PRNGKey(2))
    gt = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 4)), jnp.float32)
    key = jax.random.PRNGKey(4)

    ref = qmodel.sample(qparams, vae_params, gt, num_inference_steps=2, key=key)

    mesh = Mesh(np.array(jax.devices()), ("model",))
    sharded, shardings = shard_transformer_params(qparams, mesh)
    fn = sharded_sample_fn(qmodel, mesh, num_inference_steps=2, shardings=shardings)
    out = fn(sharded, vae_params, gt, key)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
