"""Sequence parallelism: sp-sharded token streams + all-gather-k/v attention.

On the ("data", "sp") CPU mesh the attention shard_map runs the REAL
collective dataflow (q local, k/v all-gathered over sp) around the
chunked-XLA inner fn, so these tests pin the exact same code path the TPU
flash kernel uses, minus the kernel body.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerConfig, FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.ops.pallas.flash_attention import attention


def test_attention_seq_sharded_exact():
    """all-gather-k/v SP attention == unsharded attention, fwd and grad."""
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 2, 32, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    ref = attention(q, k, v, force_xla=True)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "sp"))
    out = jax.jit(
        lambda q, k, v: attention(q, k, v, force_xla=True, mesh=mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # gradients flow through the shard_map + all_gather
    def loss(q, k, v, mesh_):
        return jnp.sum(attention(q, k, v, force_xla=True, mesh=mesh_) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, None)
    g_sp = jax.jit(jax.grad(lambda q, k, v: loss(q, k, v, mesh), argnums=(0, 1, 2)))(
        q, k, v
    )
    for a, b_ in zip(g_ref, g_sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_attention_seq_not_divisible_falls_back():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 30, 16)), jnp.float32)  # 30 % 4 != 0
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "sp"))
    out = attention(q, q, q, force_xla=True, mesh=mesh)
    ref = attention(q, q, q, force_xla=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def sp_setup():
    cfg = FluxTransformerConfig.tiny()
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 64
    vae = RgbaVAE(config=vae_cfg)
    rng = np.random.default_rng(0)

    def build(mesh):
        return FluxTextAlphaModel(
            transformer_config=cfg,
            vae=vae,
            scheduler=FlowMatchEulerScheduler(FlowMatchEulerConfig()),
            prompt_embeds=jnp.asarray(
                np.random.default_rng(1).standard_normal((1, 4, cfg.joint_attention_dim)),
                jnp.float32,
            ),
            pooled_prompt_embeds=jnp.asarray(
                np.random.default_rng(2).standard_normal((1, cfg.pooled_projection_dim)),
                jnp.float32,
            ),
            text_ids=jnp.zeros((4, 3), jnp.float32),
            lora_rank=2,
            lora_alpha=4.0,
            attention_mesh=mesh,
        )

    ref_model = build(None)
    dummy = dict(
        hidden_states=jnp.zeros((1, 4, cfg.in_channels)),
        encoder_hidden_states=ref_model.prompt_embeds,
        pooled_projections=ref_model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((4, 3)),
        txt_ids=ref_model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    t_params = ref_model.transformer.init(jax.random.PRNGKey(3), **dummy)["params"]
    vae_params = vae.init_params(jax.random.PRNGKey(4), image_size=32)
    gt = jnp.asarray(rng.random((2, 64, 64, 4)), jnp.float32)
    ta = jnp.asarray(rng.random((2, 64, 64, 4)), jnp.float32)
    return build, t_params, vae_params, gt, ta


def test_sp_training_loss_and_grads_match(sp_setup):
    """compute_loss + grads with a ("data","sp") mesh == unsharded."""
    build, t_params, vae_params, gt, ta = sp_setup
    key = jax.random.PRNGKey(5)

    def loss_fn(model):
        def f(p):
            loss, _ = model.compute_loss(p, vae_params, gt, ta, key)
            return loss

        return f

    ref_loss, ref_grads = jax.value_and_grad(loss_fn(build(None)))(t_params)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "sp"))
    sp_loss, sp_grads = jax.jit(jax.value_and_grad(loss_fn(build(mesh))))(t_params)

    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=1e-4)
    flat_ref = {jax.tree_util.keystr(p): np.asarray(v)
                for p, v in jax.tree_util.tree_leaves_with_path(ref_grads)}
    flat_sp = {jax.tree_util.keystr(p): np.asarray(v)
               for p, v in jax.tree_util.tree_leaves_with_path(sp_grads)}
    for name in flat_ref:
        np.testing.assert_allclose(
            flat_sp[name], flat_ref[name], rtol=5e-4, atol=1e-5, err_msg=name
        )


def test_sp_sample_matches(sp_setup):
    build, t_params, vae_params, gt, _ = sp_setup
    key = jax.random.PRNGKey(6)
    ref = build(None).sample(t_params, vae_params, gt, num_inference_steps=2, key=key)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "sp"))
    out = build(mesh).sample(t_params, vae_params, gt, num_inference_steps=2, key=key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sp_sample_int8(sp_setup):
    """sp composes with weight-only int8 at sample time."""
    from ragb_vae_tpu.models.quantize import quantize_transformer_params

    build, t_params, vae_params, gt, _ = sp_setup
    qparams = quantize_transformer_params(jax.device_get(t_params))
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "sp"))

    def build_q(mesh_):
        base = build(mesh_)
        return FluxTextAlphaModel(
            transformer_config=base.transformer_config,
            vae=base.vae,
            scheduler=base.scheduler,
            prompt_embeds=base.prompt_embeds,
            pooled_prompt_embeds=base.pooled_prompt_embeds,
            text_ids=base.text_ids,
            lora_rank=base.lora_rank,
            lora_alpha=base.lora_alpha,
            attention_mesh=mesh_,
            weight_quant="int8",
        )

    key = jax.random.PRNGKey(9)
    ref = build_q(None).sample(qparams, vae_params, gt, num_inference_steps=2, key=key)
    out = build_q(mesh).sample(qparams, vae_params, gt, num_inference_steps=2, key=key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)
