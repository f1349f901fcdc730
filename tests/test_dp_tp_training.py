"""Composed data x tensor parallel TRAINING (dp x tp on one mesh).

Round-3 serving added Megatron TP (parallel/tensor_parallel.py) and the
LoRA stage trains dp/FSDP — this pins their COMPOSITION: a ("data",
"model") mesh where the frozen base transformer is Megatron-sharded over
"model", the batch is sharded over "data", LoRA adapters stay replicated,
and attention shard_maps over both axes at once (B on data, H on model).
This is the production layout for full-scale QLoRA on a pod slice: the
11.9 B base at tp=4 is ~5.6 GiB/chip bf16 (~2.8 GiB int8), with dp
carrying the batch.

The reference's DeepSpeed config gives it ZeRO only
(/root/reference/src/training/flux_kontext_textalpha_lora.py — single
parallelism axis); dp x tp training is beyond-parity capability.

Parity: loss AND lora-grads on the 2x4 CPU mesh must match the
single-device run (identical params/keys; GSPMD sharding must not change
the math beyond reduction-order noise).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerConfig, FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.flux_weights import merge_params, split_lora_params
from ragb_vae_tpu.parallel.tensor_parallel import transformer_param_specs


def _cfg() -> FluxTransformerConfig:
    return FluxTransformerConfig(
        in_channels=16,
        num_layers=2,
        num_single_layers=2,
        attention_head_dim=32,
        num_attention_heads=8,  # divisible by the 4-way model axis
        joint_attention_dim=64,
        pooled_projection_dim=32,
        guidance_embeds=True,
        axes_dims_rope=(8, 12, 12),
    )


def _make_model(cfg, attention_mesh=None):
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 32
    vae = RgbaVAE(config=vae_cfg)
    rng = np.random.default_rng(0)
    model = FluxTextAlphaModel(
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
        lora_rank=8,
        lora_alpha=16.0,
        attention_mesh=attention_mesh,
    )
    return model, vae


def _init(model, cfg):
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


_STATE: dict = {}


def _setup():
    """Params/batch/single-device reference, computed once per module."""
    if _STATE:
        return _STATE
    cfg = _cfg()
    ref_model, vae = _make_model(cfg)
    t_params = _init(ref_model, cfg)
    base, lora = split_lora_params(t_params)
    vae_params = vae.init_params(jax.random.PRNGKey(2))

    rng = np.random.default_rng(3)
    gt = rng.random((2, 32, 32, 4)).astype(np.float32)
    ta = rng.random((2, 32, 32, 4)).astype(np.float32)
    key = jax.random.PRNGKey(4)

    def make_loss(model, base_tree):
        def loss_fn(lora_tree, gt, ta, key):
            params = merge_params(base_tree, lora_tree)
            loss, _ = model.compute_loss(params, vae_params, gt, ta, key)
            return loss

        return loss_fn

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(make_loss(ref_model, base)))(
        lora, jnp.asarray(gt), jnp.asarray(ta), key
    )
    _STATE.update(
        cfg=cfg, base=base, lora=lora, gt=gt, ta=ta, key=key,
        make_loss=make_loss, ref_loss=ref_loss, ref_grads=ref_grads,
    )
    return _STATE


def _run_sharded_parity(mesh: Mesh, model_ways: int) -> None:
    s = _setup()
    tp_model, _ = _make_model(s["cfg"], attention_mesh=mesh)

    specs = transformer_param_specs(s["base"])
    base_sh = jax.device_put(
        s["base"],
        jax.tree_util.tree_map(
            lambda sp: NamedSharding(mesh, sp), specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    # the big kernels are genuinely model_ways-distributed
    qk = base_sh["transformer_blocks_0"]["attn"]["to_q"]["base"]["kernel"]
    assert qk.addressable_shards[0].data.nbytes * model_ways == qk.nbytes

    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    lora_sh = jax.device_put(s["lora"], rep)
    step = jax.jit(
        jax.value_and_grad(s["make_loss"](tp_model, base_sh)),
        in_shardings=(rep, bsh, bsh, rep),
        out_shardings=(rep, rep),
    )
    tp_loss, tp_grads = step(
        lora_sh,
        jax.device_put(s["gt"], bsh),
        jax.device_put(s["ta"], bsh),
        s["key"],
    )

    np.testing.assert_allclose(
        float(np.asarray(tp_loss)), float(np.asarray(s["ref_loss"])), rtol=5e-4
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(s["ref_grads"])
    flat_tp = dict(jax.tree_util.tree_leaves_with_path(tp_grads))
    assert flat_tp, "empty lora grad tree"
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_tp[path]),
            np.asarray(leaf),
            rtol=5e-4,
            atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_dp_tp_lora_grads_match_single_device():
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    _run_sharded_parity(Mesh(devices, ("data", "model")), model_ways=4)


def test_dp_tp_sp_3d_grads_match_single_device():
    """Full 3D composition: batch on data, heads on model, tokens on sp —
    one mesh, one step; attention shard_maps over all three axes at once
    (ops/pallas/flash_attention.py) and the token streams are pinned
    sp-sharded between attentions (_constrain_seq)."""
    devices = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    _run_sharded_parity(Mesh(devices, ("data", "model", "sp")), model_ways=2)
