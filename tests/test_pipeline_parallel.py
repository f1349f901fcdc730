"""Pipeline-parallel FLUX transformer (parallel/pipeline.py).

Exactness is the contract: stage composition re-uses the same block
modules under the same global names, so the pipelined forward must be
bit-identical (fp32) to the monolithic FluxTransformer2D.apply.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.flux_transformer import (
    FluxTransformer2D,
    FluxTransformerConfig,
)
from ragb_vae_tpu.parallel.pipeline import (
    PipelinedFluxTransformer,
    split_transformer_params,
    stage_ranges,
)


def cfg4() -> FluxTransformerConfig:
    return FluxTransformerConfig(
        in_channels=16,
        num_layers=3,
        num_single_layers=5,
        attention_head_dim=32,
        num_attention_heads=2,
        joint_attention_dim=32,
        pooled_projection_dim=16,
        guidance_embeds=True,
        axes_dims_rope=(8, 12, 12),
    )


def make_inputs(cfg, bsz=2):
    rng = np.random.default_rng(0)
    return dict(
        hidden_states=jnp.asarray(
            rng.standard_normal((bsz, 8, cfg.in_channels)), jnp.float32
        ),
        encoder_hidden_states=jnp.asarray(
            rng.standard_normal((bsz, 4, cfg.joint_attention_dim)), jnp.float32
        ),
        pooled_projections=jnp.asarray(
            rng.standard_normal((bsz, cfg.pooled_projection_dim)), jnp.float32
        ),
        timestep=jnp.asarray([0.5] * bsz),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=jnp.zeros((4, 3)),
        guidance=jnp.asarray([3.5] * bsz),
    )


def test_stage_ranges_cover_and_balance():
    cfg = cfg4()
    for n in (1, 2, 3, 4):
        ranges = stage_ranges(cfg, n)
        assert len(ranges) == n
        doubles = [i for dr, _ in ranges for i in dr]
        singles = [i for _, sr in ranges for i in sr]
        assert doubles == list(range(cfg.num_layers))
        assert singles == list(range(cfg.num_single_layers))
        assert all(len(dr) + len(sr) >= 1 for dr, sr in ranges)

    # FLUX.1 scale: 4 stages of 19 double + 38 single, FLOP-balanced
    full = FluxTransformerConfig(num_layers=19, num_single_layers=38)
    ranges = stage_ranges(full, 4)
    weights = [2 * len(dr) + len(sr) for dr, sr in ranges]
    assert sum(weights) == 2 * 19 + 38
    assert max(weights) - min(weights) <= 2, weights

    with pytest.raises(ValueError):
        stage_ranges(cfg, cfg.num_layers + cfg.num_single_layers + 1)


def test_split_params_is_a_partition():
    cfg = cfg4()
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.PRNGKey(0), **make_inputs(cfg))["params"]
    subtrees = split_transformer_params(params, cfg, 3)
    seen = set()
    for sub in subtrees:
        for k in sub:
            assert k not in seen, k
            seen.add(k)
    assert seen == set(params.keys())


@pytest.mark.parametrize("n_stages,microbatch", [(2, 2), (4, 1), (8, 2)])
def test_pipeline_matches_monolithic(n_stages, microbatch):
    cfg = cfg4()
    model = FluxTransformer2D(cfg)
    inputs = make_inputs(cfg, bsz=2)
    params = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    ref = np.asarray(model.apply({"params": params}, **inputs))

    pipe = PipelinedFluxTransformer(cfg, devices=jax.devices()[:n_stages])
    stage_params = pipe.place_params(params)
    out = np.asarray(pipe(stage_params, **inputs, microbatch=microbatch))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_pipeline_int8():
    """PP composes with weight-only int8 (both memory axes at once)."""
    from ragb_vae_tpu.models.quantize import quantize_transformer_params

    cfg = cfg4()
    model = FluxTransformer2D(cfg)
    inputs = make_inputs(cfg, bsz=2)
    params = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    qparams = quantize_transformer_params(jax.device_get(params))

    qmodel = FluxTransformer2D(cfg, weight_quant="int8")
    ref = np.asarray(qmodel.apply({"params": qparams}, **inputs))

    pipe = PipelinedFluxTransformer(
        cfg, devices=jax.devices()[:4], weight_quant="int8"
    )
    stage_params = pipe.place_params(qparams)
    out = np.asarray(pipe(stage_params, **inputs, microbatch=1))
    # staged vs monolithic compile fuses the f32 dequant-matmul chains in a
    # different order — associativity-level noise only
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_pipeline_rejects_bad_microbatch():
    cfg = cfg4()
    pipe = PipelinedFluxTransformer(cfg, devices=jax.devices()[:2])
    model = FluxTransformer2D(cfg)
    inputs = make_inputs(cfg, bsz=2)
    params = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    stage_params = pipe.place_params(params)
    with pytest.raises(ValueError, match="not divisible"):
        pipe(stage_params, **inputs, microbatch=3)


def test_pipelined_sample_matches_monolithic():
    """pipelined_sample == model.sample for identical keys (the product
    path: full sampling loop with the transformer staged over devices)."""
    from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.scheduler import (
        FlowMatchEulerConfig,
        FlowMatchEulerScheduler,
    )
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig
    from ragb_vae_tpu.parallel.pipeline import pipelined_sample

    cfg = cfg4()
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
    )
    inputs = make_inputs(cfg)
    params = model.transformer.init(jax.random.PRNGKey(1), **inputs)["params"]
    vae_params = vae.init_params(jax.random.PRNGKey(2))
    gt = jnp.asarray(rng.random((2, 32, 32, 4)), jnp.float32)
    key = jax.random.PRNGKey(3)

    ref = model.sample(params, vae_params, gt, num_inference_steps=3, key=key)

    pipe = PipelinedFluxTransformer(cfg, devices=jax.devices()[:4])
    out = pipelined_sample(
        model, pipe, pipe.place_params(params), vae_params, gt,
        num_inference_steps=3, key=key, microbatch=1,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_pipeline_lora_adapters_apply():
    """PP with lora_rank > 0 must USE the adapters (regression: stage
    modules built without lora_rank silently drop trained LoRA weights)."""
    cfg = cfg4()
    inputs = make_inputs(cfg, bsz=2)
    model = FluxTransformer2D(cfg, lora_rank=2, lora_alpha=4.0)
    params = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    # make the adapters non-trivial (lora_b inits to zero = no-op bypass)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (
            jnp.asarray(
                np.random.default_rng(7).standard_normal(v.shape) * 0.1, v.dtype
            )
            if p[-1].key == "lora_b"
            else v
        ),
        params,
    )
    ref = np.asarray(model.apply({"params": params}, **inputs))

    pipe = PipelinedFluxTransformer(
        cfg, devices=jax.devices()[:4], lora_rank=2, lora_alpha=4.0
    )
    out = np.asarray(pipe(pipe.place_params(params), **inputs, microbatch=1))
    # LoRA bypass adds another f32 chain; staged vs monolithic fusion order
    # differs at the last ulp
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # and the adapters genuinely mattered: zeroing them changes the output
    zeroed = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.zeros_like(v) if p[-1].key == "lora_b" else v, params
    )
    out0 = np.asarray(pipe(pipe.place_params(zeroed), **inputs, microbatch=1))
    assert np.max(np.abs(out0 - ref)) > 1e-4
