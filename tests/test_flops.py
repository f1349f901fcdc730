"""Analytic VAE FLOP counts vs XLA's compiled cost analysis.

The analytic walk (ops/flops.py) feeds bench.py's MFU field; it must track
what XLA actually schedules. XLA's count additionally includes the GN /
SiLU / sampling elementwise FLOPs the analytic count deliberately excludes
(VPU work), so the analytic value must be a tight LOWER bound.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.ops.flops import (
    mfu,
    peak_flops_for,
    vae_decode_flops,
    vae_encode_flops,
    vae_forward_flops,
)


def _xla_forward_flops(config, size: int) -> float:
    model = RgbaVAE(config=config)
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    x = jnp.zeros((1, size, size, 4))

    def fwd(p, v, k):
        recon, _ = model.forward(p, v, k)
        return recon

    compiled = jax.jit(fwd).lower(params, x, jax.random.PRNGKey(1)).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns one dict per device
        analysis = analysis[0]
    return float(analysis["flops"])


@pytest.mark.parametrize("size", [32, 64])
def test_tiny_config_matches_xla_cost_analysis(size):
    config = AutoencoderConfig.tiny()
    config.in_channels = 4
    config.out_channels = 4
    analytic = vae_forward_flops(config, size)
    xla = _xla_forward_flops(config, size)
    # Two opposing small biases at tiny sizes: XLA-CPU's conv cost model
    # counts only valid taps under SAME padding (border pixels have < k^2
    # MACs, measured -4% on a bare 32x32 conv) while the analytic walk
    # assumes full k^2 everywhere; and XLA's total additionally includes
    # the GN/SiLU/sampling elementwise FLOPs the analytic count excludes.
    # Both effects shrink as O(k/size), so the bound is a band, not an
    # inequality; at the 1024^2 production size the border bias is <0.5%.
    assert analytic <= xla * (1.0 + 8.0 / size), (analytic, xla)
    assert analytic >= 0.75 * xla, (analytic, xla)


def test_flux_config_roofline_magnitude():
    """The documented roofline (benchmarks/results.md: ~11 TFLOP/image at
    1024^2) comes out of the analytic walk, not a hand-typed constant."""
    config = AutoencoderConfig.flux()
    config.in_channels = 4
    config.out_channels = 4
    total = vae_forward_flops(config, 1024)
    assert 8e12 < total < 16e12, total
    # decode (3 resnets/block at full res) outweighs encode
    assert vae_decode_flops(config, 1024) > vae_encode_flops(config, 1024)


def _cost(compiled) -> float:
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis["flops"])


@pytest.mark.parametrize("lpips", [False, True])
def test_train_step_flops_matches_xla(lpips):
    """vae_train_step_flops (fwd + bwd + VGG terms) vs the compiled step.

    Measured ratios on this backend: 1.008 (no lpips — the 3x-triplet
    backward really is scheduled in full, no DCE of the zero-cotangent
    streams) and 1.064 (lpips — the analytic full-k^2 conv count
    overshoots XLA's valid-tap border model at 64px; shrinks O(k/size)).
    """
    import tempfile
    from pathlib import Path

    from ragb_vae_tpu.models.losses import AlphaVaeLossConfig
    from ragb_vae_tpu.training.vae_step import (
        VaeStepConfig,
        make_optimizer,
        make_train_step,
    )
    from ragb_vae_tpu.ops.flops import vae_train_step_flops

    size, batch = 64, 2
    lpips_fn = None
    if lpips:
        from ragb_vae_tpu.models.lpips import maybe_build_lpips
        from ragb_vae_tpu.models.weights import save_torch_state
        from tests.torch_lpips_ref import make_lpips_state

        tmp = Path(tempfile.mkdtemp()) / "lpips_vgg.safetensors"
        save_torch_state(make_lpips_state(seed=0), tmp)
        lpips_fn = maybe_build_lpips(tmp)

    config = AutoencoderConfig.tiny()
    config.in_channels = 4
    config.out_channels = 4
    model = RgbaVAE(config=config, remat=False)  # MFU convention: no remat
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    tx = make_optimizer(1e-5, max_grad_norm=1.0)
    step = make_train_step(
        model, tx, AlphaVaeLossConfig(reduce_mean=True),
        VaeStepConfig(kl_scale=1e-6, lpips_scale=0.5 if lpips else 0.0),
        lpips_fn=lpips_fn,
    )
    opt_state = tx.init(params)
    x = jnp.zeros((batch, size, size, 4))
    xla = _cost(
        jax.jit(step)
        .lower(params, opt_state, {"images": x}, jax.random.PRNGKey(1))
        .compile()
    )
    analytic = batch * vae_train_step_flops(config, size, lpips=lpips)
    assert 0.9 * xla <= analytic <= xla * (1.0 + 8.0 / size), (analytic, xla)


def _tiny_flux_inputs(cfg, img_seq=64, txt_seq=32):
    return dict(
        hidden_states=jnp.zeros((1, img_seq, cfg.in_channels)),
        encoder_hidden_states=jnp.zeros((1, txt_seq, cfg.joint_attention_dim)),
        pooled_projections=jnp.zeros((1, cfg.pooled_projection_dim)),
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((img_seq, 3)),
        txt_ids=jnp.zeros((txt_seq, 3)),
        guidance=jnp.asarray([3.5]) if cfg.guidance_embeds else None,
    )


def test_flux_transformer_flops_matches_xla():
    """flux_transformer_flops vs a compiled forward: tight lower bound
    (measured ratio 0.954 — XLA's extra is softmax/RoPE/RMSNorm VPU work)."""
    from ragb_vae_tpu.models.flux_transformer import (
        FluxTransformer2D,
        FluxTransformerConfig,
    )
    from ragb_vae_tpu.ops.flops import flux_transformer_flops

    cfg = FluxTransformerConfig.tiny()
    inputs = _tiny_flux_inputs(cfg)
    model = FluxTransformer2D(cfg, remat=False)
    params = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    xla = _cost(
        jax.jit(lambda p: model.apply({"params": p}, **inputs)).lower(params).compile()
    )
    analytic = flux_transformer_flops(cfg, 64, 32)
    assert 0.85 * xla <= analytic <= xla, (analytic, xla)


def test_lora_step_flops_matches_xla():
    """lora_train_step_flops (frozen-base backward: dx-only denses) vs a
    compiled LoRA step (measured ratio 0.890 — a lower bound; the blanket
    bwd=2x-fwd rule would overcount the frozen denses by ~1.4x)."""
    import optax

    from ragb_vae_tpu.models.flux_transformer import (
        FluxTransformer2D,
        FluxTransformerConfig,
    )
    from ragb_vae_tpu.models.flux_weights import merge_params, split_lora_params
    from ragb_vae_tpu.ops.flops import lora_train_step_flops

    cfg = FluxTransformerConfig.tiny()
    inputs = _tiny_flux_inputs(cfg)
    model = FluxTransformer2D(cfg, remat=False, lora_rank=4, lora_alpha=4.0)
    params = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    base, lora = split_lora_params(params)
    tx = optax.adamw(1e-4)

    def loss_fn(lora_p, base_p):
        out = model.apply({"params": merge_params(base_p, lora_p)}, **inputs)
        return jnp.mean(out * out)

    def step(lora_p, opt, base_p):
        loss, grads = jax.value_and_grad(loss_fn)(lora_p, base_p)
        updates, o2 = tx.update(grads, opt, lora_p)
        return optax.apply_updates(lora_p, updates), o2, loss

    xla = _cost(jax.jit(step).lower(lora, tx.init(lora), base).compile())
    analytic = lora_train_step_flops(cfg, 64, 32)
    assert 0.8 * xla <= analytic <= xla, (analytic, xla)


def test_production_flop_magnitudes():
    """The documented per-axis FLOP counts (benchmarks/results.md round 5)
    come out of the analytic walks, not hand-typed constants."""
    from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
    from ragb_vae_tpu.ops.flops import (
        textalpha_sample_flops,
        vae_train_step_flops,
    )

    vae = AutoencoderConfig.flux()
    vae.in_channels = 4
    vae.out_channels = 4
    # 512^2 training step: 18.57 TF/img
    assert 17e12 < vae_train_step_flops(vae, 512) < 20e12
    full = FluxTransformerConfig(
        in_channels=64, num_layers=19, num_single_layers=38,
        attention_head_dim=128, num_attention_heads=24,
        joint_attention_dim=4096, pooled_projection_dim=768,
        guidance_embeds=True,
    )
    # full-scale 20-step sampler: 756.9 TF/img
    assert 700e12 < textalpha_sample_flops(full, vae, 512, 20, 512) < 800e12


def test_mfu_helper():
    assert peak_flops_for("TPU v5 lite0") == 197e12
    assert peak_flops_for("Tesla A100") is None
    assert mfu(10.0, 1.97e12, "TPU v5 lite0") == pytest.approx(0.1)
    assert mfu(10.0, 1.97e12, "cpu") is None
