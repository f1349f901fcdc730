"""Weight-only int8 FLUX transformer (models/quantize.py + QDense).

Covers: (a) the "none" mode is bit-identical to the pre-QDense nn.Dense
params/forward (checkpoint + golden-parity compatibility), (b) the int8
tree transform round-trips within quantization error, (c) the quantized
forward tracks the full-precision forward, (d) sample() runs end-to-end
with a quantized transformer.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.flux_transformer import (
    FluxTransformer2D,
    FluxTransformerConfig,
    QDense,
)
from ragb_vae_tpu.models.quantize import (
    dequantize_kernel,
    quantize_kernel,
    quantize_transformer_params,
    random_quantized_params_like,
)


def _dummy_inputs(cfg, img_seq=8, txt_seq=4, bsz=1):
    return dict(
        hidden_states=jnp.asarray(
            np.random.default_rng(0).standard_normal((bsz, img_seq, cfg.in_channels)),
            jnp.float32,
        ),
        encoder_hidden_states=jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (bsz, txt_seq, cfg.joint_attention_dim)
            ),
            jnp.float32,
        ),
        pooled_projections=jnp.asarray(
            np.random.default_rng(2).standard_normal((bsz, cfg.pooled_projection_dim)),
            jnp.float32,
        ),
        timestep=jnp.asarray([0.5] * bsz),
        img_ids=jnp.zeros((img_seq, 3)),
        txt_ids=jnp.zeros((txt_seq, 3)),
        guidance=jnp.asarray([3.5] * bsz),
    )


def test_qdense_none_matches_nn_dense():
    """QDense(weight_quant='none') == nn.Dense: params AND output."""
    from flax import linen as nn

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 7)), jnp.float32)
    ref = nn.Dense(11, dtype=jnp.float32, name="d")
    ours = QDense(11, dtype=jnp.float32, name="d")
    vr = ref.init(jax.random.PRNGKey(0), x)
    vo = ours.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vo)
    for a, b in zip(jax.tree_util.tree_leaves(vr), jax.tree_util.tree_leaves(vo)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(ref.apply(vr, x)), np.asarray(ours.apply(vo, x)), rtol=1e-6
    )


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    q = quantize_kernel(w)
    assert q["kernel_q"].dtype == np.int8
    assert q["kernel_scale"].shape == (32,)
    deq = dequantize_kernel(q["kernel_q"], q["kernel_scale"])
    # symmetric round-to-nearest: |w - deq| <= scale/2 elementwise
    assert np.all(np.abs(w - deq) <= q["kernel_scale"][None, :] / 2 + 1e-7)


def test_quantize_kernel_zero_column():
    """An all-zero output channel must not divide by zero."""
    w = np.zeros((8, 4), np.float32)
    w[:, 0] = 0.5
    q = quantize_kernel(w)
    assert np.all(np.isfinite(q["kernel_scale"]))
    deq = dequantize_kernel(q["kernel_q"], q["kernel_scale"])
    np.testing.assert_array_equal(deq[:, 1:], 0.0)


def test_quantized_tree_structure_matches_module():
    """quantize_transformer_params output loads into weight_quant='int8'."""
    cfg = FluxTransformerConfig.tiny()
    inputs = _dummy_inputs(cfg)
    plain = FluxTransformer2D(cfg)
    params = plain.init(jax.random.PRNGKey(0), **inputs)["params"]
    qparams = quantize_transformer_params(jax.device_get(params))

    qmodel = FluxTransformer2D(cfg, weight_quant="int8")
    expected = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0), **inputs)
    )["params"]
    got_paths = {
        jax.tree_util.keystr(k): (v.shape, np.asarray(v).dtype)
        for k, v in jax.tree_util.tree_leaves_with_path(qparams)
    }
    want_paths = {
        jax.tree_util.keystr(k): (v.shape, v.dtype)
        for k, v in jax.tree_util.tree_leaves_with_path(expected)
    }
    assert got_paths.keys() == want_paths.keys()
    for k in want_paths:
        assert got_paths[k][0] == want_paths[k][0], k
        assert got_paths[k][1] == want_paths[k][1], k


def test_quantized_forward_tracks_full_precision():
    cfg = FluxTransformerConfig.tiny()
    inputs = _dummy_inputs(cfg)
    plain = FluxTransformer2D(cfg)
    params = plain.init(jax.random.PRNGKey(0), **inputs)["params"]
    ref = np.asarray(plain.apply({"params": params}, **inputs))

    qmodel = FluxTransformer2D(cfg, weight_quant="int8")
    qparams = quantize_transformer_params(jax.device_get(params))
    out = np.asarray(qmodel.apply({"params": qparams}, **inputs))

    assert out.shape == ref.shape
    # weight-only int8 with per-channel scales: small relative error
    denom = np.maximum(np.abs(ref), 1e-2)
    rel = np.abs(out - ref) / denom
    assert np.median(rel) < 0.05, np.median(rel)
    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref) + 1e-9)
    assert cos > 0.995, cos


def test_random_quantized_params_like():
    cfg = FluxTransformerConfig.tiny()
    inputs = _dummy_inputs(cfg)
    plain = FluxTransformer2D(cfg)
    shapes = jax.eval_shape(plain.init, jax.random.PRNGKey(0), **inputs)["params"]
    qparams = random_quantized_params_like(shapes, seed=0)
    qmodel = FluxTransformer2D(cfg, weight_quant="int8")
    out = qmodel.apply({"params": qparams}, **inputs)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("lora_rank", [0, 2])
def test_quantized_sample_end_to_end(lora_rank):
    """FluxTextAlphaModel.sample with a quantized transformer (+LoRA)."""
    from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.scheduler import (
        FlowMatchEulerConfig,
        FlowMatchEulerScheduler,
    )
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig

    cfg = FluxTransformerConfig.tiny()
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
        lora_rank=lora_rank,
        lora_alpha=2.0 * lora_rank,
        weight_quant="int8",
    )
    gt = jnp.asarray(rng.random((1, 32, 32, 4)), jnp.float32)
    dummy = dict(
        hidden_states=jnp.zeros((1, 4, cfg.in_channels)),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((4, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    # init in int8 mode gives zero kernels; use random host-built params
    shapes = jax.eval_shape(
        FluxTransformer2D(cfg, lora_rank=lora_rank, lora_alpha=2.0 * lora_rank).init,
        jax.random.PRNGKey(0),
        **dummy,
    )["params"]
    t_params = random_quantized_params_like(shapes, seed=0)
    vae_params = vae.init_params(jax.random.PRNGKey(1))
    out = model.sample(
        t_params, vae_params, gt, num_inference_steps=2, key=jax.random.PRNGKey(2)
    )
    assert out.shape == (1, 32, 32, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_quantized_checkpoint_roundtrip(tmp_path):
    """save_quantized_transformer / load path: tree + config survive disk."""
    from ragb_vae_tpu.models.quantize import (
        is_quantized_checkpoint,
        load_quantized_transformer,
        save_quantized_transformer,
    )

    cfg = FluxTransformerConfig.tiny()
    model = FluxTransformer2D(cfg)
    inputs = _dummy_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    qparams = quantize_transformer_params(jax.tree_util.tree_map(np.asarray, params))

    out_dir = tmp_path / "transformer"
    save_quantized_transformer(cfg, qparams, out_dir)
    assert is_quantized_checkpoint(out_dir)
    cfg2, loaded = load_quantized_transformer(out_dir)
    assert cfg2 == cfg

    flat_a = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(qparams)}
    flat_b = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(loaded)}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        assert flat_a[k].dtype == flat_b[k].dtype, k
        np.testing.assert_array_equal(flat_a[k], flat_b[k])

    # the quantized model consumes the loaded tree unchanged
    qmodel = FluxTransformer2D(cfg, weight_quant="int8")
    out = qmodel.apply({"params": loaded}, **inputs)
    ref = qmodel.apply({"params": qparams}, **inputs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_load_transformer_detects_quantized_dir(tmp_path):
    """load_transformer transparently routes quantized checkpoint dirs."""
    from ragb_vae_tpu.models.flux_kontext_textalpha import load_transformer
    from ragb_vae_tpu.models.quantize import save_quantized_transformer

    cfg = FluxTransformerConfig.tiny()
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.PRNGKey(0), **_dummy_inputs(cfg))["params"]
    qparams = quantize_transformer_params(jax.tree_util.tree_map(np.asarray, params))
    save_quantized_transformer(cfg, qparams, tmp_path / "transformer")

    cfg2, loaded = load_transformer(tmp_path)
    assert cfg2 == cfg
    leaves = {jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_leaves_with_path(loaded)}
    assert any("kernel_q" in k for k in leaves)


def test_quantize_checkpoint_cli(tmp_path):
    """scripts/quantize_flux_checkpoint.py end-to-end on a tiny HF-format dir."""
    import subprocess
    import sys
    from pathlib import Path

    from ragb_vae_tpu.models.flux_weights import save_flux_transformer_params

    cfg = FluxTransformerConfig.tiny()
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.PRNGKey(0), **_dummy_inputs(cfg))["params"]
    src = tmp_path / "ckpt"
    save_flux_transformer_params(cfg, params, src / "transformer")
    dst = tmp_path / "ckpt-int8" / "transformer"

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "quantize_flux_checkpoint.py"),
         "--model_path", str(src), "--output_dir", str(dst)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    assert "saved to" in proc.stdout

    from ragb_vae_tpu.models.flux_kontext_textalpha import load_transformer

    cfg2, loaded = load_transformer(tmp_path / "ckpt-int8")
    qmodel = FluxTransformer2D(cfg2, weight_quant="int8")
    out = qmodel.apply({"params": loaded}, **_dummy_inputs(cfg2))
    plain_out = model.apply({"params": params}, **_dummy_inputs(cfg2))
    err = float(np.max(np.abs(np.asarray(out) - np.asarray(plain_out))))
    ref = float(np.max(np.abs(np.asarray(plain_out))))
    assert err / ref < 0.05


def test_from_pretrained_weight_quant(tmp_path):
    """from_pretrained(weight_quant='int8') quantizes a plain checkpoint at
    load and sample() runs — the ragb-infer --quant int8 path."""
    import json

    from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
    from ragb_vae_tpu.models.flux_weights import save_flux_transformer_params
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig
    from ragb_vae_tpu.models.weights import save_autoencoder_params

    root = tmp_path / "flux_tiny"
    cfg = FluxTransformerConfig.tiny()
    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.PRNGKey(0), **_dummy_inputs(cfg))["params"]
    save_flux_transformer_params(cfg, params, root / "transformer")
    (root / "scheduler").mkdir(parents=True)
    (root / "scheduler" / "scheduler_config.json").write_text(
        json.dumps({"num_train_timesteps": 1000, "shift": 3.0, "use_dynamic_shifting": True})
    )
    rng = np.random.default_rng(0)
    np.savez(
        root / "empty_prompt_embeds.npz",
        prompt_embeds=rng.standard_normal((1, 4, cfg.joint_attention_dim)).astype(np.float32),
        pooled_prompt_embeds=rng.standard_normal((1, cfg.pooled_projection_dim)).astype(np.float32),
        text_ids=np.zeros((4, 3), np.float32),
    )
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 32
    vae = RgbaVAE(config=vae_cfg)
    vae_params = vae.init_params(jax.random.PRNGKey(1), image_size=32)
    save_autoencoder_params(vae_cfg, vae_params, root / "vae")

    loaded, t_params, vae_params = FluxTextAlphaModel.from_pretrained(
        root, vae_path=root, vae_subfolder="vae", weight_quant="int8"
    )
    leaves = {p[-1].key for p, _ in jax.tree_util.tree_leaves_with_path(t_params)}
    assert "kernel_q" in leaves and "kernel" not in leaves
    gt = jnp.asarray(rng.random((1, 32, 32, 4)), jnp.float32)
    out = loaded.sample(
        t_params, vae_params, gt, num_inference_steps=2, key=jax.random.PRNGKey(2)
    )
    assert out.shape == (1, 32, 32, 4)
    assert np.all(np.isfinite(np.asarray(out)))
