"""FluxTransformer2D architecture, RoPE, LoRA, and weight-interop tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.flux_transformer import (
    FluxTransformer2D,
    FluxTransformerConfig,
    apply_rotary_emb,
    rope_frequencies,
    timestep_embedding,
)
from ragb_vae_tpu.models.flux_weights import (
    flux_path_to_torch_key,
    flux_state_to_params,
    lora_params_to_peft_state,
    merge_params,
    params_to_flux_state,
    peft_state_to_lora_params,
    split_lora_params,
    torch_key_to_flux_path,
)

CFG = FluxTransformerConfig.tiny()


def _inputs(batch=2, img_seq=16, txt_seq=4):
    rng = np.random.default_rng(0)
    return dict(
        hidden_states=jnp.asarray(rng.standard_normal((batch, img_seq, CFG.in_channels)), jnp.float32),
        encoder_hidden_states=jnp.asarray(
            rng.standard_normal((batch, txt_seq, CFG.joint_attention_dim)), jnp.float32
        ),
        pooled_projections=jnp.asarray(
            rng.standard_normal((batch, CFG.pooled_projection_dim)), jnp.float32
        ),
        timestep=jnp.asarray([0.5] * batch, jnp.float32),
        img_ids=jnp.asarray(rng.integers(0, 4, (img_seq, 3)), jnp.float32),
        txt_ids=jnp.zeros((txt_seq, 3), jnp.float32),
        guidance=jnp.asarray([3.5] * batch, jnp.float32),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = FluxTransformer2D(CFG)
    params = model.init(jax.random.PRNGKey(0), **_inputs())["params"]
    return model, params


def test_forward_shape_and_finite(model_and_params):
    model, params = model_and_params
    out = model.apply({"params": params}, **_inputs())
    assert out.shape == (2, 16, CFG.in_channels)
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_is_jittable_and_deterministic(model_and_params):
    model, params = model_and_params
    fn = jax.jit(lambda p, **kw: model.apply({"params": p}, **kw))
    a = fn(params, **_inputs())
    b = fn(params, **_inputs())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timestep_embedding_basics():
    emb = timestep_embedding(jnp.asarray([0.0]), 8)
    # flip_sin_to_cos: first half cos(0)=1, second half sin(0)=0
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0)
    # scale=1000: t=0.001 behaves like raw timestep 1.0
    e1 = timestep_embedding(jnp.asarray([0.001]), 64)
    e2 = timestep_embedding(jnp.asarray([1.0]), 64, scale=1.0)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-5)


def test_rope_zero_ids_is_identity():
    cos, sin = rope_frequencies(jnp.zeros((5, 3)), (8, 12, 12))
    assert cos.shape == (5, 32) and sin.shape == (5, 32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 5, 32)), jnp.float32)
    np.testing.assert_allclose(np.asarray(apply_rotary_emb(x, cos, sin)), np.asarray(x), rtol=1e-6)


def test_rope_rotation_preserves_norm():
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (7, 3)), jnp.float32)
    cos, sin = rope_frequencies(ids, (8, 12, 12))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 2, 7, 32)), jnp.float32)
    rotated = apply_rotary_emb(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rotated), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-4,
    )


def test_guidance_required_when_configured(model_and_params):
    model, params = model_and_params
    inputs = _inputs()
    inputs["guidance"] = None
    with pytest.raises(ValueError):
        model.apply({"params": params}, **inputs)


def test_lora_zero_init_is_identity(model_and_params):
    _, base_params = model_and_params
    lora_model = FluxTransformer2D(CFG, lora_rank=4, lora_alpha=8.0)
    lora_params = lora_model.init(jax.random.PRNGKey(1), **_inputs())["params"]
    base_only, lora_only = split_lora_params(lora_params)
    merged = merge_params(base_params, lora_only)

    plain = FluxTransformer2D(CFG).apply({"params": base_params}, **_inputs())
    with_lora = lora_model.apply({"params": merged}, **_inputs())
    np.testing.assert_allclose(np.asarray(plain), np.asarray(with_lora), atol=1e-6)

    # perturbing lora_b changes the output
    bumped = jax.tree_util.tree_map(lambda x: x + 0.05, lora_only)
    out2 = lora_model.apply({"params": merge_params(base_params, bumped)}, **_inputs())
    assert np.abs(np.asarray(out2) - np.asarray(plain)).max() > 1e-4


def test_remat_matches_plain(model_and_params):
    model, params = model_and_params
    remat_model = FluxTransformer2D(CFG, remat=True)
    a = model.apply({"params": params}, **_inputs())
    b = remat_model.apply({"params": params}, **_inputs())
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# Weight interop
# ---------------------------------------------------------------------------
def test_torch_key_mapping_spot_checks():
    cases = {
        "transformer_blocks.0.attn.to_q.weight": ("transformer_blocks_0", "attn", "to_q", "base", "kernel"),
        "transformer_blocks.3.attn.to_out.0.bias": ("transformer_blocks_3", "attn", "to_out_0", "base", "bias"),
        "transformer_blocks.1.ff.net.0.proj.weight": ("transformer_blocks_1", "ff", "net_0_proj", "base", "kernel"),
        "transformer_blocks.1.ff_context.net.2.weight": ("transformer_blocks_1", "ff_context", "net_2", "base", "kernel"),
        "single_transformer_blocks.10.attn.norm_q.weight": ("single_transformer_blocks_10", "attn", "norm_q", "weight"),
        "single_transformer_blocks.2.proj_mlp.weight": ("single_transformer_blocks_2", "proj_mlp", "kernel"),
        "time_text_embed.timestep_embedder.linear_1.weight": ("time_text_embed", "timestep_embedder", "linear_1", "kernel"),
        "norm_out.linear.weight": ("norm_out_linear", "kernel"),
        "x_embedder.weight": ("x_embedder", "kernel"),
    }
    for key, expected in cases.items():
        ndim = 2 if key.endswith("weight") and "norm_q" not in key else 1
        path, transpose = torch_key_to_flux_path(key, ndim)
        assert path == expected, key
        assert transpose == (ndim == 2)
        # inverse round-trips
        back, t2 = flux_path_to_torch_key(path)
        assert back == key, (back, key)
        assert t2 == transpose


def test_params_state_round_trip(model_and_params):
    _, params = model_and_params
    state = params_to_flux_state(params)
    assert all(isinstance(v, np.ndarray) for v in state.values())
    rebuilt = flux_state_to_params(state)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(rebuilt)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str), sorted(flat_b, key=str)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_lora_peft_round_trip():
    lora_model = FluxTransformer2D(CFG, lora_rank=4, lora_alpha=8.0)
    params = lora_model.init(jax.random.PRNGKey(1), **_inputs())["params"]
    _, lora_only = split_lora_params(params)
    peft_state = lora_params_to_peft_state(lora_only)
    # peft format: transformer.-prefixed lora_A/lora_B with (r, in)/(out, r)
    key = "transformer.transformer_blocks.0.attn.to_q.lora_A.weight"
    assert key in peft_state
    assert peft_state[key].shape == (4, CFG.inner_dim)
    rebuilt = peft_state_to_lora_params(peft_state)
    flat_a = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(lora_only)}
    flat_b = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(rebuilt)}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))
