"""Golden parity: flax AutoencoderKL + weight converter vs independent torch ref."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ragb_vae_tpu.models.vae import AutoencoderKL
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import (
    adapt_params_to_rgba,
    flax_params_to_torch_state,
    torch_state_to_flax_params,
)
from tests.torch_vae_ref import TorchVAERef, make_state


@pytest.fixture(scope="module")
def tiny_setup():
    config = AutoencoderConfig.tiny()
    state = make_state(config, seed=0)
    params = torch_state_to_flax_params(state)
    model = AutoencoderKL(config)
    ref = TorchVAERef(config, state)
    return config, state, params, model, ref


def test_encoder_parity(tiny_setup):
    config, state, params, model, ref = tiny_setup
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(2, 32, 32, config.in_channels)).astype(np.float32)

    moments_flax = model.apply(
        {"params": params}, jnp.asarray(x), method=lambda m, v: m.encode(v).params
    )
    moments_torch = ref.encode_moments(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = np.asarray(moments_flax)
    want = moments_torch.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (2, 16, 16, 2 * config.latent_channels)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_decoder_parity(tiny_setup):
    config, state, params, model, ref = tiny_setup
    rng = np.random.default_rng(2)
    z = rng.normal(size=(2, 16, 16, config.latent_channels)).astype(np.float32)

    out_flax = model.apply({"params": params}, jnp.asarray(z), method=lambda m, v: m.decode(v))
    out_torch = ref.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    got = np.asarray(out_flax)
    want = out_torch.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (2, 32, 32, config.out_channels)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_quant_conv_path_parity():
    config = AutoencoderConfig.tiny()
    config.use_quant_conv = True
    config.use_post_quant_conv = True
    state = make_state(config, seed=3)
    params = torch_state_to_flax_params(state)
    model = AutoencoderKL(config)
    ref = TorchVAERef(config, state)
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), method=lambda m, v: m.encode(v).params)
    )
    want = ref.encode_moments(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    z = rng.normal(size=(1, 4, 4, config.latent_channels)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(z), method=lambda m, v: m.decode(v)))
    want = ref.decode(torch.from_numpy(z).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_param_structure_matches_init(tiny_setup):
    """Converted params must exactly match the flax-init tree (names+shapes)."""
    config, state, params, model, ref = tiny_setup
    init_params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(1))[
        "params"
    ]
    flat_init = jax.tree_util.tree_flatten_with_path(init_params)[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(params)[0]
    init_map = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    conv_map = {jax.tree_util.keystr(p): v.shape for p, v in flat_conv}
    assert init_map == conv_map


def test_state_dict_roundtrip(tiny_setup):
    config, state, params, model, ref = tiny_setup
    back = flax_params_to_torch_state(params)
    assert set(back.keys()) == set(state.keys())
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])


def test_adapt_to_rgba_semantics(tiny_setup):
    """Zero alpha path: RGBA forward on alpha=1 inputs equals RGB forward."""
    config, state, params, model, ref = tiny_setup
    rgba_params, rgba_config = adapt_params_to_rgba(params, config, alpha_bias_init=0.25)
    assert rgba_config.in_channels == 4 and rgba_config.out_channels == 4
    k_in = np.asarray(rgba_params["encoder"]["conv_in"]["kernel"])
    assert k_in.shape[2] == 4
    np.testing.assert_array_equal(k_in[:, :, 3, :], 0.0)
    k_out = np.asarray(rgba_params["decoder"]["conv_out"]["kernel"])
    np.testing.assert_array_equal(k_out[..., 3], 0.0)
    assert np.asarray(rgba_params["decoder"]["conv_out"]["bias"])[3] == 0.25

    rgba_model = AutoencoderKL(rgba_config)
    rng = np.random.default_rng(5)
    rgb = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    rgba = np.concatenate([rgb, np.ones((1, 16, 16, 1), np.float32)], axis=-1)

    m_rgb = np.asarray(
        model.apply({"params": params}, jnp.asarray(rgb), method=lambda m, v: m.encode(v).params)
    )
    m_rgba = np.asarray(
        rgba_model.apply({"params": rgba_params}, jnp.asarray(rgba), method=lambda m, v: m.encode(v).params)
    )
    np.testing.assert_allclose(m_rgba, m_rgb, atol=1e-5)

    z = rng.normal(size=(1, 4, 4, config.latent_channels)).astype(np.float32)
    d_rgb = np.asarray(model.apply({"params": params}, jnp.asarray(z), method=lambda m, v: m.decode(v)))
    d_rgba = np.asarray(
        rgba_model.apply({"params": rgba_params}, jnp.asarray(z), method=lambda m, v: m.decode(v))
    )
    np.testing.assert_allclose(d_rgba[..., :3], d_rgb, atol=1e-5)
    np.testing.assert_allclose(d_rgba[..., 3], 0.25, atol=1e-5)

    # adapt is idempotent
    again, _ = adapt_params_to_rgba(rgba_params, rgba_config)
    np.testing.assert_array_equal(
        np.asarray(again["encoder"]["conv_in"]["kernel"]), k_in
    )


def test_full_forward_shapes(tiny_setup):
    config, state, params, model, ref = tiny_setup
    x = jnp.zeros((1, 32, 32, 3))
    recon, posterior = model.apply({"params": params}, x, jax.random.PRNGKey(0))
    assert recon.shape == (1, 32, 32, 3)
    assert posterior.mean.shape == (1, 16, 16, config.latent_channels)
