"""RgbaVAE wrapper: forward/loss/reconstruct semantics, from_pretrained_rgb."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models import RgbaVAE, save_autoencoder_params
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import torch_state_to_flax_params
from tests.torch_vae_ref import make_state


@pytest.fixture(scope="module")
def rgb_checkpoint_dir(tmp_path_factory):
    """An HF-format RGB checkpoint under <dir>/vae, like the reference expects."""
    config = AutoencoderConfig.tiny()
    state = make_state(config, seed=0)
    params = torch_state_to_flax_params(state)
    root = tmp_path_factory.mktemp("ckpt")
    save_autoencoder_params(config, params, Path(root) / "vae")
    return root


def test_from_pretrained_rgb_widens(rgb_checkpoint_dir):
    model, params = RgbaVAE.from_pretrained_rgb(str(rgb_checkpoint_dir), "vae", alpha_bias_init=0.1)
    assert model.config.in_channels == 4
    assert np.asarray(params["encoder"]["conv_in"]["kernel"]).shape[2] == 4
    assert np.asarray(params["decoder"]["conv_out"]["bias"])[3] == pytest.approx(0.1)


def test_forward_range_and_shapes(rgb_checkpoint_dir):
    model, params = RgbaVAE.from_pretrained_rgb(str(rgb_checkpoint_dir), "vae")
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 32, 32, 4)).astype(np.float32))
    recon, posterior = model.forward(params, x, jax.random.PRNGKey(0))
    assert recon.shape == (2, 32, 32, 4)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0
    assert posterior.mean.shape == (2, 16, 16, model.config.latent_channels)


def test_forward_accepts_rgb_input(rgb_checkpoint_dir):
    model, params = RgbaVAE.from_pretrained_rgb(str(rgb_checkpoint_dir), "vae")
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 32, 32, 3)).astype(np.float32))
    recon, _ = model.forward(params, x, jax.random.PRNGKey(0))
    assert recon.shape == (1, 32, 32, 4)


def test_reconstruct_deterministic_given_key(rgb_checkpoint_dir):
    model, params = RgbaVAE.from_pretrained_rgb(str(rgb_checkpoint_dir), "vae")
    x = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 32, 32, 4)).astype(np.float32))
    a = model.reconstruct(params, x, jax.random.PRNGKey(3))
    b = model.reconstruct(params, x, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loss_composition(rgb_checkpoint_dir):
    model, params = RgbaVAE.from_pretrained_rgb(
        str(rgb_checkpoint_dir),
        "vae",
        beta=0.25,
        white_bg_weight=0.5,
        black_bg_weight=0.5,
        alpha_l1_weight=0.1,
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 4)).astype(np.float32))
    recon, posterior = model.forward(params, x, jax.random.PRNGKey(0))
    total = model.loss(recon, x, posterior)
    assert np.isfinite(float(total))
    # identical recon/target -> only the KL term remains
    kl_only = model.loss(x, x, posterior)
    np.testing.assert_allclose(float(kl_only), 0.25 * float(jnp.mean(posterior.kl())), rtol=1e-6)


def test_loss_jittable(rgb_checkpoint_dir):
    model, params = RgbaVAE.from_pretrained_rgb(str(rgb_checkpoint_dir), "vae")

    @jax.jit
    def step(p, x, key):
        recon, posterior = model.forward(p, x, key)
        return model.loss(recon, x, posterior)

    x = jnp.asarray(np.random.default_rng(5).uniform(size=(1, 32, 32, 4)).astype(np.float32))
    val = step(params, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(val))


def test_remat_half_matches_full(rgb_checkpoint_dir):
    """remat='half' (checkpoint alternate resnet blocks) is a pure
    memory/recompute schedule choice: identical param tree, identical
    forward, identical gradients vs remat=True."""
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE as _RgbaVAE

    config = AutoencoderConfig.tiny()
    config.in_channels = 4
    config.out_channels = 4
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 32, 32, 4), minval=-1)

    outs, grads = [], []
    params0 = None
    for remat in (True, "half", False):
        model = _RgbaVAE(config=config, remat=remat)
        params = model.init_params(jax.random.PRNGKey(0), image_size=32)
        if params0 is None:
            params0 = params
        else:
            assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params0)

        def loss_fn(p):
            rec, _ = model.forward(p, x, jax.random.PRNGKey(1))
            return jnp.mean(jnp.square(rec - x))

        l, g = jax.value_and_grad(loss_fn)(params0)
        outs.append(l)
        grads.append(g)

    for i in (1, 2):
        np.testing.assert_allclose(outs[i], outs[0], rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            grads[i], grads[0],
        )
