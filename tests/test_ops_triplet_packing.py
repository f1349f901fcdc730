"""Triplet augmentation + Flux packing vs an independent torch formulation."""
import jax.numpy as jnp
import numpy as np
import torch

from ragb_vae_tpu.ops import (
    detail_augmented_triplet,
    pack_latents,
    prepare_latent_image_ids,
    split_triplet,
    unpack_latents,
)
from ragb_vae_tpu.ops.packing import latent_dims_for_pixels


def test_triplet_shapes_and_alpha():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 8, 8, 4)).astype(np.float32))
    trip = detail_augmented_triplet(x)
    assert trip.shape == (6, 8, 8, 4)
    orig, black, white = split_triplet(trip)
    np.testing.assert_array_equal(np.asarray(orig), np.asarray(x))
    np.testing.assert_allclose(np.asarray(black[..., 3]), 1.0)
    np.testing.assert_allclose(np.asarray(white[..., 3]), 1.0)


def test_triplet_composites_match_direct_compositing():
    """black/white channels equal compositing RGB over black/white in [-1,1]."""
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(3, 4, 4, 4)).astype(np.float32)
    trip = np.asarray(detail_augmented_triplet(jnp.asarray(x)))
    _, black, white = np.split(trip, 3, axis=0)

    # independent computation in [0,1] space
    rgb01 = (x[..., :3] + 1) / 2
    a01 = (x[..., 3:4] + 1) / 2
    over_black01 = rgb01 * a01  # bg=0
    over_white01 = rgb01 * a01 + (1 - a01)  # bg=1
    np.testing.assert_allclose(black[..., :3], over_black01 * 2 - 1, atol=1e-6)
    np.testing.assert_allclose(white[..., :3], over_white01 * 2 - 1, atol=1e-6)


def _torch_pack(latents_nchw: torch.Tensor) -> torch.Tensor:
    """Independent torch restatement of FluxPipeline._pack_latents."""
    b, c, h, w = latents_nchw.shape
    latents = latents_nchw.view(b, c, h // 2, 2, w // 2, 2)
    latents = latents.permute(0, 2, 4, 1, 3, 5)
    return latents.reshape(b, (h // 2) * (w // 2), c * 4)


def _torch_unpack(tokens: torch.Tensor, h: int, w: int) -> torch.Tensor:
    b, n, f = tokens.shape
    c = f // 4
    latents = tokens.view(b, h // 2, w // 2, c, 2, 2)
    latents = latents.permute(0, 3, 1, 4, 2, 5)
    return latents.reshape(b, c, h, w)


def test_pack_latents_matches_torch_ordering():
    rng = np.random.default_rng(2)
    x_nhwc = rng.normal(size=(2, 8, 6, 16)).astype(np.float32)
    got = np.asarray(pack_latents(jnp.asarray(x_nhwc)))
    want = _torch_pack(torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_unpack_inverts_pack():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 10, 16)).astype(np.float32))
    back = unpack_latents(pack_latents(x), 4, 10)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_unpack_matches_torch():
    rng = np.random.default_rng(4)
    tokens = rng.normal(size=(2, 12, 64)).astype(np.float32)
    got = np.asarray(unpack_latents(jnp.asarray(tokens), 6, 8))
    want = _torch_unpack(torch.from_numpy(tokens), 6, 8).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_latent_dims_for_pixels():
    assert latent_dims_for_pixels(1024, 1024, 8) == (128, 128)
    assert latent_dims_for_pixels(520, 513, 8) == (64, 64)


def test_prepare_latent_image_ids():
    ids = np.asarray(prepare_latent_image_ids(3, 2))
    assert ids.shape == (6, 3)
    np.testing.assert_array_equal(ids[:, 0], 0)
    np.testing.assert_array_equal(ids[:, 1], [0, 0, 1, 1, 2, 2])
    np.testing.assert_array_equal(ids[:, 2], [0, 1, 0, 1, 0, 1])
