"""FluxTransformer2D golden parity vs an independent torch restatement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.flux_transformer import FluxTransformer2D, FluxTransformerConfig
from ragb_vae_tpu.models.flux_weights import params_to_flux_state
from tests.torch_flux_ref import TorchFluxRef


@pytest.mark.parametrize("guidance_embeds", [True, False])
def test_transformer_matches_torch_reference(guidance_embeds):
    cfg = FluxTransformerConfig.tiny()
    cfg.guidance_embeds = guidance_embeds
    model = FluxTransformer2D(cfg)
    rng = np.random.default_rng(0)
    inputs = dict(
        hidden_states=rng.standard_normal((2, 12, cfg.in_channels)).astype(np.float32),
        encoder_hidden_states=rng.standard_normal((2, 5, cfg.joint_attention_dim)).astype(np.float32),
        pooled_projections=rng.standard_normal((2, cfg.pooled_projection_dim)).astype(np.float32),
        timestep=np.asarray([0.37, 0.81], np.float32),
        img_ids=rng.integers(0, 6, (12, 3)).astype(np.float32),
        txt_ids=np.zeros((5, 3), np.float32),
        guidance=np.asarray([3.5, 3.5], np.float32) if guidance_embeds else None,
    )
    jx = {k: (jnp.asarray(v) if v is not None else None) for k, v in inputs.items()}
    params = model.init(jax.random.PRNGKey(1), **jx)["params"]
    ours = np.asarray(model.apply({"params": params}, **jx))

    state = params_to_flux_state(jax.device_get(params))
    ref = TorchFluxRef(cfg, state).forward(**inputs)

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
