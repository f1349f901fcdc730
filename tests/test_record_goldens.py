"""record_goldens harness: synthetic-checkpoint round trip in CI, and
real-checkpoint golden consumption when fixtures are present.

The synthetic test writes a tiny HF-format VAE checkpoint, runs the
recording harness (manifest + goldens via the torch restatement), then
asserts the JAX model reproduces the recorded activations — the exact
validation that will run against a real FLUX checkpoint the day weights
are reachable (VERDICT.md round-2 missing #1)."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.vae import AutoencoderKL
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import (
    save_autoencoder_params,
    torch_state_to_flax_params,
)
from tests.torch_vae_ref import make_state

FIXTURES = Path(__file__).resolve().parent / "fixtures"


def _run_record(args):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import record_goldens

    record_goldens.main(args)


def test_synthetic_checkpoint_roundtrip(tmp_path):
    config = AutoencoderConfig.tiny()
    state = make_state(config, seed=3)
    params = torch_state_to_flax_params(state)
    ckpt = tmp_path / "ckpt"
    save_autoencoder_params(config, params, ckpt)

    out = tmp_path / "fixtures"
    _run_record(["--checkpoint", str(ckpt), "--kind", "vae", "--output", str(out)])

    # (a) manifest records the true key set
    recorded = dict(
        line.split("\t")
        for line in (out / "vae_keys_recorded.txt").read_text().splitlines()
        if line
    )
    assert set(recorded) == set(state)
    for key, shape in recorded.items():
        assert tuple(int(s) for s in shape.split(",")) == tuple(state[key].shape)

    # (b) the JAX model reproduces the recorded golden activations
    data = np.load(out / "vae_goldens.npz")
    model = AutoencoderKL(config)
    probes_vae = jnp.asarray(data["probes"] * 2.0 - 1.0)
    posterior = model.apply({"params": params}, probes_vae, method=model.encode)
    zc = data["moments"].shape[-1] // 2
    np.testing.assert_allclose(
        np.asarray(posterior.mean), data["moments"][..., :zc], rtol=2e-4, atol=2e-4
    )
    # encode() clips logvar to [-30, 20]; apply the same clip to the golden
    np.testing.assert_allclose(
        np.asarray(posterior.logvar),
        np.clip(data["moments"][..., zc:], -30.0, 20.0),
        rtol=2e-4,
        atol=2e-4,
    )
    z = data["moments"][..., :zc]
    decoded = model.apply({"params": params}, jnp.asarray(z), method=model.decode)
    np.testing.assert_allclose(
        np.asarray(decoded), data["decoded"], rtol=2e-3, atol=2e-3
    )


def test_manifest_assert_catches_divergence(tmp_path):
    """--assert-fixtures must FAIL when the checked-in manifest disagrees."""
    config = AutoencoderConfig.tiny()
    state = make_state(config, seed=4)
    ckpt = tmp_path / "ckpt"
    save_autoencoder_params(config, torch_state_to_flax_params(state), ckpt)

    out = tmp_path / "fixtures"
    out.mkdir()
    # plant a fixture with a wrong shape for one key and one bogus key
    lines = [f"{k}\t{','.join(str(d) for d in v.shape)}" for k, v in sorted(state.items())]
    lines[0] = lines[0].rsplit("\t", 1)[0] + "\t1,2,3"
    lines.append("not.a.real.key\t7")
    (out / "flux_ae_keys.txt").write_text("\n".join(lines) + "\n")

    with pytest.raises(SystemExit):
        _run_record(
            ["--checkpoint", str(ckpt), "--kind", "vae", "--output", str(out),
             "--assert-fixtures"]
        )


@pytest.mark.skipif(
    not (FIXTURES / "vae_goldens.npz").exists(),
    reason="real-checkpoint vae goldens not recorded (needs weights off-pod)",
)
def test_real_vae_goldens():
    """Runs automatically once scripts/record_goldens.py has been pointed at
    a real checkpoint and its npz checked in."""
    from ragb_vae_tpu.models.weights import load_autoencoder_params

    data = np.load(FIXTURES / "vae_goldens.npz")
    ckpt = str(data["checkpoint"])
    config, params = load_autoencoder_params(ckpt)
    model = AutoencoderKL(config)
    probes_vae = jnp.asarray(data["probes"] * 2.0 - 1.0)
    posterior = model.apply({"params": params}, probes_vae, method=model.encode)
    zc = data["moments"].shape[-1] // 2
    np.testing.assert_allclose(
        np.asarray(posterior.mean), data["moments"][..., :zc], rtol=2e-2, atol=2e-2
    )
