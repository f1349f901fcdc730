#!/usr/bin/env python
"""Record ground-truth key manifests + golden activations from a REAL
checkpoint directory.

The deepest unproven assumption in this repo's parity suite is that the
checked-in key manifests (tests/fixtures/*.txt, hand-restated from the
diffusers module definitions) match a real FLUX/Qwen checkpoint, and that
our converters + models reproduce real-weight activations (VERDICT.md
round-2 missing #1). This harness turns that environmental blocker into a
one-command validation the day weights are reachable:

    python scripts/record_goldens.py --checkpoint /path/to/flux --kind vae \
        --vae-subfolder ae --output tests/fixtures --assert-fixtures
    python scripts/record_goldens.py --checkpoint /path/to/flux \
        --kind transformer --output tests/fixtures

It dumps, per model kind:
  (a) `<kind>_keys_recorded.txt` — the TRUE state-dict key/shape manifest,
      straight from the safetensors file(s), same `key\tshape,...` format
      as tests/gen_key_manifests.py writes; with --assert-fixtures it is
      diffed against the checked-in fixture (flux_ae_keys.txt /
      flux_transformer_keys.txt) and mismatches fail the run.
  (b) `<kind>_goldens.npz` — golden activations for seeded probe inputs:
      * preferred source: the real torch models via `diffusers`
        (AutoencoderKL / FluxTransformer2DModel — what the reference loads,
        reference src/models/flux_kontext_textalpha.py:22-53,
        src/models/rgba_vae.py:230-272);
      * offline fallback: the in-repo independent torch restatements
        (tests/torch_vae_ref.py, tests/torch_flux_ref.py) loaded with the
        REAL weights — still pins converter + weight-layout correctness.
      The npz records which source produced it (`source` field).

tests/test_record_goldens.py consumes the npz: when one is present under
tests/fixtures/, the JAX models must reproduce it within bf16 tolerance;
a synthetic-checkpoint test keeps the whole pipeline exercised in CI.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PROBE_SEED = 2024
N_PROBES = 3


def dump_manifest(state: dict, path: Path) -> None:
    lines = [
        f"{key}\t{','.join(str(int(d)) for d in np.asarray(val).shape)}"
        for key, val in sorted(state.items())
    ]
    path.write_text("\n".join(lines) + "\n")
    print(f"[record_goldens] wrote {len(lines)} keys -> {path}")


def assert_fixture_match(recorded: Path, fixture: Path) -> None:
    if not fixture.exists():
        print(f"[record_goldens] no fixture at {fixture}; skipping assert")
        return
    rec = dict(l.split("\t") for l in recorded.read_text().splitlines() if l)
    fix = dict(l.split("\t") for l in fixture.read_text().splitlines() if l)
    missing = sorted(set(fix) - set(rec))
    extra = sorted(set(rec) - set(fix))
    shape_diff = sorted(k for k in set(rec) & set(fix) if rec[k] != fix[k])
    if missing or extra or shape_diff:
        for k in missing[:20]:
            print(f"  fixture-only key: {k}")
        for k in extra[:20]:
            print(f"  checkpoint-only key: {k}")
        for k in shape_diff[:20]:
            print(f"  shape mismatch: {k}: fixture {fix[k]} vs checkpoint {rec[k]}")
        raise SystemExit(
            f"fixture mismatch vs {fixture.name}: {len(missing)} missing, "
            f"{len(extra)} extra, {len(shape_diff)} shape diffs"
        )
    print(f"[record_goldens] fixture {fixture.name} matches the real checkpoint")


# ---------------------------------------------------------------------------
# VAE goldens
# ---------------------------------------------------------------------------
def record_vae(ckpt: Path, subfolder: str, out_dir: Path, assert_fixtures: bool) -> None:
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig
    from ragb_vae_tpu.models.weights import (
        _locate_weight_file,
        _resolve_checkpoint_dir,
        load_torch_state,
    )

    ckpt_dir = _resolve_checkpoint_dir(ckpt, subfolder or None)
    state = load_torch_state(_locate_weight_file(ckpt_dir))
    recorded = out_dir / "vae_keys_recorded.txt"
    dump_manifest(state, recorded)
    if assert_fixtures:
        assert_fixture_match(recorded, out_dir / "flux_ae_keys.txt")

    config = AutoencoderConfig.from_json(ckpt_dir / "config.json")
    in_ch = int(np.asarray(state["encoder.conv_in.weight"]).shape[1])
    size = 64
    rng = np.random.default_rng(PROBE_SEED)
    probes = rng.uniform(0.0, 1.0, (N_PROBES, size, size, in_ch)).astype(np.float32)
    probes_vae = probes * 2.0 - 1.0  # [-1, 1] VAE range, NHWC

    import torch

    x_nchw = torch.from_numpy(probes_vae.transpose(0, 3, 1, 2))
    source = None
    try:
        from diffusers import AutoencoderKL  # real model, preferred

        model = AutoencoderKL.from_pretrained(str(ckpt_dir))
        model.eval()
        with torch.no_grad():
            posterior = model.encode(x_nchw).latent_dist
            moments = torch.cat([posterior.mean, posterior.logvar], dim=1)
            decoded = model.decode(posterior.mean).sample
        source = "diffusers.AutoencoderKL"
    except ImportError:
        from tests.torch_vae_ref import TorchVAERef  # offline restatement

        ref = TorchVAERef(config, {k: np.asarray(v) for k, v in state.items()})
        with torch.no_grad():
            moments = ref.encode_moments(x_nchw)
            z = moments[:, : moments.shape[1] // 2]
            decoded = ref.decode(z)
        source = "tests.torch_vae_ref (restatement + real weights)"

    np.savez(
        out_dir / "vae_goldens.npz",
        probes=probes,  # NHWC in [0, 1]
        moments=moments.numpy().transpose(0, 2, 3, 1),  # NHWC (mean|logvar)
        decoded=decoded.numpy().transpose(0, 2, 3, 1),  # NHWC in VAE range
        source=np.asarray(source),
        checkpoint=np.asarray(str(ckpt_dir)),
    )
    print(f"[record_goldens] wrote vae_goldens.npz (source: {source})")


# ---------------------------------------------------------------------------
# Transformer goldens
# ---------------------------------------------------------------------------
def record_transformer(ckpt: Path, out_dir: Path, assert_fixtures: bool) -> None:
    from ragb_vae_tpu.models.flux_weights import (
        _load_state_maybe_sharded,
        FluxTransformerConfig,
    )

    directory = Path(ckpt)
    if (directory / "transformer").exists():
        directory = directory / "transformer"
    state = _load_state_maybe_sharded(directory)
    recorded = out_dir / "transformer_keys_recorded.txt"
    dump_manifest(state, recorded)
    if assert_fixtures:
        assert_fixture_match(recorded, out_dir / "flux_transformer_keys.txt")

    config = FluxTransformerConfig.from_json(directory / "config.json")
    rng = np.random.default_rng(PROBE_SEED)
    seq, txt_seq, bsz = 16, 8, 2
    inputs = dict(
        hidden_states=rng.standard_normal((bsz, seq, config.in_channels)).astype(np.float32),
        encoder_hidden_states=rng.standard_normal(
            (bsz, txt_seq, config.joint_attention_dim)
        ).astype(np.float32),
        pooled_projections=rng.standard_normal(
            (bsz, config.pooled_projection_dim)
        ).astype(np.float32),
        timestep=np.asarray([0.5, 0.25], np.float32),
        img_ids=rng.integers(0, 8, (seq, 3)).astype(np.float32),
        txt_ids=np.zeros((txt_seq, 3), np.float32),
        guidance=np.full((bsz,), 3.5, np.float32) if config.guidance_embeds else None,
    )

    source = None
    try:
        import torch
        from diffusers import FluxTransformer2DModel

        model = FluxTransformer2DModel.from_pretrained(str(directory))
        model.eval()
        with torch.no_grad():
            out = model(
                hidden_states=torch.from_numpy(inputs["hidden_states"]),
                encoder_hidden_states=torch.from_numpy(inputs["encoder_hidden_states"]),
                pooled_projections=torch.from_numpy(inputs["pooled_projections"]),
                timestep=torch.from_numpy(inputs["timestep"]),
                img_ids=torch.from_numpy(inputs["img_ids"]),
                txt_ids=torch.from_numpy(inputs["txt_ids"]),
                guidance=(
                    torch.from_numpy(inputs["guidance"])
                    if inputs["guidance"] is not None
                    else None
                ),
                return_dict=False,
            )[0].numpy()
        source = "diffusers.FluxTransformer2DModel"
    except ImportError:
        from tests.torch_flux_ref import TorchFluxRef

        ref = TorchFluxRef(config, {k: np.asarray(v) for k, v in state.items()})
        out = ref.forward(**inputs)
        source = "tests.torch_flux_ref (restatement + real weights)"

    arrays = {k: v for k, v in inputs.items() if v is not None}
    np.savez(
        out_dir / "transformer_goldens.npz",
        output=out,
        source=np.asarray(source),
        checkpoint=np.asarray(str(directory)),
        **arrays,
    )
    print(f"[record_goldens] wrote transformer_goldens.npz (source: {source})")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--checkpoint", required=True, help="HF-format checkpoint dir")
    parser.add_argument("--kind", choices=("vae", "transformer"), required=True)
    parser.add_argument("--vae-subfolder", default="", help="e.g. 'ae' or 'vae'")
    parser.add_argument("--output", default=str(REPO / "tests" / "fixtures"))
    parser.add_argument(
        "--assert-fixtures",
        action="store_true",
        help="fail if the checked-in key manifests disagree with the checkpoint",
    )
    args = parser.parse_args(argv)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.kind == "vae":
        record_vae(Path(args.checkpoint), args.vae_subfolder, out_dir, args.assert_fixtures)
    else:
        record_transformer(Path(args.checkpoint), out_dir, args.assert_fixtures)


if __name__ == "__main__":
    main()
