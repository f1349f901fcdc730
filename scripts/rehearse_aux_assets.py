#!/usr/bin/env python
"""Rehearse the two auxiliary weight-drop assets against synthetic twins.

Companion to `rehearse_real_geometry.py` (which covers the FLUX VAE +
transformer checkpoints): this drives the two remaining asset-loading
surfaces that real weights will hit on weight-drop day
(docs/weight_drop.md steps 3-4), with synthetic files at the REAL key /
shape / directory inventory:

1. **LPIPS VGG16** (reference `src/models/losses.py:50-57` loads
   `lpips.LPIPS(net="vgg")`): a synthetic state dict with the real
   `net.sliceK.N.weight/bias` + `linK.model.1.weight` +
   `scaling_layer.shift/scale` key inventory at the real VGG16 shapes is
   written as BOTH `.safetensors` and `.pt` and pulled through
   `models/lpips.py:load_lpips_params` / `maybe_build_lpips`; the same
   tensors restated under the bare-torchvision `features.N.*` key format
   must import to bitwise-identical distances (the importer accepts both).

2. **CLIP+T5 empty-prompt export** (reference
   `src/models/flux_kontext_textalpha.py:86-146`): mock HF directory
   layouts — `tokenizer/` (CLIP BPE vocab.json + merges.txt),
   `tokenizer_2/` (T5 fast tokenizer.json), `text_encoder/` +
   `text_encoder_2/` (config.json + model.safetensors via the real
   `save_pretrained`) — driven through `scripts/export_empty_prompt.py`'s
   literal CLI, i.e. the actual `from_pretrained` calls that
   tests/test_empty_prompt.py's monkeypatched-encoder tests deliberately
   skip. Asserts output npz shapes, the T5-only fallback branch (CLIP
   hidden != T5 hidden, as in real FLUX), and the npz cache short-circuit.

`--small` shrinks encoder widths for CI (tests/test_rehearse_aux.py);
full mode uses the REAL CLIP-L / T5-XXL geometry (~19 GiB of fp32
safetensors — needs ~45 GiB free disk + RAM, several minutes on 1 core).
"""
from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

# Host-only script (torch + file IO; jax only transitively). The axon
# sitecustomize would open the tunneled-TPU PJRT client at backend init
# even under JAX_PLATFORMS=cpu and hang when the tunnel is down/busy —
# strip it for this process's imports AND the export_empty_prompt
# subprocess (same pattern as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and "axon_site" not in p
)
# env vars are read too late when sitecustomize preloaded jax — the config
# update is what actually wins (tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# 1. LPIPS
# ---------------------------------------------------------------------------
def rehearse_lpips(workdir: Path) -> None:
    import torch

    from ragb_vae_tpu.models.lpips import (
        load_lpips_params,
        lpips_distance,
        maybe_build_lpips,
    )
    from ragb_vae_tpu.models.weights import save_torch_state
    from tests.torch_lpips_ref import VGG16_CONVS, make_lpips_state

    # real inventory: net.sliceK.N conv keys + lin heads (torch_lpips_ref
    # emits exactly those) + the ScalingLayer buffers a real
    # lpips.LPIPS(net="vgg").state_dict() also contains — the importer
    # must skip them, not crash
    state = make_lpips_state(seed=7)
    state["scaling_layer.shift"] = np.array(
        [[[[-0.030]], [[-0.088]], [[-0.188]]]], np.float32
    )
    state["scaling_layer.scale"] = np.array(
        [[[[0.458]], [[0.448]], [[0.450]]]], np.float32
    )

    st_path = workdir / "lpips_vgg.safetensors"
    pt_path = workdir / "lpips_vgg.pt"
    save_torch_state(state, st_path)
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, pt_path)

    ref_params = None
    dists = {}
    rng = np.random.default_rng(0)
    pred = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    target = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    for tag, path in [("safetensors", st_path), ("pt", pt_path)]:
        params = load_lpips_params(path)
        assert sorted(params.convs) == sorted(VGG16_CONVS), (
            tag, sorted(params.convs))
        for idx, (cin, cout) in VGG16_CONVS.items():
            k = params.convs[idx]["kernel"]
            assert k.shape == (3, 3, cin, cout), (tag, idx, k.shape)  # HWIO
            assert params.convs[idx]["bias"].shape == (cout,)
        assert len(params.lins) == 5 and all((l >= 0).all() for l in params.lins)
        dists[tag] = np.asarray(lpips_distance(pred, target, params))
        assert np.isfinite(dists[tag]).all()
        ref_params = params
    assert np.array_equal(dists["safetensors"], dists["pt"]), (
        "formats imported different values")

    # the bare-torchvision alias format must import to the same distances
    feat_state = {}
    for idx in VGG16_CONVS:
        feat_state[f"features.{idx}.weight"] = next(
            v for k, v in state.items()
            if k.endswith(f".{idx}.weight") and k.startswith("net.")
        )
        feat_state[f"features.{idx}.bias"] = next(
            v for k, v in state.items()
            if k.endswith(f".{idx}.bias") and k.startswith("net.")
        )
    for k, v in state.items():
        if k.startswith("lin"):
            feat_state[k] = v
    feat_path = workdir / "vgg16_features.safetensors"
    save_torch_state(feat_state, feat_path)
    d_feat = np.asarray(lpips_distance(pred, target, load_lpips_params(feat_path)))
    assert np.array_equal(d_feat, dists["safetensors"]), "alias format diverged"

    # the training-stage entry point (training.lpips_weights wiring)
    fn = maybe_build_lpips(st_path)
    assert fn is not None
    rgba_pred = rng.random((2, 32, 32, 4)).astype(np.float32) * 2 - 1
    rgba_tgt = rng.random((2, 32, 32, 4)).astype(np.float32) * 2 - 1
    loss = float(np.asarray(fn(rgba_pred, rgba_tgt)))
    assert np.isfinite(loss)
    print(f"[rehearse-aux] LPIPS: 13 convs + 5 lins imported from "
          f"safetensors/pt/features formats, identical distances; "
          f"perceptual_loss={loss:.4f}")


# ---------------------------------------------------------------------------
# 2. HF text-encoder directory layouts -> export_empty_prompt.py
# ---------------------------------------------------------------------------
def _write_clip_tokenizer(d: Path) -> None:
    """Minimal-but-real CLIP BPE files (what openai/clip-vit-large ships)."""
    d.mkdir(parents=True, exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, tok in enumerate(["a</w>", "photo</w>", "of</w>", "cat</w>", "!"]):
        vocab[tok] = 2 + i
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "model_max_length": 77,
        "bos_token": "<|startoftext|>",
        "eos_token": "<|endoftext|>",
        "pad_token": "<|endoftext|>",
        "unk_token": "<|endoftext|>",
        "tokenizer_class": "CLIPTokenizer",
    }))
    (d / "special_tokens_map.json").write_text(json.dumps({
        "bos_token": "<|startoftext|>",
        "eos_token": "<|endoftext|>",
        "pad_token": "<|endoftext|>",
        "unk_token": "<|endoftext|>",
    }))


def _write_t5_tokenizer(d: Path) -> None:
    """T5 fast tokenizer from a hand-built Unigram tokenizer.json (no
    sentencepiece binary needed — the fast serialization is pure JSON)."""
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram
    from transformers import T5TokenizerFast

    d.mkdir(parents=True, exist_ok=True)
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0),
              ("▁", -2.0), ("▁the", -3.0), ("a", -3.5)]
    tok = Tokenizer(Unigram(pieces, unk_id=2))
    tmp = d / "tokenizer.json"
    tok.save(str(tmp))
    fast = T5TokenizerFast(
        tokenizer_file=str(tmp), eos_token="</s>", unk_token="<unk>",
        pad_token="<pad>", model_max_length=512,
    )
    fast.save_pretrained(str(d))


def rehearse_text_encoders(workdir: Path, small: bool) -> None:
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel, T5Config, T5EncoderModel

    root = workdir / "flux_hf_layout"
    _write_clip_tokenizer(root / "tokenizer")
    _write_t5_tokenizer(root / "tokenizer_2")

    if small:
        clip_cfg = CLIPTextConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77,
        )
        t5_cfg = T5Config(
            vocab_size=64, d_model=64, d_ff=128, d_kv=16,
            num_layers=2, num_heads=4, decoder_start_token_id=0,
        )
        t5_hidden, clip_hidden = 64, 32
    else:
        # REAL geometry: CLIP-L/14 text tower + T5-v1.1-XXL encoder — the
        # exact configs FLUX.1 ships (openai/clip-vit-large-patch14,
        # google/t5-v1_1-xxl)
        clip_cfg = CLIPTextConfig(
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77,
        )
        t5_cfg = T5Config(
            vocab_size=32128, d_model=4096, d_ff=10240, d_kv=64,
            num_layers=24, num_heads=64, feed_forward_proj="gated-gelu",
            decoder_start_token_id=0,
        )
        t5_hidden, clip_hidden = 4096, 768

    torch.manual_seed(0)
    with torch.no_grad():
        clip = CLIPTextModel(clip_cfg)
        clip.save_pretrained(str(root / "text_encoder"), safe_serialization=True)
        del clip
        t5 = T5EncoderModel(t5_cfg)
        t5.save_pretrained(
            str(root / "text_encoder_2"), safe_serialization=True,
            max_shard_size="4GB",
        )
        n_t5 = sum(p.numel() for p in t5.parameters())
        del t5
    print(f"[rehearse-aux] wrote HF layout at {root} "
          f"(T5 {n_t5/1e9:.2f}B params, clip hidden {clip_hidden})")

    # the literal weight-drop-day CLI, twice: real export, then cache hit
    for run in ("export", "cache"):
        out = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "export_empty_prompt.py"),
             "--model-path", str(root)],
            check=True, capture_output=True, text=True,
        )
        print(f"[rehearse-aux] export_empty_prompt ({run}): "
              f"{out.stdout.strip().splitlines()[-1]}")

    npz = np.load(root / "empty_prompt_embeds.npz")
    prompt, pooled, text_ids = (
        npz["prompt_embeds"], npz["pooled_prompt_embeds"], npz["text_ids"])
    # CLIP hidden != T5 hidden in both modes -> the T5-only fallback branch,
    # exactly the branch real FLUX takes (768 vs 4096)
    assert prompt.shape == (1, 512, t5_hidden), prompt.shape
    assert pooled.shape == (1, clip_hidden), pooled.shape
    assert text_ids.shape == (512, 3), text_ids.shape
    assert np.isfinite(prompt).all() and np.isfinite(pooled).all()

    # the model constructor consumes the npz (priority over re-encoding)
    from ragb_vae_tpu.models.flux_kontext_textalpha import encode_empty_prompt

    p2, _, _ = encode_empty_prompt(root)
    assert np.array_equal(p2, prompt)
    print("[rehearse-aux] empty-prompt npz: shapes/branch/cache all OK")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--small", action="store_true",
                    help="reduced encoder widths (CI mode); full mode is the "
                    "real CLIP-L + T5-XXL geometry (~19 GiB on disk)")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-lpips", action="store_true")
    ap.add_argument("--skip-encoders", action="store_true")
    args = ap.parse_args()

    workdir = Path(args.workdir) if args.workdir else Path(
        tempfile.mkdtemp(prefix="aux_assets_"))
    workdir.mkdir(parents=True, exist_ok=True)
    print(f"[rehearse-aux] workdir {workdir} (small={args.small})")
    try:
        if not args.skip_lpips:
            rehearse_lpips(workdir)
        if not args.skip_encoders:
            rehearse_text_encoders(workdir, args.small)
        print("[rehearse-aux] ALL AUX-ASSET REHEARSALS PASSED at "
              + ("small" if args.small else "REAL") + " geometry")
        return 0
    finally:
        if not args.keep and args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
