"""encode_empty_prompt: CLIP+T5 concat branch, T5-only fallback branch, and
the npz cache (VERDICT round-3 item 7).

The reference recomputes empty-prompt embeddings at every startup and
falls back to the T5-only stream when the CLIP/T5 hidden dims mismatch
(reference src/models/flux_kontext_textalpha.py:86-146, :139-142). Real
encoders are network-blocked on the pod, so both branches run here against
a mocked encoder pair — on weight-drop day only
`scripts/export_empty_prompt.py --model-path <dir>` remains.
"""
from __future__ import annotations

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ragb_vae_tpu.models.flux_kontext_textalpha import (  # noqa: E402
    EMPTY_PROMPT_FILE,
    encode_empty_prompt,
)

CLIP_LEN, T5_LEN = 7, 11


class _FakeTokenizer:
    def __init__(self, max_length: int):
        self.model_max_length = max_length

    @classmethod
    def from_pretrained(cls, path, **kw):
        raise AssertionError("patched per-test")

    def __call__(self, texts, **kw):
        n = len(texts)
        return {
            "input_ids": torch.zeros((n, self.model_max_length), dtype=torch.long)
        }


class _FakeEncoder(torch.nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim
        self.text_model = types.SimpleNamespace(
            final_layer_norm=torch.nn.LayerNorm(dim)
        )

    def forward(self, input_ids=None, **kw):
        g = torch.Generator().manual_seed(self.dim)
        hidden = torch.randn(
            input_ids.shape[0], input_ids.shape[1], self.dim, generator=g
        )
        return types.SimpleNamespace(last_hidden_state=hidden)


def _patch_encoders(monkeypatch, clip_dim: int, t5_dim: int, calls=None):
    import sys

    import transformers  # noqa: F401

    # transformers is a lazy module, and materializing the torch modeling
    # classes (CLIPTextModel et al.) REPLACES sys.modules["transformers"]
    # with a fresh module object.  Materialize all four attributes first,
    # re-reading sys.modules each time, then patch the FINAL module object —
    # that is the one `from transformers import X` resolves at call time.
    for name in ("CLIPTokenizer", "T5TokenizerFast", "CLIPTextModel", "T5EncoderModel"):
        getattr(sys.modules["transformers"], name)
    transformers = sys.modules["transformers"]

    def tok(max_length):
        def from_pretrained(path, **kw):
            if calls is not None:
                calls.append(str(path))
            return _FakeTokenizer(max_length)

        return types.SimpleNamespace(from_pretrained=from_pretrained)

    def enc(dim):
        def from_pretrained(path, **kw):
            if calls is not None:
                calls.append(str(path))
            return _FakeEncoder(dim)

        return types.SimpleNamespace(from_pretrained=from_pretrained)

    monkeypatch.setattr(transformers, "CLIPTokenizer", tok(CLIP_LEN))
    monkeypatch.setattr(transformers, "T5TokenizerFast", tok(T5_LEN))
    monkeypatch.setattr(transformers, "CLIPTextModel", enc(clip_dim))
    monkeypatch.setattr(transformers, "T5EncoderModel", enc(t5_dim))


def test_matching_dims_concatenates_clip_then_t5(monkeypatch, tmp_path):
    _patch_encoders(monkeypatch, clip_dim=64, t5_dim=64)
    prompt, pooled, text_ids = encode_empty_prompt(tmp_path)
    assert prompt.shape == (1, CLIP_LEN + T5_LEN, 64)
    assert pooled.shape == (1, 64)
    assert text_ids.shape == (CLIP_LEN + T5_LEN, 3)
    assert np.all(text_ids == 0)
    # CLIP stream first (reference :128-138 ordering)
    clip_part = torch.randn(1, CLIP_LEN, 64, generator=torch.Generator().manual_seed(64))
    np.testing.assert_allclose(prompt[:, :CLIP_LEN], clip_part.numpy(), rtol=1e-6)
    assert (tmp_path / EMPTY_PROMPT_FILE).exists()


def test_dim_mismatch_falls_back_to_t5_only(monkeypatch, tmp_path):
    _patch_encoders(monkeypatch, clip_dim=64, t5_dim=128)
    prompt, pooled, text_ids = encode_empty_prompt(tmp_path)
    # reference :139-142 — T5 stream alone, CLIP pooled output kept
    assert prompt.shape == (1, T5_LEN, 128)
    assert pooled.shape == (1, 64)
    assert text_ids.shape == (T5_LEN, 3)
    t5 = torch.randn(1, T5_LEN, 128, generator=torch.Generator().manual_seed(128))
    np.testing.assert_allclose(prompt, t5.numpy(), rtol=1e-6)


def test_npz_cache_short_circuits_encoders(monkeypatch, tmp_path):
    calls: list = []
    _patch_encoders(monkeypatch, clip_dim=32, t5_dim=32, calls=calls)
    first = encode_empty_prompt(tmp_path)
    assert calls, "first call must hit the (mocked) encoders"

    import transformers

    def boom(path, **kw):
        raise AssertionError("cache miss: encoders reloaded despite npz")

    for name in ("CLIPTokenizer", "T5TokenizerFast", "CLIPTextModel", "T5EncoderModel"):
        monkeypatch.setattr(
            transformers, name, types.SimpleNamespace(from_pretrained=boom)
        )
    second = encode_empty_prompt(tmp_path)
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_export_script_cli(monkeypatch, tmp_path, capsys):
    _patch_encoders(monkeypatch, clip_dim=16, t5_dim=16)
    import scripts.export_empty_prompt as script

    monkeypatch.setattr(
        "sys.argv", ["export_empty_prompt.py", "--model-path", str(tmp_path)]
    )
    script.main()
    assert (tmp_path / EMPTY_PROMPT_FILE).exists()
    assert "Exported empty prompt embeds" in capsys.readouterr().out
