"""Independent torch restatement of the FluxTransformer2DModel forward.

Golden source for transformer parity tests (diffusers is not installed in
this image). Consumes the torch-format state dict produced by
`flux_weights.params_to_flux_state` and evaluates the full forward with
torch.nn.functional, mirroring the diffusers semantics: sinusoidal
timestep embedding (cos-first, scale 1000), 3-axis RoPE on adjacent
pairs, AdaLayerNormZero double-stream blocks with joint attention and
RMS q/k norms, single-stream blocks, AdaLayerNormContinuous head.
"""
from __future__ import annotations

import math
from typing import Dict

import numpy as np
import torch
import torch.nn.functional as F

from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig


class TorchFluxRef:
    def __init__(self, config: FluxTransformerConfig, state: Dict[str, np.ndarray]):
        self.cfg = config
        self.state = {k: torch.from_numpy(np.ascontiguousarray(v)).float() for k, v in state.items()}

    # -- primitives ---------------------------------------------------
    def _linear(self, name: str, x: torch.Tensor) -> torch.Tensor:
        w = self.state[f"{name}.weight"]
        b = self.state.get(f"{name}.bias")
        return F.linear(x, w, b)

    def _mlp_embed(self, name: str, x: torch.Tensor) -> torch.Tensor:
        h = self._linear(f"{name}.linear_1", x)
        return self._linear(f"{name}.linear_2", F.silu(h))

    @staticmethod
    def _timestep_embedding(t: torch.Tensor, dim: int = 256) -> torch.Tensor:
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        args = 1000.0 * t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def _rope(self, ids: torch.Tensor):
        cos_parts, sin_parts = [], []
        for axis, dim in enumerate(self.cfg.axes_dims_rope):
            freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).float() / dim))
            angles = ids[:, axis : axis + 1].float() * freqs[None]
            cos_parts.append(torch.repeat_interleave(torch.cos(angles), 2, dim=-1))
            sin_parts.append(torch.repeat_interleave(torch.sin(angles), 2, dim=-1))
        return torch.cat(cos_parts, dim=-1), torch.cat(sin_parts, dim=-1)

    @staticmethod
    def _apply_rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor) -> torch.Tensor:
        pairs = x.reshape(*x.shape[:-1], -1, 2)
        rot = torch.stack([-pairs[..., 1], pairs[..., 0]], dim=-1).reshape(x.shape)
        return x * cos + rot * sin

    def _rms(self, name: str, x: torch.Tensor) -> torch.Tensor:
        w = self.state[f"{name}.weight"]
        var = x.pow(2).mean(dim=-1, keepdim=True)
        return x * torch.rsqrt(var + 1e-6) * w

    @staticmethod
    def _ln(x: torch.Tensor) -> torch.Tensor:
        return F.layer_norm(x, (x.shape[-1],), eps=1e-6)

    def _heads(self, x: torch.Tensor) -> torch.Tensor:
        b, s, _ = x.shape
        return x.reshape(b, s, self.cfg.num_attention_heads, -1).transpose(1, 2)

    @staticmethod
    def _merge(x: torch.Tensor) -> torch.Tensor:
        b, h, s, d = x.shape
        return x.transpose(1, 2).reshape(b, s, h * d)

    # -- blocks -------------------------------------------------------
    def _ada_zero(self, name: str, x: torch.Tensor, temb: torch.Tensor, chunks: int):
        emb = self._linear(f"{name}.linear", F.silu(temb))
        parts = emb[:, None, :].chunk(chunks, dim=-1)
        shift, scale = parts[0], parts[1]
        return self._ln(x) * (1 + scale) + shift, parts[2:]

    def _attention(self, q, k, v):
        scale = 1.0 / math.sqrt(q.shape[-1])
        weights = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
        return weights @ v

    def forward(
        self,
        hidden_states: np.ndarray,
        encoder_hidden_states: np.ndarray,
        pooled_projections: np.ndarray,
        timestep: np.ndarray,
        img_ids: np.ndarray,
        txt_ids: np.ndarray,
        guidance: np.ndarray,
    ) -> np.ndarray:
        cfg = self.cfg
        img = torch.from_numpy(np.asarray(hidden_states)).float()
        txt = torch.from_numpy(np.asarray(encoder_hidden_states)).float()
        pooled = torch.from_numpy(np.asarray(pooled_projections)).float()
        t = torch.from_numpy(np.asarray(timestep)).float()

        img = self._linear("x_embedder", img)
        txt = self._linear("context_embedder", txt)

        temb = self._mlp_embed(
            "time_text_embed.timestep_embedder", self._timestep_embedding(t)
        )
        if cfg.guidance_embeds:
            g = torch.from_numpy(np.asarray(guidance)).float()
            temb = temb + self._mlp_embed(
                "time_text_embed.guidance_embedder", self._timestep_embedding(g)
            )
        temb = temb + self._mlp_embed("time_text_embed.text_embedder", pooled)

        ids = torch.from_numpy(
            np.concatenate([np.asarray(txt_ids), np.asarray(img_ids)], axis=0)
        ).float()
        cos, sin = self._rope(ids)
        txt_seq = txt.shape[1]

        for i in range(cfg.num_layers):
            p = f"transformer_blocks.{i}"
            n_img, (g_msa, s_mlp, sc_mlp, g_mlp) = self._ada_zero(f"{p}.norm1", img, temb, 6)
            n_txt, (cg_msa, cs_mlp, csc_mlp, cg_mlp) = self._ada_zero(
                f"{p}.norm1_context", txt, temb, 6
            )
            q = self._rms(f"{p}.attn.norm_q", self._heads(self._linear(f"{p}.attn.to_q", n_img)))
            k = self._rms(f"{p}.attn.norm_k", self._heads(self._linear(f"{p}.attn.to_k", n_img)))
            v = self._heads(self._linear(f"{p}.attn.to_v", n_img))
            tq = self._rms(
                f"{p}.attn.norm_added_q", self._heads(self._linear(f"{p}.attn.add_q_proj", n_txt))
            )
            tk = self._rms(
                f"{p}.attn.norm_added_k", self._heads(self._linear(f"{p}.attn.add_k_proj", n_txt))
            )
            tv = self._heads(self._linear(f"{p}.attn.add_v_proj", n_txt))
            q = self._apply_rope(torch.cat([tq, q], dim=2), cos, sin)
            k = self._apply_rope(torch.cat([tk, k], dim=2), cos, sin)
            v = torch.cat([tv, v], dim=2)
            out = self._merge(self._attention(q, k, v))
            attn_txt, attn_img = out[:, :txt_seq], out[:, txt_seq:]
            img = img + g_msa * self._linear(f"{p}.attn.to_out.0", attn_img)
            n2 = self._ln(img) * (1 + sc_mlp) + s_mlp
            ff = self._linear(
                f"{p}.ff.net.2", F.gelu(self._linear(f"{p}.ff.net.0.proj", n2), approximate="tanh")
            )
            img = img + g_mlp * ff
            txt = txt + cg_msa * self._linear(f"{p}.attn.to_add_out", attn_txt)
            n2c = self._ln(txt) * (1 + csc_mlp) + cs_mlp
            ffc = self._linear(
                f"{p}.ff_context.net.2",
                F.gelu(self._linear(f"{p}.ff_context.net.0.proj", n2c), approximate="tanh"),
            )
            txt = txt + cg_mlp * ffc

        x = torch.cat([txt, img], dim=1)
        for i in range(cfg.num_single_layers):
            p = f"single_transformer_blocks.{i}"
            residual = x
            n_x, (gate,) = self._ada_zero(f"{p}.norm", x, temb, 3)
            mlp = F.gelu(self._linear(f"{p}.proj_mlp", n_x), approximate="tanh")
            q = self._rms(f"{p}.attn.norm_q", self._heads(self._linear(f"{p}.attn.to_q", n_x)))
            k = self._rms(f"{p}.attn.norm_k", self._heads(self._linear(f"{p}.attn.to_k", n_x)))
            v = self._heads(self._linear(f"{p}.attn.to_v", n_x))
            q = self._apply_rope(q, cos, sin)
            k = self._apply_rope(k, cos, sin)
            attn = self._merge(self._attention(q, k, v))
            x = residual + gate * self._linear(f"{p}.proj_out", torch.cat([attn, mlp], dim=-1))

        x = x[:, txt_seq:]
        emb = self._linear("norm_out.linear", F.silu(temb))
        scale, shift = emb[:, None, :].chunk(2, dim=-1)
        x = self._ln(x) * (1 + scale) + shift
        return self._linear("proj_out", x).numpy()
