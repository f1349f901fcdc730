"""Independent torch restatement of the diffusers AutoencoderKL forward.

Used as the golden source for parity tests (diffusers itself is not
installed in this image). Generates a random state dict with diffusers key
names and evaluates encoder/decoder functionally with torch.nn.functional,
mirroring ResnetBlock2D / Attention / Downsample2D / Upsample2D semantics.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import torch
import torch.nn.functional as F

from ragb_vae_tpu.models.vae_config import AutoencoderConfig


def make_state(config: AutoencoderConfig, seed: int = 0, scale: float = 0.05) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    state: Dict[str, np.ndarray] = {}

    def conv(name, cout, cin, k=3):
        state[f"{name}.weight"] = rng.normal(0, scale, size=(cout, cin, k, k)).astype(np.float32)
        state[f"{name}.bias"] = rng.normal(0, scale, size=(cout,)).astype(np.float32)

    def norm(name, c):
        state[f"{name}.weight"] = rng.normal(1.0, scale, size=(c,)).astype(np.float32)
        state[f"{name}.bias"] = rng.normal(0, scale, size=(c,)).astype(np.float32)

    def linear(name, cout, cin):
        state[f"{name}.weight"] = rng.normal(0, scale, size=(cout, cin)).astype(np.float32)
        state[f"{name}.bias"] = rng.normal(0, scale, size=(cout,)).astype(np.float32)

    def resnet(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cout, cin)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cout, cin, k=1)

    def mid(name, c):
        resnet(f"{name}.resnets.0", c, c)
        if config.mid_block_add_attention:
            norm(f"{name}.attentions.0.group_norm", c)
            for proj in ("to_q", "to_k", "to_v", "to_out.0"):
                linear(f"{name}.attentions.0.{proj}", c, c)
        resnet(f"{name}.resnets.1", c, c)

    ch = config.block_out_channels
    # encoder
    conv("encoder.conv_in", ch[0], config.in_channels)
    prev = ch[0]
    for i, cout in enumerate(ch):
        for j in range(config.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", prev if j == 0 else cout, cout)
        prev = cout
        if i < len(ch) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", cout, cout)
    mid("encoder.mid_block", ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", 2 * config.latent_channels, ch[-1])

    # decoder
    rev = list(reversed(ch))
    conv("decoder.conv_in", rev[0], config.latent_channels)
    mid("decoder.mid_block", rev[0])
    prev = rev[0]
    for i, cout in enumerate(rev):
        for j in range(config.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", prev if j == 0 else cout, cout)
        prev = cout
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", cout, cout)
    norm("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", config.out_channels, rev[-1])

    if config.use_quant_conv:
        conv("quant_conv", 2 * config.latent_channels, 2 * config.latent_channels, k=1)
    if config.use_post_quant_conv:
        conv("post_quant_conv", config.latent_channels, config.latent_channels, k=1)
    return state


class TorchVAERef:
    def __init__(self, config: AutoencoderConfig, state: Dict[str, np.ndarray]):
        self.cfg = config
        self.t = {k: torch.from_numpy(v) for k, v in state.items()}

    def _conv(self, name, x, stride=1, padding=1):
        return F.conv2d(x, self.t[f"{name}.weight"], self.t[f"{name}.bias"], stride=stride, padding=padding)

    def _norm(self, name, x):
        return F.group_norm(x, self.cfg.norm_num_groups, self.t[f"{name}.weight"], self.t[f"{name}.bias"], eps=1e-6)

    def _linear(self, name, x):
        return F.linear(x, self.t[f"{name}.weight"], self.t[f"{name}.bias"])

    def _resnet(self, name, x):
        h = self._conv(f"{name}.conv1", F.silu(self._norm(f"{name}.norm1", x)))
        h = self._conv(f"{name}.conv2", F.silu(self._norm(f"{name}.norm2", h)))
        if f"{name}.conv_shortcut.weight" in self.t:
            x = self._conv(f"{name}.conv_shortcut", x, padding=0)
        return x + h

    def _attention(self, name, x):
        b, c, h, w = x.shape
        y = self._norm(f"{name}.group_norm", x)
        y = y.view(b, c, h * w).transpose(1, 2)
        q = self._linear(f"{name}.to_q", y)
        k = self._linear(f"{name}.to_k", y)
        v = self._linear(f"{name}.to_v", y)
        attn = torch.softmax(q @ k.transpose(1, 2) / (c**0.5), dim=-1) @ v
        out = self._linear(f"{name}.to_out.0", attn)
        return x + out.transpose(1, 2).view(b, c, h, w)

    def _mid(self, name, x):
        x = self._resnet(f"{name}.resnets.0", x)
        if self.cfg.mid_block_add_attention:
            x = self._attention(f"{name}.attentions.0", x)
        return self._resnet(f"{name}.resnets.1", x)

    @torch.no_grad()
    def encode_moments(self, x: torch.Tensor) -> torch.Tensor:
        cfg = self.cfg
        x = self._conv("encoder.conv_in", x)
        for i in range(len(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block):
                x = self._resnet(f"encoder.down_blocks.{i}.resnets.{j}", x)
            if i < len(cfg.block_out_channels) - 1:
                x = F.pad(x, (0, 1, 0, 1))
                x = self._conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", x, stride=2, padding=0)
        x = self._mid("encoder.mid_block", x)
        x = self._conv("encoder.conv_out", F.silu(self._norm("encoder.conv_norm_out", x)))
        if cfg.use_quant_conv:
            x = self._conv("quant_conv", x, padding=0)
        return x

    @torch.no_grad()
    def decode(self, z: torch.Tensor) -> torch.Tensor:
        cfg = self.cfg
        if cfg.use_post_quant_conv:
            z = self._conv("post_quant_conv", z, padding=0)
        z = self._conv("decoder.conv_in", z)
        z = self._mid("decoder.mid_block", z)
        for i in range(len(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                z = self._resnet(f"decoder.up_blocks.{i}.resnets.{j}", z)
            if i < len(cfg.block_out_channels) - 1:
                z = F.interpolate(z, scale_factor=2.0, mode="nearest")
                z = self._conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", z)
        z = self._conv("decoder.conv_out", F.silu(self._norm("decoder.conv_norm_out", z)))
        return z
