"""Analytic MXU FLOP counts for the Flux-architecture AutoencoderKL.

Used by bench.py to report MFU (model FLOPs utilization) next to the
raw img/s headline, so per-round perf progress is visible against the
hardware roofline instead of only against the A100 baseline
(benchmarks/results.md "ideal roofline ≈ 11 TFLOP/image").

Counts conv and matmul (attention projection + score/value) FLOPs only —
the MXU work. GroupNorm/SiLU/elementwise are VPU work and excluded, which
makes the MFU estimate slightly optimistic about what the MXU must
sustain; the bias is well under the run-to-run noise.

Walks the same architecture the manifest generator enumerates
(tests/gen_key_manifests.py:flux_ae_keys) and the models implement
(models/vae.py), so the count tracks config changes automatically.
Verified against XLA's compiled cost analysis in tests/test_flops.py.
"""
from __future__ import annotations

from typing import Tuple

from ragb_vae_tpu.models.vae_config import AutoencoderConfig


def _conv(h: int, w: int, cin: int, cout: int, k: int = 3) -> float:
    """Multiply-add pairs counted as 2 FLOPs, at OUTPUT resolution h x w."""
    return 2.0 * h * w * cin * cout * k * k


def _resnet(h: int, w: int, cin: int, cout: int) -> float:
    f = _conv(h, w, cin, cout) + _conv(h, w, cout, cout)
    if cin != cout:
        f += _conv(h, w, cin, cout, k=1)
    return f


def _mid_attention(h: int, w: int, c: int) -> float:
    seq = h * w
    proj = 4 * 2.0 * seq * c * c          # q, k, v, out projections
    scores = 2 * 2.0 * seq * seq * c      # qk^T and attn @ v
    return proj + scores


def _mid_block(h: int, w: int, c: int) -> float:
    return 2 * _resnet(h, w, c, c) + _mid_attention(h, w, c)


def vae_encode_flops(config: AutoencoderConfig, size: int) -> float:
    """MXU FLOPs for one image of `size`^2 through the encoder."""
    ch = list(config.block_out_channels)
    h = w = size
    f = _conv(h, w, config.in_channels, ch[0])
    cin = ch[0]
    for i, cout in enumerate(ch):
        for j in range(config.layers_per_block):
            f += _resnet(h, w, cin if j == 0 else cout, cout)
        cin = cout
        if i < len(ch) - 1:
            h, w = h // 2, w // 2
            f += _conv(h, w, cout, cout)  # strided downsample, output res
    f += _mid_block(h, w, ch[-1])
    f += _conv(h, w, ch[-1], 2 * config.latent_channels)
    return f


def vae_decode_flops(config: AutoencoderConfig, size: int) -> float:
    """MXU FLOPs for one latent decoded back to `size`^2."""
    ch = list(reversed(config.block_out_channels))
    n_down = len(ch) - 1
    h = w = size // (2 ** n_down)
    f = _conv(h, w, config.latent_channels, ch[0])
    f += _mid_block(h, w, ch[0])
    cin = ch[0]
    for i, cout in enumerate(ch):
        for j in range(config.layers_per_block + 1):
            f += _resnet(h, w, cin if j == 0 else cout, cout)
        cin = cout
        if i < len(ch) - 1:
            h, w = h * 2, w * 2
            f += _conv(h, w, cout, cout)  # post-nearest-upsample conv
    f += _conv(h, w, ch[-1], config.out_channels)
    return f


def vae_forward_flops(config: AutoencoderConfig, size: int) -> float:
    """Encode + decode MXU FLOPs per image (the bench.py headline path)."""
    return vae_encode_flops(config, size) + vae_decode_flops(config, size)


# bf16 dense peak per chip, from the public TPU spec sheets.
TPU_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def peak_flops_for(device_kind: str) -> float | None:
    for prefix, peak in TPU_PEAK_FLOPS.items():
        if device_kind.startswith(prefix):
            return peak
    return None


def mfu(img_per_s: float, flops_per_image: float, device_kind: str) -> float | None:
    peak = peak_flops_for(device_kind)
    if peak is None:
        return None
    return img_per_s * flops_per_image / peak
