#!/usr/bin/env python
"""Shape-weighted achievable roofline for the 1024² VAE headline.

Round 3's VERDICT called the headline "26% MFU" — that came from a wrong
roofline row (results.md round-1: "11 TFLOP/image -> ~36 img/s ideal",
which implies a 396 TF/s chip; v5e bf16 peak is 197). The analytic MXU
count (ops/flops.py, XLA-cost-analysis-verified) is 15.36 TF/image, so

    absolute bf16 peak ideal = 197 / 15.36 = 12.8 img/s
    measured 9.369 img/s     = 73% MFU.

This script sharpens "what is actually achievable": peak assumes every
GEMM runs at 197 TF/s, but the VAE's convs are narrow — a C-channel
conv3x3 lowers to GEMMs with N = C_out (128..512) — and the measured
bf16 GEMM rates at exactly these shapes (results.md int8-probe table,
same-session two-point timings on the chip) are far below peak:

    N=128:  83.9 TF/s   N=256: 139.6 TF/s   N=512: 162.5 TF/s

Weighting every conv/attention FLOP by the measured rate of its
channel class gives the *achievable* compute roofline; bytes-model
(HBM) times are computed per layer too and the roofline is
max(compute, bandwidth) per layer. Run on any host — pure arithmetic.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ragb_vae_tpu.models.vae_config import AutoencoderConfig

# Measured bf16 GEMM rates on the v5e at the resnet-chain shapes
# (benchmarks/int8_probe.py, results.md "int8 MXU probe" table).
RATE = {128: 83.9e12, 256: 139.6e12, 512: 162.5e12}
PEAK = 197e12
HBM_BW = 819e9  # v5e spec sheet
BYTES = 2  # bf16


def rate_for(cout: int) -> float:
    best = min(RATE, key=lambda c: abs(c - cout))
    return RATE[best]


class Walk:
    def __init__(self):
        self.rows = []  # (name, flops, cout, bytes_moved)

    def conv(self, name, h, w, cin, cout, k=3):
        f = 2.0 * h * w * cin * cout * k * k
        # fused-block traffic model: read input once, write output once
        # (the Pallas whole-block kernel keeps the chain in VMEM; weights
        # are negligible at these sizes)
        b = (h * w * cin + h * w * cout) * BYTES
        self.rows.append((name, f, cout, b))

    def resnet(self, name, h, w, cin, cout):
        self.conv(f"{name}.c1", h, w, cin, cout)
        self.conv(f"{name}.c2", h, w, cout, cout)
        if cin != cout:
            self.conv(f"{name}.skip", h, w, cin, cout, k=1)

    def attention(self, name, h, w, c):
        seq = h * w
        self.rows.append((f"{name}.proj", 4 * 2.0 * seq * c * c, c,
                          2 * seq * c * BYTES))
        self.rows.append((f"{name}.scores", 2 * 2.0 * seq * seq * c, c,
                          2 * seq * c * BYTES))


def walk_vae(cfg: AutoencoderConfig, size: int) -> Walk:
    w = Walk()
    ch = list(cfg.block_out_channels)
    h = wd = size
    w.conv("enc.in", h, wd, cfg.in_channels, ch[0])
    cin = ch[0]
    for i, cout in enumerate(ch):
        for j in range(cfg.layers_per_block):
            w.resnet(f"enc.b{i}.r{j}", h, wd, cin if j == 0 else cout, cout)
        cin = cout
        if i < len(ch) - 1:
            h, wd = h // 2, wd // 2
            w.conv(f"enc.b{i}.down", h, wd, cout, cout)
    w.resnet("enc.mid.r0", h, wd, ch[-1], ch[-1])
    w.attention("enc.mid.attn", h, wd, ch[-1])
    w.resnet("enc.mid.r1", h, wd, ch[-1], ch[-1])
    w.conv("enc.out", h, wd, ch[-1], 2 * cfg.latent_channels)

    dch = list(reversed(ch))
    n_down = len(dch) - 1
    h = wd = size // (2 ** n_down)
    w.conv("dec.in", h, wd, cfg.latent_channels, dch[0])
    w.resnet("dec.mid.r0", h, wd, dch[0], dch[0])
    w.attention("dec.mid.attn", h, wd, dch[0])
    w.resnet("dec.mid.r1", h, wd, dch[0], dch[0])
    cin = dch[0]
    for i, cout in enumerate(dch):
        for j in range(cfg.layers_per_block + 1):
            w.resnet(f"dec.b{i}.r{j}", h, wd, cin if j == 0 else cout, cout)
        cin = cout
        if i < len(dch) - 1:
            h, wd = h * 2, wd * 2
            w.conv(f"dec.b{i}.up", h, wd, cout, cout)
    w.conv("dec.out", h, wd, dch[-1], cfg.out_channels)
    return w


def main() -> None:
    cfg = AutoencoderConfig.flux()
    cfg.in_channels = 4
    cfg.out_channels = 4
    walk = walk_vae(cfg, 1024)

    total_f = sum(f for _, f, _, _ in walk.rows)
    t_peak = total_f / PEAK
    t_shape = 0.0
    t_bw = 0.0
    by_class: dict = {}
    for name, f, cout, b in walk.rows:
        tc = f / rate_for(cout)
        tb = b / HBM_BW
        t_shape += max(tc, tb)
        t_bw += tb
        key = min(RATE, key=lambda c: abs(c - cout))
        agg = by_class.setdefault(key, [0.0, 0.0, 0.0])
        agg[0] += f
        agg[1] += max(tc, tb)
        agg[2] += tb

    print(f"analytic MXU FLOPs: {total_f/1e12:.2f} TF/image")
    print(f"absolute bf16-peak ideal: {1/t_peak:.2f} img/s ({t_peak*1e3:.1f} ms)")
    print("per channel class (measured GEMM rate applied):")
    for c in sorted(by_class):
        f, t, tb = by_class[c]
        print(f"  C~{c:4d}: {f/1e12:6.2f} TF  rate {RATE[c]/1e12:6.1f} TF/s"
              f"  time {t*1e3:7.2f} ms  (bw floor {tb*1e3:6.2f} ms)")
    print(f"HBM traffic (fused-block model): "
          f"{sum(b for *_, b in walk.rows)/2**30:.2f} GiB/image "
          f"-> bandwidth floor {t_bw*1e3:.1f} ms ({1/t_bw:.1f} img/s)")
    print(f"shape-weighted achievable roofline: {1/t_shape:.2f} img/s "
          f"({t_shape*1e3:.1f} ms/image)")
    print("measured headline: 9.369 img/s "
          f"= {9.369*t_shape*100:.0f}% of achievable, "
          f"{9.369*t_peak*100:.0f}% of absolute peak (MFU)")


if __name__ == "__main__":
    main()
