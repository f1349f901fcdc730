#!/usr/bin/env python
"""Full-FLUX-scale LoRA step: AOT compile + XLA memory/FLOPs analysis.

VERDICT round-1 item 2: prove the LoRA stage at the real operating point
(19 double + 38 single blocks, 3072 dim, rank 128 — reference
configs/flux_kontext_textalpha_lora.yaml) actually fits 16 GB v5e chips
under --shard_base_params. No multi-chip hardware exists here, so the
step is AOT-compiled for a REAL v5e 2x4 topology
(jax.experimental.topologies) and XLA's own memory analysis is recorded —
the same numbers the runtime would enforce on hardware.

Usage: python benchmarks/flux_scale_aot.py [--image 512] [--batch 8] [--rank 128]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_step(args, mesh):  # noqa: C901
    from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
    from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
    from ragb_vae_tpu.models.flux_weights import merge_params, split_lora_params
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.scheduler import (
        FlowMatchEulerConfig,
        FlowMatchEulerScheduler,
    )
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig
    from ragb_vae_tpu.parallel import fsdp_sharding, replicated_tree, zero_sharding

    t_cfg = FluxTransformerConfig()  # real FLUX.1: 19/38 blocks, 3072 dim
    vae_cfg = AutoencoderConfig()  # real Flux ae
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = args.image
    vae = RgbaVAE(config=vae_cfg, dtype=jnp.bfloat16)

    txt_seq = 512
    model = FluxTextAlphaModel(
        transformer_config=t_cfg,
        vae=vae,
        scheduler=FlowMatchEulerScheduler(FlowMatchEulerConfig()),
        prompt_embeds=jnp.zeros((1, txt_seq, t_cfg.joint_attention_dim), jnp.bfloat16),
        pooled_prompt_embeds=jnp.zeros((1, t_cfg.pooled_projection_dim), jnp.bfloat16),
        text_ids=jnp.zeros((txt_seq, 3)),
        lora_rank=args.rank,
        lora_alpha=float(args.rank) * 4 / 3,
        dtype=jnp.bfloat16,
        remat=True,
        attention_mesh=mesh,  # shard_map-wraps the pallas flash kernel
    )

    # Abstract param trees (no 12B materialization): eval_shape the init.
    dummy = dict(
        hidden_states=jnp.zeros((1, 4, t_cfg.in_channels)),
        encoder_hidden_states=jnp.zeros((1, 2, t_cfg.joint_attention_dim)),
        pooled_projections=jnp.zeros((1, t_cfg.pooled_projection_dim)),
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((4, 3)),
        txt_ids=jnp.zeros((2, 3)),
        guidance=jnp.asarray([3.5]),
    )
    t_shapes = jax.eval_shape(
        lambda: model.transformer.init(jax.random.PRNGKey(0), **dummy)
    )["params"]
    base_shapes, lora_shapes = split_lora_params(t_shapes)
    # frozen base in bf16 (stage behavior); trainable LoRA in fp32
    base_shapes = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), base_shapes
    )
    lora_shapes = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.float32), lora_shapes
    )
    vae_shapes = jax.eval_shape(
        lambda: RgbaVAE(config=vae_cfg).init_params(jax.random.PRNGKey(0), image_size=64)
    )
    vae_shapes = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), vae_shapes
    )

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-5, b1=0.9, b2=0.95))
    opt_shapes = jax.eval_shape(tx.init, lora_shapes)

    base_sh = fsdp_sharding(base_shapes, mesh) if args.fsdp else replicated_tree(base_shapes, mesh)
    rep_lora = replicated_tree(lora_shapes, mesh)
    rep_vae = replicated_tree(vae_shapes, mesh)
    opt_sh = zero_sharding(opt_shapes, mesh)
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def loss_fn(lora, base, vae_p, batch, key):
        params = merge_params(base, lora)
        loss, _ = model.compute_loss(params, vae_p, batch["gt"], batch["text_alpha"], key)
        return loss

    def step_fn(lora, base, vae_p, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(lora, base, vae_p, batch, key)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    def with_shardings(shapes, shardings):
        return jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            shapes,
            shardings,
        )

    abstract_args = (
        with_shardings(lora_shapes, rep_lora),
        with_shardings(base_shapes, base_sh),
        with_shardings(vae_shapes, rep_vae),
        with_shardings(opt_shapes, opt_sh),
        {
            "gt": jax.ShapeDtypeStruct((args.batch, args.image, args.image, 4), jnp.float32, sharding=bsh),
            "text_alpha": jax.ShapeDtypeStruct((args.batch, args.image, args.image, 4), jnp.float32, sharding=bsh),
        },
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
    )
    n_base = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(base_shapes))
    n_lora = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(lora_shapes))
    print(f"[flux-aot] base params {n_base/1e9:.2f}B (bf16), lora {n_lora/1e6:.1f}M (rank {args.rank})")
    jitted = jax.jit(
        step_fn,
        in_shardings=jax.tree_util.tree_map(lambda s: s.sharding, abstract_args),
        out_shardings=(rep_lora, opt_sh, rep),
        donate_argnums=(0, 3),
    )
    return jitted, abstract_args


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--no-fsdp", dest="fsdp", action="store_false",
                    help="replicate the base instead (expected NOT to fit)")
    args = ap.parse_args()

    topo = topologies.get_topology_desc(platform="tpu", topology_name=args.topology)
    devices = np.array(topo.devices)
    mesh = Mesh(devices, ("data",))
    print(f"[flux-aot] topology {args.topology}: {len(topo.devices)} chips, "
          f"batch {args.batch} @ {args.image}^2, fsdp={args.fsdp}")

    jitted, abstract_args = build_step(args, mesh)
    lowered = jitted.lower(*abstract_args)
    compiled = lowered.compile()

    mem = compiled.memory_analysis()
    GB = 1024**3
    print(f"[flux-aot] per-device memory (XLA analysis):")
    print(f"  arguments : {mem.argument_size_in_bytes / GB:.2f} GiB")
    print(f"  outputs   : {mem.output_size_in_bytes / GB:.2f} GiB")
    print(f"  temps     : {mem.temp_size_in_bytes / GB:.2f} GiB")
    print(f"  aliased   : {mem.alias_size_in_bytes / GB:.2f} GiB")
    peak = (mem.argument_size_in_bytes + mem.output_size_in_bytes
            + mem.temp_size_in_bytes - mem.alias_size_in_bytes)
    print(f"  peak(est) : {peak / GB:.2f} GiB  (v5e HBM: 16 GiB)")

    cost = compiled.cost_analysis()
    if cost:
        flops = cost.get("flops", 0.0)
        print(f"[flux-aot] step FLOPs/device: {flops/1e12:.2f} TF "
              f"-> ideal v5e step ~{flops/197e12:.3f}s at 100% MXU, "
              f"~{flops/(197e12*0.4):.3f}s at 40%")
    print(f"[flux-aot] fits = {peak < 16 * GB}")


if __name__ == "__main__":
    main()
