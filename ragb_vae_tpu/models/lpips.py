"""LPIPS perceptual loss (VGG16 backbone) in Flax.

Replaces `lpips_lib.LPIPS(net="vgg")` (reference losses.py:50-57,85-107):
the same architecture — torchvision VGG16 feature slices, channel-unit-
normalized activations, squared diffs through learned 1x1 "lin" heads,
spatial mean, layer sum — as an XLA-compiled NHWC network.

Weights are imported from a saved `lpips.LPIPS(net="vgg").state_dict()`
(.pt or .safetensors); there is no network access on the TPU pod, so the
checkpoint must be exported once on any machine with the `lpips` package
and pointed to via `training.lpips_weights`. Without weights the
perceptual term is disabled (the reference likewise gates on the lpips
package being installed).
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ragb_vae_tpu.models.losses import perceptual_composites

Array = jnp.ndarray

# torchvision vgg16.features conv indices per LPIPS slice (lpips vgg16
# wrapper keeps the original Sequential indices inside each slice).
_SLICES: List[List[int]] = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
_POOL_BEFORE = {5, 10, 17, 24}  # maxpool sits before these convs

# lpips ScalingLayer constants (lpips/lpips.py): input in [-1,1].
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class LPIPSParams:
    """Flat numpy weight store: conv kernels/biases (HWIO) + lin heads."""

    def __init__(self, convs: Dict[int, Dict[str, np.ndarray]], lins: List[np.ndarray]):
        self.convs = convs
        self.lins = lins  # per-slice (C,) non-negative channel weights


def _normalize_tensor(feat: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def _max_pool_2x2(x: Array) -> Array:
    from jax import lax

    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def lpips_features(
    x: Array,
    params: LPIPSParams,
    *,
    remat: bool = True,
    compute_dtype=None,
) -> List[Array]:
    """Run VGG16 features, returning the five slice outputs (post-ReLU).

    remat=True checkpoints each SLICE: the backward recomputes one slice's
    conv activations at a time instead of keeping all 13 conv outputs in
    fp32 — at 512^2 training resolution that drops ~5 GB of VGG residuals
    from the step's peak (the single largest consumer in the 16 GB OOM
    dump, bench train_step) for one extra VGG forward's FLOPs.

    compute_dtype (e.g. bf16) runs the convs at that dtype — the
    reference's LPIPS module runs under accelerate's bf16 autocast the
    same way; distances/normalization stay fp32 in `lpips_distance`.
    Default None keeps exact fp32 (the torch-golden parity surface).
    """
    import jax
    from jax import lax

    def run_slice(h: Array, slice_convs) -> Array:
        for idx in slice_convs:
            if idx in _POOL_BEFORE:
                h = _max_pool_2x2(h)
            w = jnp.asarray(params.convs[idx]["kernel"])  # HWIO
            b = jnp.asarray(params.convs[idx]["bias"])
            if compute_dtype is not None:
                w = w.astype(compute_dtype)
                b = b.astype(compute_dtype)
            h = lax.conv_general_dilated(
                h,
                w,
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            h = jnp.maximum(h, 0.0)
        return h

    h = x if compute_dtype is None else x.astype(compute_dtype)
    outputs: List[Array] = []
    for slice_convs in _SLICES:
        if remat:
            h = jax.checkpoint(run_slice, static_argnums=(1,))(h, tuple(slice_convs))
        else:
            h = run_slice(h, slice_convs)
        outputs.append(h)
    return outputs


def lpips_distance(
    pred: Array, target: Array, params: LPIPSParams, *, compute_dtype=None,
    remat: bool = True,
) -> Array:
    """Per-sample LPIPS distance, inputs NHWC RGB in [-1, 1] -> (B,).

    The VALUE is symmetric in (pred, target); the GRADIENT is not:
    `target` is detached (the reference computes lpips against data, whose
    torch graph carries no grad), which also lets XLA drop the target
    stream's backward residuals. Round-3 bug fix: the stop_gradient used
    to land on the stream the callers passed PRED through, silently
    zeroing the entire perceptual gradient in training
    (tests/test_lpips.py::test_lpips_gradient_flows_through_pred pins
    the fix).
    """
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    import jax

    x_in = (pred.astype(jnp.float32) - shift) / scale
    y_in = jax.lax.stop_gradient((target.astype(jnp.float32) - shift) / scale)
    feats_x = lpips_features(x_in, params, compute_dtype=compute_dtype, remat=remat)
    feats_y = lpips_features(y_in, params, compute_dtype=compute_dtype, remat=remat)
    total = jnp.zeros(pred.shape[0], dtype=jnp.float32)
    for fx, fy, lin in zip(feats_x, feats_y, params.lins):
        fx = fx.astype(jnp.float32)
        fy = fy.astype(jnp.float32)
        diff = (_normalize_tensor(fx) - _normalize_tensor(fy)) ** 2
        weighted = diff * jnp.asarray(lin)
        total = total + jnp.mean(jnp.sum(weighted, axis=-1), axis=(1, 2))
    return total


def load_lpips_params(path: Union[str, Path]) -> LPIPSParams:
    """Import a torch `lpips.LPIPS(net='vgg').state_dict()` checkpoint.

    Accepts `net.sliceK.N.weight` (full lpips dump) or `features.N.weight`
    (bare torchvision vgg16) conv keys; lin heads `linK.model.1.weight`
    are optional (uniform weights = lpips baseline mode when absent).
    """
    from ragb_vae_tpu.models.weights import load_torch_state

    state = load_torch_state(path)
    convs: Dict[int, Dict[str, np.ndarray]] = {}
    for key, value in state.items():
        parts = key.split(".")
        idx: Optional[int] = None
        if parts[0] == "net" and parts[1].startswith("slice") and parts[-1] in ("weight", "bias"):
            idx = int(parts[2])
        elif parts[0] == "features" and parts[-1] in ("weight", "bias"):
            idx = int(parts[1])
        if idx is None:
            continue
        entry = convs.setdefault(idx, {})
        arr = np.asarray(value, dtype=np.float32)
        if parts[-1] == "weight":
            entry["kernel"] = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        else:
            entry["bias"] = arr

    needed = [i for s in _SLICES for i in s]
    missing = [i for i in needed if i not in convs or "kernel" not in convs[i]]
    if missing:
        raise ValueError(f"LPIPS checkpoint {path} missing VGG conv layers {missing}.")

    lins: List[np.ndarray] = []
    for k, slice_convs in enumerate(_SLICES):
        lin_key = f"lin{k}.model.1.weight"
        alt_key = f"lins.{k}.model.1.weight"
        if lin_key in state or alt_key in state:
            w = np.asarray(state.get(lin_key, state.get(alt_key)), dtype=np.float32)
            lins.append(np.maximum(w.reshape(-1), 0.0))
        else:
            # lpips baseline mode (LPIPS(net="vgg", lpips=False)) SUMS the
            # channel diffs — unit weights, not 1/C (a 1/C mean would
            # underweight deep 512-channel layers 8x vs the shallow ones)
            c_out = convs[slice_convs[-1]]["kernel"].shape[-1]
            lins.append(np.ones((c_out,), dtype=np.float32))
    return LPIPSParams(convs, lins)


def maybe_build_lpips(
    weights_path: Optional[Union[str, Path]],
    *,
    compute_dtype=None,
    remat: bool = True,
) -> Optional[Callable[[Array, Array], Array]]:
    """Build the training-loop perceptual term, or None if unavailable.

    Returned fn matches `AlphaVaeLoss.perceptual_loss` (losses.py:85-107):
    inputs are RGBA in [-1,1]; LPIPS is measured over black and white
    composites (fed unnormalized, reproducing the reference's quirk of
    passing [0,1]-ish composites where lpips expects [-1,1]).

    The black and white composites are CONCATENATED into one 2B-batch VGG
    pass per stream (pred w/ grad, target detached) — per-sample math is
    independent, so the values are bitwise those of two separate passes,
    but the TPU sees half the conv launches at twice the batch.
    `compute_dtype=bf16` additionally runs the VGG convs at autocast
    precision (see lpips_features). `remat=False` keeps the VGG slice
    activations resident instead of recomputing them in the backward
    (+2 VGG forward passes, +1.3 TF/img at 512^2 b4 — results.md round-5
    MFU ruling); turn it off when the activation envelope fits.
    """
    if not weights_path:
        return None
    path = Path(weights_path)
    if not path.exists():
        return None
    params = load_lpips_params(path)

    def perceptual_loss(pred: Array, target: Array, weights: Optional[Array] = None) -> Array:
        pred_black, target_black, pred_white, target_white = perceptual_composites(pred, target)
        bsz = pred.shape[0]
        d = lpips_distance(
            jnp.concatenate([pred_black, pred_white], axis=0),
            jnp.concatenate([target_black, target_white], axis=0),
            params,
            compute_dtype=compute_dtype,
            remat=remat,
        )
        loss_black, loss_white = d[:bsz], d[bsz:]
        per_sample = 0.5 * (loss_black + loss_white)
        if weights is None:
            return per_sample.mean()
        w = weights.astype(jnp.float32)
        return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-8)

    return perceptual_loss
