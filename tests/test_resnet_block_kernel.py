"""Whole-resnet-block fused kernels vs XLA composition (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ragb_vae_tpu.ops.pallas.resnet_block as rb


@pytest.fixture(autouse=True)
def _interpret():
    rb.INTERPRET = True
    yield
    rb.INTERPRET = False


def _chain_inputs(bsz, h, w, c, n, seed=0, skip=False):
    rng = np.random.default_rng(seed)
    out = [
        jnp.asarray(rng.standard_normal((bsz, h, w, c)), jnp.float32),
        jnp.asarray(rng.standard_normal((bsz, c)) * 0.5 + 1.0, jnp.float32),
        jnp.asarray(rng.standard_normal((bsz, c)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((3, 3, c, n)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32),
    ]
    if skip:
        out.append(jnp.asarray(rng.standard_normal((bsz, h, w, n)), jnp.float32))
    else:
        out.append(None)
    return out


@pytest.mark.parametrize("bsz,h,w,c,n,skip", [
    (1, 16, 128, 128, 128, False),
    (2, 16, 128, 128, 128, True),
    (2, 8, 256, 128, 256, False),
])
def test_chain_matches_xla(bsz, h, w, c, n, skip):
    x, a, b, wk, bias, sk = _chain_inputs(bsz, h, w, c, n, skip=skip)
    y, stats = rb.gn_silu_conv3x3_stats(x, a, b, wk, bias, sk, tile_h=4)
    y_ref, stats_ref = rb._xla_chain(x, a, b, wk, bias, sk)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(stats_ref), rtol=1e-3, atol=1e-2
    )


def test_stats_feed_next_groupnorm():
    """Chained stats must reproduce a direct GroupNorm on the output."""
    bsz, h, w, c = 2, 16, 128, 128
    x, a, b, wk, bias, _ = _chain_inputs(bsz, h, w, c, c)
    y, stats = rb.gn_silu_conv3x3_stats(x, a, b, wk, bias, tile_h=4)
    scale = jnp.ones((c,)) * 1.3
    beta = jnp.ones((c,)) * 0.1
    a2, b2 = rb.stats_to_coeffs(stats, scale, beta, num_groups=32, hw=h * w)
    ours = np.asarray(y) * np.asarray(a2)[:, None, None, :] + np.asarray(b2)[:, None, None, :]

    yf = np.asarray(y, np.float32).reshape(bsz, h * w, 32, c // 32)
    mean = yf.mean(axis=(1, 3))
    var = (yf ** 2).mean(axis=(1, 3)) - mean ** 2
    rstd = 1.0 / np.sqrt(var + 1e-6)
    ref = (
        np.asarray(y).reshape(bsz, h * w, 32, c // 32) - mean[:, None, :, None]
    ) * rstd[:, None, :, None]
    ref = ref.reshape(bsz, h, w, c) * np.asarray(scale)[None, None, None, :] + np.asarray(
        beta
    )[None, None, None, :]
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def _block_params(c_in, c_out, seed=0):
    rng = np.random.default_rng(seed)
    p = {
        "norm1": {"scale": jnp.asarray(rng.standard_normal(c_in) * 0.2 + 1.0, jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(c_in) * 0.1, jnp.float32)},
        "conv1": {"kernel": jnp.asarray(rng.standard_normal((3, 3, c_in, c_out)) * 0.05, jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(c_out) * 0.1, jnp.float32)},
        "norm2": {"scale": jnp.asarray(rng.standard_normal(c_out) * 0.2 + 1.0, jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(c_out) * 0.1, jnp.float32)},
        "conv2": {"kernel": jnp.asarray(rng.standard_normal((3, 3, c_out, c_out)) * 0.05, jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(c_out) * 0.1, jnp.float32)},
    }
    if c_in != c_out:
        p["conv_shortcut"] = {
            "kernel": jnp.asarray(rng.standard_normal((1, 1, c_in, c_out)) * 0.2, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(c_out) * 0.1, jnp.float32),
        }
    return p


def _ref_block(x, p, num_groups=32):
    """Direct GroupNorm -> SiLU -> conv x2 + skip (the unfused model math)."""
    def gnorm(t, scale, bias):
        bsz, h, w, c = t.shape
        g = num_groups
        grouped = t.reshape(bsz, h * w, g, c // g).astype(jnp.float32)
        mean = grouped.mean(axis=(1, 3))
        var = (grouped ** 2).mean(axis=(1, 3)) - mean ** 2
        rstd = jax.lax.rsqrt(var + 1e-6)
        a = scale.reshape(1, 1, g, c // g) * rstd[:, None, :, None]
        bcoef = bias.reshape(1, 1, g, c // g) - mean[:, None, :, None] * a
        return (grouped * a + bcoef).reshape(bsz, h, w, c).astype(t.dtype)

    def conv(t, kernel, bias):
        y = jax.lax.conv_general_dilated(
            t, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + bias.astype(y.dtype)

    h1 = conv(jax.nn.silu(gnorm(x, p["norm1"]["scale"], p["norm1"]["bias"])),
              p["conv1"]["kernel"], p["conv1"]["bias"])
    h2 = conv(jax.nn.silu(gnorm(h1, p["norm2"]["scale"], p["norm2"]["bias"])),
              p["conv2"]["kernel"], p["conv2"]["bias"])
    if "conv_shortcut" in p:
        x = conv(x, p["conv_shortcut"]["kernel"], p["conv_shortcut"]["bias"])
    return x + h2


@pytest.mark.parametrize("c_in,c_out", [(128, 128), (256, 128)])
def test_fused_block_matches_reference(c_in, c_out):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 128, c_in)), jnp.float32)
    p = _block_params(c_in, c_out)
    out, stats = rb.fused_resnet_block(x, p, num_groups=32)
    ref = _ref_block(x, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(rb.tensor_stats(ref)), rtol=1e-3, atol=1e-1
    )


def test_fused_block_chained_stats():
    """Feeding block N's stats into block N+1 must equal the direct math."""
    rng = np.random.default_rng(7)
    c = 128
    x = jnp.asarray(rng.standard_normal((1, 8, 128, c)), jnp.float32)
    p1, p2 = _block_params(c, c, seed=1), _block_params(c, c, seed=2)
    y1, s1 = rb.fused_resnet_block(x, p1, num_groups=32)
    y2, _ = rb.fused_resnet_block(y1, p2, num_groups=32, stats=s1)
    ref = _ref_block(_ref_block(x, p1), p2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_identity_activation_bare_conv():
    """fused_conv3x3_stats == plain conv3x3 + bias (the Upsample conv)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 8, 128, 128)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)
    y, stats = rb.fused_conv3x3_stats(x, wk, bias)
    ref = jax.lax.conv_general_dilated(
        x, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias[None, None, None, :]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(rb.tensor_stats(ref)), rtol=1e-3, atol=1e-1
    )


def test_projected_skip_grads_match():
    """Gradients through the IN-KERNEL 1x1 shortcut (x, ws, wsb)."""
    rng = np.random.default_rng(13)
    c_in, c_out = 256, 128
    x = jnp.asarray(rng.standard_normal((1, 8, 128, c_in)), jnp.float32)
    p = _block_params(c_in, c_out)

    def loss_fused(x_, ks_):
        p_ = {**p, "conv_shortcut": {**p["conv_shortcut"], "kernel": ks_}}
        out, _ = rb.fused_resnet_block(x_, p_, num_groups=32)
        return jnp.sum(out ** 2)

    def loss_ref(x_, ks_):
        p_ = {**p, "conv_shortcut": {**p["conv_shortcut"], "kernel": ks_}}
        return jnp.sum(_ref_block(x_, p_) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, p["conv_shortcut"]["kernel"])
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, p["conv_shortcut"]["kernel"])
    for ours, ref in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("h,w,c", [(16, 128, 128), (8, 256, 128)])
def test_subpixel_upsample_conv_matches_literal(h, w, c):
    """The subpixel upsample-conv kernel == literal nearest-2x + conv3x3."""
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    y, stats = rb.fused_upsample_conv3x3_stats(x, wk, bias)
    y_ref, stats_ref = rb._xla_upsample_conv(x, wk, bias)
    assert y.shape == (2, 2 * h, 2 * w, c)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(stats_ref), rtol=1e-3, atol=1e-1
    )


def test_subpixel_upsample_conv_grads():
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.standard_normal((1, 8, 128, 128)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)

    def loss_fused(x_, w_):
        y, _ = rb.fused_upsample_conv3x3_stats(x_, w_, bias)
        return jnp.sum(y ** 2)

    def loss_ref(x_, w_):
        y, _ = rb._xla_upsample_conv(x_, w_, bias)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, wk)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    for ours, ref in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize(
    "h,w,c,n,budget",
    [
        (8, 128, 128, 256, None),          # single tile, n != c
        (16, 128, 128, 128, 4),            # forced tile 4 -> first/mid/last clamps
    ],
)
def test_subpixel_backward_fused_matches_xla(h, w, c, n, budget, monkeypatch):
    """The fused Pallas subpixel backward == the XLA-replay VJP, including
    the stats-chain cotangent and dbias."""
    monkeypatch.setattr(rb, "SUBPIXEL_BWD_MIN_PIXELS", 0)
    if budget is not None:
        monkeypatch.setattr(
            rb,
            "SUBPIXEL_BWD_TILE_BUDGET",
            rb._subpixel_bwd_vmem_bytes(budget, w, c, n, 4) + 1,
        )
        assert rb._subpixel_bwd_pick_tile(h, w, c, n, 4) == budget
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, c, n)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    wstat = jnp.asarray(rng.standard_normal((2, 2, n)) * 0.01, jnp.float32)

    def run(fn):
        def loss(x_, w_, b_):
            y, stats = fn(x_, w_, b_)
            return jnp.sum(y * y) + jnp.sum(stats * wstat)

        return jax.grad(loss, argnums=(0, 1, 2))(x, wk, bias)

    got = run(rb.fused_upsample_conv3x3_stats)
    want = run(rb._xla_upsample_conv)
    for g, r, name in zip(got, want, ("dx", "dw", "dbias")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_subpixel_bwd_weight_fold_is_transpose_conv():
    """The doubly-folded (4, 4N, C) backward weights reproduce the literal
    transpose-conv + 2x2 cell-sum on a tiny example."""
    rng = np.random.default_rng(31)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, 1)), jnp.float32)
    dye = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
    # reference: dUp = conv(dye, flip(w^T)); dx = 2x2 cell sum
    _, vjp = jax.vjp(lambda x: rb._xla_upsample_conv(x, w, jnp.zeros(1))[0],
                     jnp.zeros((1, 4, 4, 1)))
    (dx_ref,) = vjp(dye)
    wb = np.asarray(rb._fold_subpixel_bwd_weights(w))  # (4, 4, 1)
    pad = np.zeros((12, 12))
    pad[2:10, 2:10] = np.asarray(dye)[0, :, :, 0]
    dx = np.zeros((4, 4))
    for hh in range(4):
        for ww in range(4):
            for r in range(4):
                for s in range(4):
                    dx[hh, ww] += wb[r, s, 0] * pad[2 * hh + r + 1, 2 * ww + s + 1]
    np.testing.assert_allclose(dx, np.asarray(dx_ref)[0, :, :, 0], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,w,c", [(16, 128, 128), (8, 256, 128)])
def test_downsample_conv_matches_literal(h, w, c):
    """Dense-GEMM stride-2 kernel == literal conv3x3 stride-2 pad (0,1)."""
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    y, stats = rb.fused_downsample_conv3x3_stats(x, wk, bias)
    y_ref, stats_ref = rb._xla_downsample_conv(x, wk, bias)
    assert y.shape == (2, h // 2, w // 2, c)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(stats_ref), rtol=1e-3, atol=1e-1
    )


def test_downsample_conv_grads():
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal((1, 16, 128, 128)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)

    def loss_fused(x_, w_):
        y, _ = rb.fused_downsample_conv3x3_stats(x_, w_, bias)
        return jnp.sum(y ** 2)

    def loss_ref(x_, w_):
        y, _ = rb._xla_downsample_conv(x_, w_, bias)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, wk)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    for ours, ref in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=1e-3)


def test_bf16_grads_do_not_crash():
    """bf16 params/inputs through every custom-VJP recompute path — the
    preferred_element_type transpose rule rejected mixed (bf16, f32)
    cotangents until the recompute convs dropped the upcast (found by the
    fused train-step bench; fp32-only grad tests missed it)."""
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((1, 8, 128, 128)), jnp.bfloat16)
    p = _block_params(256, 128, seed=3)  # proj-skip block
    p = jax.tree_util.tree_map(lambda t: t, p)
    xs = jnp.asarray(rng.standard_normal((1, 8, 128, 256)), jnp.bfloat16)

    def loss_block(k):
        pp = {**p, "conv1": {**p["conv1"], "kernel": k}}
        y, _ = rb.fused_resnet_block(xs, pp, num_groups=32)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss_block)(p["conv1"]["kernel"])
    assert np.isfinite(float(jnp.sum(jnp.abs(g).astype(jnp.float32))))

    wk = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    for fn in (rb.fused_upsample_conv3x3_stats, rb.fused_downsample_conv3x3_stats):
        def loss_fn(w, fn=fn):
            y, _ = fn(x, w, jnp.zeros(128))
            return jnp.sum(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss_fn)(wk)
        assert np.isfinite(float(jnp.sum(jnp.abs(g).astype(jnp.float32))))


def test_block_grads_match():
    rng = np.random.default_rng(9)
    c = 128
    x = jnp.asarray(rng.standard_normal((1, 8, 128, c)), jnp.float32)
    p = _block_params(c, c)

    def loss_fused(x_, k_):
        p_ = {**p, "conv1": {**p["conv1"], "kernel": k_}}
        out, _ = rb.fused_resnet_block(x_, p_, num_groups=32)
        return jnp.sum(out ** 2)

    def loss_ref(x_, k_):
        p_ = {**p, "conv1": {**p["conv1"], "kernel": k_}}
        return jnp.sum(_ref_block(x_, p_) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, p["conv1"]["kernel"])
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, p["conv1"]["kernel"])
    for ours, ref in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Winograd F(2x2, 3x3) in-VMEM kernel
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("bsz,h,w,c,n,skip", [
    (1, 8, 128, 128, 128, False),
    (2, 8, 128, 128, 128, True),
    (1, 8, 256, 128, 256, False),
])
def test_wino_chain_matches_xla(bsz, h, w, c, n, skip):
    x, a, b, wk, bias, sk = _chain_inputs(bsz, h, w, c, n, skip=skip)
    y, stats = rb.gn_silu_conv3x3_stats(x, a, b, wk, bias, sk, algo="winograd")
    y_ref, stats_ref = rb._xla_chain(x, a, b, wk, bias, sk)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(stats_ref), rtol=1e-3, atol=1e-2
    )


def test_wino_chain_with_projected_shortcut():
    bsz, h, w, c, n = 1, 8, 128, 128, 256
    x, a, b, wk, bias, _ = _chain_inputs(bsz, h, w, c, n)
    rng = np.random.default_rng(5)
    sk = jnp.asarray(rng.standard_normal((bsz, h, w, c)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((c, n)) * 0.05, jnp.float32)
    wsb = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    y, stats = rb.gn_silu_conv3x3_stats(
        x, a, b, wk, bias, sk, proj=(ws, wsb), algo="winograd"
    )
    y_ref, stats_ref = rb._xla_chain(x, a, b, wk, bias, sk, ws, wsb)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats), np.asarray(stats_ref), rtol=1e-3, atol=1e-2
    )


def test_wino_identity_activation():
    """Bare conv (identity act, unit coeffs) through the winograd route."""
    bsz, h, w, c = 1, 8, 128, 128
    x, _, _, wk, bias, _ = _chain_inputs(bsz, h, w, c, c)
    ones = jnp.ones((bsz, c), jnp.float32)
    zeros = jnp.zeros((bsz, c), jnp.float32)
    y, _ = rb.gn_silu_conv3x3_stats(
        x, ones, zeros, wk, bias, activation="identity", algo="winograd"
    )
    y_ref, _ = rb._xla_chain(x, ones, zeros, wk, bias, None, activation="identity")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_wino_gradients_match_xla():
    """custom-VJP grads of the winograd chain == grads of the XLA restate."""
    bsz, h, w, c, n = 1, 4, 128, 128, 128
    x, a, b, wk, bias, _ = _chain_inputs(bsz, h, w, c, n)

    def loss_kernel(x, wk):
        y, stats = rb.gn_silu_conv3x3_stats(x, a, b, wk, bias, algo="winograd")
        return jnp.sum(y * y) + jnp.sum(stats)

    def loss_ref(x, wk):
        y, stats = rb._xla_chain(x, a, b, wk, bias, None)
        return jnp.sum(y * y) + jnp.sum(stats)

    gx, gw = jax.grad(loss_kernel, argnums=(0, 1))(x, wk)
    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Fused Pallas backward (dx/da/db/dW/dbias/dskip/dws/dwsb in one launch)
# ---------------------------------------------------------------------------
def _grad_check(algo, skip_mode, activation="silu", h=8, w=128, c=128, n=128):
    bsz = 2
    x, a, b, wk, bias, _ = _chain_inputs(bsz, h, w, c, n)
    rng = np.random.default_rng(9)
    sk = ws = wsb = None
    if skip_mode == "identity":
        sk = jnp.asarray(rng.standard_normal((bsz, h, w, n)), jnp.float32)
    elif skip_mode == "proj":
        sk = jnp.asarray(rng.standard_normal((bsz, h, w, c)), jnp.float32)
        ws = jnp.asarray(rng.standard_normal((c, n)) * 0.05, jnp.float32)
        wsb = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    # stats cotangent must flow: weight the stats in the loss
    wstat = jnp.asarray(rng.standard_normal((bsz, 2, n)) * 0.01, jnp.float32)

    def run(fn):
        def loss(x, a, b, wk, bias, sk, ws, wsb):
            if ws is not None:
                y, stats = fn(x, a, b, wk, bias, sk, proj=(ws, wsb))
            else:
                y, stats = fn(x, a, b, wk, bias, sk)
            return jnp.sum(y * y) + jnp.sum(stats * wstat)

        argnums = (0, 1, 2, 3, 4) + ((5,) if sk is not None else ()) + (
            (6, 7) if ws is not None else ()
        )
        return jax.grad(loss, argnums=argnums)(x, a, b, wk, bias, sk, ws, wsb)

    kernel_fn = lambda *args, **kw: rb.gn_silu_conv3x3_stats(
        *args, activation=activation, algo=algo, **kw
    )
    xla_fn = lambda x, a, b, wk, bias, sk, proj=(None, None): rb._xla_chain(
        x, a, b, wk, bias, sk, proj[0], proj[1], activation
    )
    got = run(kernel_fn)
    want = run(xla_fn)
    names = ["dx", "da", "db", "dw", "dbias", "dskip", "dws", "dwsb"]
    for g, r, name in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-3,
            err_msg=f"{algo}/{skip_mode}/{name}",
        )


@pytest.mark.parametrize("skip_mode", ["none", "identity", "proj"])
def test_fused_backward_matches_xla(skip_mode):
    _grad_check("direct", skip_mode)


def test_fused_backward_identity_activation():
    _grad_check("direct", "none", activation="identity")


def test_fused_backward_wino_forward():
    """Winograd forward + fused backward round trip."""
    _grad_check("winograd", "identity")
