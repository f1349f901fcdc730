"""Batched serving daemon: bucketing, dynamic batcher, per-request
determinism, HTTP surface."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.serving import (
    InferenceServer,
    ServeConfig,
    resize_rgba,
    snap_size,
)
from tests.test_flux_kontext import _build_model


def test_snap_size_buckets():
    assert snap_size(1000, 1030, multiple=64) == (1024, 1024)
    assert snap_size(70, 70, multiple=64) == (64, 64)
    # aspect preserved, area capped
    h, w = snap_size(2048, 2048, multiple=64, max_pixels=1024 * 1024)
    assert h * w <= 1024 * 1024 and h == w
    # never below min_side
    assert snap_size(5, 2000, multiple=64, max_pixels=1024 * 1024)[0] == 64
    with pytest.raises(ValueError):
        snap_size(0, 64)


def test_snap_size_extreme_aspect_bounded():
    """min_side clamps must not push the bucket back over max_pixels
    (unbounded buckets = one fresh minutes-long compile per request)."""
    for hw in [(65536, 64), (64, 65536), (100000, 1), (1, 100000)]:
        h, w = snap_size(*hw, multiple=64, max_pixels=1024 * 1024)
        assert h * w <= 1024 * 1024, (hw, h, w)
        assert h >= 64 and w >= 64


def test_resize_rgba_premultiplied_no_fringing():
    """Transparent pixels' RGB must not bleed into opaque neighbors."""
    img = np.zeros((8, 8, 4), np.float32)
    img[:, :4] = [1.0, 0.0, 0.0, 0.0]   # transparent red left half
    img[:, 4:] = [0.0, 1.0, 0.0, 1.0]   # opaque green right half
    out = resize_rgba(img, (4, 4))
    opaque = out[..., 3] > 0.5
    assert opaque.any()
    # straight-RGBA interpolation would leak red ~0.5 at the seam
    assert float(out[..., 0][opaque].max()) < 0.05


def test_resize_rgba_roundtrip():
    img = np.random.default_rng(0).random((32, 48, 4)).astype(np.float32)
    assert resize_rgba(img, (32, 48)) is img
    out = resize_rgba(img, (64, 64))
    assert out.shape == (64, 64, 4)
    assert out.min() >= 0.0 and out.max() <= 1.0
    with pytest.raises(ValueError):
        resize_rgba(img[..., :3], (64, 64))


@pytest.fixture(scope="module")
def served_model():
    model = _build_model()
    vae_params = model.vae.init_params(jax.random.PRNGKey(0), image_size=32)
    dummy = dict(
        hidden_states=jnp.zeros((1, 8, model.transformer_config.in_channels)),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    t_params = model.transformer.init(jax.random.PRNGKey(1), **dummy)["params"]
    return model, t_params, vae_params


def _cfg(**kw):
    base = dict(max_batch=2, max_delay_ms=20.0, steps=2, bucket_multiple=32,
                max_pixels=64 * 64, request_timeout_s=120.0)
    base.update(kw)
    return ServeConfig(**base)


def test_serving_batches_and_resizes(served_model):
    model, t_params, vae_params = served_model
    rng = np.random.default_rng(1)
    with InferenceServer(model, t_params, vae_params, _cfg()) as srv:
        # three same-bucket requests (one of them off-size -> resized) and
        # one other bucket
        futs = [
            srv.submit(rng.random((32, 32, 4)).astype(np.float32), seed=i)
            for i in range(2)
        ]
        futs.append(srv.submit(rng.random((30, 34, 4)).astype(np.float32), seed=7))
        futs.append(srv.submit(rng.random((32, 64, 4)).astype(np.float32), seed=9))
        outs = [f.result(timeout=300) for f in futs]
    assert outs[0].shape == (32, 32, 4) and outs[1].shape == (32, 32, 4)
    assert outs[2].shape == (30, 34, 4)  # returned at the original size
    assert outs[3].shape == (32, 64, 4)
    for o in outs:
        assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    assert srv.stats["served"] == 4 and srv.stats["pending"] == 0


def test_serving_drain_answers_queued_then_refuses(served_model):
    """drain(): graceful shutdown — queued requests complete, new ones are
    refused, stop() fires afterwards (the daemon's SIGTERM path)."""
    model, t_params, vae_params = served_model
    rng = np.random.default_rng(2)
    srv = InferenceServer(model, t_params, vae_params, _cfg()).start()
    futs = [
        srv.submit(rng.random((32, 32, 4)).astype(np.float32), seed=i)
        for i in range(3)
    ]
    assert srv.drain(timeout=300.0) is True
    for f in futs:
        out = f.result(timeout=1.0)  # already resolved by drain
        assert out.shape == (32, 32, 4) and np.isfinite(out).all()
    with pytest.raises(RuntimeError):
        srv.submit(rng.random((32, 32, 4)).astype(np.float32))
    assert srv.stats["pending"] == 0 and srv.stats["served"] == 3


def test_serving_out_of_range_seed(served_model):
    """seed=-1 (or any out-of-uint32 value) must not fail the batch."""
    model, t_params, vae_params = served_model
    img = np.random.default_rng(3).random((32, 32, 4)).astype(np.float32)
    with InferenceServer(model, t_params, vae_params, _cfg()) as srv:
        out = srv.submit(img, seed=-1).result(timeout=300)
        out2 = srv.submit(img, seed=2**40 + (2**32 - 1)).result(timeout=300)
    assert np.isfinite(out).all() and np.isfinite(out2).all()
    # -1 and 2**40 + (2**32-1) both mask to 0xFFFFFFFF -> same prediction
    np.testing.assert_allclose(out, out2, atol=1e-6)


def test_serving_submit_copies_input(served_model):
    """Caller mutating its buffer after submit() must not corrupt the batch."""
    model, t_params, vae_params = served_model
    rng = np.random.default_rng(4)
    img = rng.random((32, 32, 4)).astype(np.float32)
    snapshot = img.copy()
    srv = InferenceServer(model, t_params, vae_params, _cfg())
    with srv:
        fut = srv.submit(img, seed=5)
        img[:] = 0.0  # caller reuses the buffer while the request is queued
        out = fut.result(timeout=300)
        ref = srv.submit(snapshot, seed=5).result(timeout=300)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_serving_per_request_determinism(served_model):
    """Same (image, seed) must give the same output no matter what else
    is in the batch — the point of per-request noise injection."""
    model, t_params, vae_params = served_model
    rng = np.random.default_rng(2)
    img = rng.random((32, 32, 4)).astype(np.float32)
    other = rng.random((32, 32, 4)).astype(np.float32)

    with InferenceServer(model, t_params, vae_params, _cfg()) as srv:
        solo = srv.submit(img, seed=42).result(timeout=300)
    with InferenceServer(model, t_params, vae_params, _cfg()) as srv:
        f1 = srv.submit(img, seed=42)
        f2 = srv.submit(other, seed=43)
        batched = f1.result(timeout=300)
        f2.result(timeout=300)
    np.testing.assert_allclose(solo, batched, atol=2e-5)


def test_serving_warmup_precompiles(served_model):
    model, t_params, vae_params = served_model
    srv = InferenceServer(model, t_params, vae_params, _cfg())
    srv.warmup([(32, 32)])  # must not raise; covers the padded-batch shape
    with srv:
        out = srv.submit(
            np.random.default_rng(5).random((32, 32, 4)).astype(np.float32), seed=1
        ).result(timeout=300)
    assert out.shape == (32, 32, 4)


def test_serving_rejects_bad_input(served_model):
    model, t_params, vae_params = served_model
    with InferenceServer(model, t_params, vae_params, _cfg()) as srv:
        with pytest.raises(ValueError):
            srv.submit(np.zeros((32, 32, 3), np.float32))
        with pytest.raises(ValueError):
            srv.submit(np.zeros((2, 32, 32, 4), np.float32))
    with pytest.raises(RuntimeError):
        srv.submit(np.zeros((32, 32, 4), np.float32))


def test_serving_http_roundtrip(served_model):
    """Drive the real HTTP daemon surface in-process."""
    import io
    import json
    import urllib.request
    from http.server import ThreadingHTTPServer

    from PIL import Image

    import scripts.serve as serve_mod

    model, t_params, vae_params = served_model
    srv = InferenceServer(model, t_params, vae_params, _cfg()).start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"

        img = (np.random.default_rng(3).random((32, 32, 4)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img, "RGBA").save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?seed=5", data=buf.getvalue(),
            headers={"Content-Type": "image/png"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            out = Image.open(io.BytesIO(resp.read()))
        assert out.size == (32, 32) and out.mode == "RGBA"
    finally:
        httpd.shutdown()
        srv.stop()


def test_serving_tensor_parallel_matches(served_model):
    """InferenceServer(mesh=...) — TP-sharded serving returns the same
    prediction as the single-device server for the same (image, seed)."""
    from jax.sharding import Mesh

    model, t_params, vae_params = served_model
    img = np.random.default_rng(5).random((32, 32, 4)).astype(np.float32)
    with InferenceServer(model, t_params, vae_params, _cfg()) as srv:
        ref = srv.submit(img, seed=11).result(timeout=300)

    mesh = Mesh(np.array(jax.devices()), ("model",))
    with InferenceServer(model, t_params, vae_params, _cfg(), mesh=mesh) as srv:
        # params got sharded at construction
        kern = srv.t_params["transformer_blocks_0"]["attn"]["to_q"]["base"]["kernel"]
        assert len(kern.sharding.device_set) == 8
        out = srv.submit(img, seed=11).result(timeout=300)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_serving_pipeline_parallel_matches(served_model):
    """InferenceServer(pipeline=...) — PP serving returns the same
    prediction as the single-program server for the same (image, seed)."""
    from ragb_vae_tpu.parallel.pipeline import PipelinedFluxTransformer

    model, t_params, vae_params = served_model
    img = np.random.default_rng(8).random((32, 32, 4)).astype(np.float32)
    with InferenceServer(model, t_params, vae_params, _cfg()) as srv:
        ref = srv.submit(img, seed=21).result(timeout=300)

    pipe = PipelinedFluxTransformer(
        model.transformer_config, devices=jax.devices()[:4]
    )
    with InferenceServer(model, t_params, vae_params, _cfg(), pipeline=pipe) as srv:
        out = srv.submit(img, seed=21).result(timeout=300)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    with pytest.raises(ValueError, match="mutually exclusive"):
        from jax.sharding import Mesh

        InferenceServer(
            model, t_params, vae_params, _cfg(),
            mesh=Mesh(np.array(jax.devices()), ("model",)), pipeline=pipe,
        )


def _bare_server(cfg: ServeConfig) -> InferenceServer:
    """A queue/batcher-only InferenceServer (no model, no jit) for unit
    tests of _collect's scheduling policy."""
    import queue as _queue

    srv = object.__new__(InferenceServer)
    srv.config = cfg
    srv._queues = {}
    srv._queues_lock = threading.Lock()
    srv._wake = threading.Event()
    srv._stop = threading.Event()
    srv._bucket_batch = {}  # per-bucket auto-batch policy (warmup-measured)
    return srv


def test_collect_expired_bucket_preempts_saturated_one():
    """A quiet bucket whose deadline expired must be served even while
    another bucket is permanently full: max_delay_ms is a real per-bucket
    latency bound (regression: the full-bucket fast path used to preempt
    the expired check forever, starving the quiet bucket until its
    futures timed out)."""
    import queue as _queue

    from ragb_vae_tpu.serving import _Request

    srv = _bare_server(ServeConfig(max_batch=2, max_delay_ms=10_000.0))
    img = np.zeros((8, 8, 4), np.float32)

    busy = _queue.Queue()
    quiet = _queue.Queue()
    srv._queues[(512, 512)] = busy
    srv._queues[(256, 256)] = quiet
    for _ in range(2):  # saturated: >= max_batch waiters
        busy.put(_Request(image=img, orig_size=(8, 8), seed=0))
    quiet.put(_Request(image=img, orig_size=(8, 8), seed=0))

    # backdate the quiet bucket's deadline: it has waited out max_delay
    srv._bucket_deadlines = {(256, 256): 0.0}
    bucket, reqs = srv._collect(srv.config.max_delay_ms / 1000.0)
    assert bucket == (256, 256), "expired bucket starved by the full one"
    assert len(reqs) == 1

    # with no expiries left, the saturated bucket launches immediately
    bucket, reqs = srv._collect(srv.config.max_delay_ms / 1000.0)
    assert bucket == (512, 512)
    assert len(reqs) == 2
