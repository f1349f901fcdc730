"""Batched text-alpha inference serving (daemon core + dynamic batcher).

Beyond-parity component: the reference ships only the one-shot CLI
(`inference_rgba_flux.py:65-116`); production serving on TPU wants the
opposite shape — a resident process with warm compiled programs and a
dynamic batcher, because on TPU the sampler's throughput comes from
batching (benchmarks/sample_bench.py) and every distinct input shape is
a fresh XLA compile. The design here is TPU-first:

- **Static shapes**: requests are snapped host-side to a small bucket
  envelope (`snap_size`) and every launch is padded to the configured
  `max_batch`, so the process compiles exactly one program per bucket
  and reuses it forever (jit cache keyed on shapes).
- **Dynamic batching**: a background thread drains the request queue,
  groups by bucket, and launches when `max_batch` requests are waiting
  or `max_delay_ms` has passed — the standard latency/throughput knob.
- **Per-request determinism**: all sampling noise (posterior eps, latent
  init, per-step re-noising) is drawn from the REQUEST's own key via a
  vmapped fold, then injected into the deterministic sampling core
  (`sample_latents_from_noise`). Results are a function of (image, seed)
  only — independent of co-batched traffic and of the batch padding.

`scripts/serve.py` wraps this in a stdlib HTTP daemon.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

PyTree = Any


def snap_size(
    height: int,
    width: int,
    *,
    multiple: int = 64,
    min_side: int = 64,
    max_pixels: int = 1024 * 1024,
) -> Tuple[int, int]:
    """Snap an arbitrary request size onto the serving bucket envelope.

    Preserves aspect ratio, rounds each side to `multiple` (the packed
    latent needs H and W divisible by 2 * vae_scale_factor = 16; 64 keeps
    the bucket count small, mirroring the reference's bucket grid in
    prepare_rgba_buckets.py:33-35), and scales down if the rounded area
    exceeds `max_pixels`.
    """
    if height <= 0 or width <= 0:
        raise ValueError(f"Invalid image size {height}x{width}.")
    h = max(min_side, int(round(height / multiple)) * multiple)
    w = max(min_side, int(round(width / multiple)) * multiple)
    if h * w > max_pixels:
        scale = (max_pixels / (h * w)) ** 0.5
        h = max(min_side, int(h * scale) // multiple * multiple)
        w = max(min_side, int(w * scale) // multiple * multiple)
    # a min_side clamp above can push the area back over max_pixels for
    # extreme aspect ratios (e.g. 65536x64) — shrink the long side so the
    # bucket envelope (and therefore the compile count) stays bounded
    if h * w > max_pixels:
        if h >= w:
            h = max(min_side, (max_pixels // w) // multiple * multiple)
        else:
            w = max(min_side, (max_pixels // h) // multiple * multiple)
    return h, w


def resize_rgba(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear-resize an (H, W, 4) float [0,1] RGBA image to `size` (h, w).

    Float-space and alpha-premultiplied: quantizing the model's continuous
    output through uint8 before resizing would collapse alpha to 256
    levels, and interpolating straight (non-premultiplied) RGBA bleeds the
    RGB of fully-transparent pixels into opaque neighbors (color fringes
    at alpha edges). Premultiply -> per-channel float bilinear ->
    unpremultiply avoids both."""
    if image.ndim != 3 or image.shape[-1] != 4:
        raise ValueError(f"Expected (H, W, 4) RGBA, got {image.shape}.")
    if image.shape[:2] == tuple(size):
        return image
    from PIL import Image

    arr = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
    alpha = arr[..., 3:4]
    pre = np.concatenate([arr[..., :3] * alpha, alpha], axis=-1)
    chans = [
        np.asarray(
            Image.fromarray(pre[..., c], mode="F").resize(
                (size[1], size[0]), Image.BILINEAR
            ),
            np.float32,
        )
        for c in range(4)
    ]
    out = np.stack(chans, axis=-1)
    a = out[..., 3:4]
    rgb = np.where(a > 1e-6, out[..., :3] / np.maximum(a, 1e-6), 0.0)
    return np.clip(np.concatenate([rgb, a], axis=-1), 0.0, 1.0)


@dataclass
class ServeConfig:
    max_batch: int = 4
    max_delay_ms: float = 30.0
    steps: int = 20
    bucket_multiple: int = 64
    max_pixels: int = 1024 * 1024
    request_timeout_s: float = 300.0
    # Measure-at-warmup batch policy. A fixed max_batch is measured-WORSE
    # at full FLUX.1 scale: int8 11.9 B serving at batch 4 does 0.149 req/s
    # with 26.8 s p50 vs batch 1's 0.181 img/s at ~5.5 s — dominated on
    # BOTH axes, because the transformer is MXU-saturated at b1 (while the
    # mid-size config needs b4 to win; benchmarks/results.md round-4
    # serving table). With auto_batch, warmup() times the compiled program
    # at batch 1 and at max_batch for each bucket and serves that bucket at
    # the smallest batch within `auto_batch_tol` of the best throughput —
    # larger batches must BUY their extra latency with real throughput.
    auto_batch: bool = True
    auto_batch_tol: float = 0.95


@dataclass
class _Request:
    image: np.ndarray          # bucket-sized (H, W, 4) float32 [0, 1]
    orig_size: Tuple[int, int]
    seed: int
    future: "Future[np.ndarray]" = field(default_factory=Future)
    enqueued: float = field(default_factory=time.monotonic)


class InferenceServer:
    """Resident batched sampler around a FluxTextAlphaModel.

    `submit()` is thread-safe and returns a Future resolving to the
    predicted text-alpha RGBA (H, W, 4) float32 at the REQUEST's original
    size. `start()`/`stop()` manage the batcher thread; the object is
    also a context manager.
    """

    def __init__(
        self,
        model,
        t_params: PyTree,
        vae_params: PyTree,
        config: Optional[ServeConfig] = None,
        mesh: Any = None,
        pipeline: Any = None,
    ) -> None:
        """`mesh`: optional Mesh with a "model" axis — the transformer params
        are sharded tensor-parallel (parallel/tensor_parallel.py) and the
        serving program is pinned to that layout; how full-scale FLUX.1
        serves on a pod. The model should be built with
        `attention_mesh=mesh` so the Pallas flash kernel shard_maps over
        heads on TPU.

        `pipeline`: optional PipelinedFluxTransformer — the transformer
        runs pipeline-parallel instead (per-stage devices, GPipe
        microbatches, host-driven step loop; parallel/pipeline.py). The
        noise derivation stays the jitted per-request draw, so
        (image, seed) determinism is identical to the single-program
        path. Mutually exclusive with `mesh`."""
        import jax

        if mesh is not None and pipeline is not None:
            raise ValueError("mesh (TP) and pipeline (PP) are mutually exclusive.")
        self.model = model
        # Param trees are committed to device ONCE per branch below:
        # from_pretrained returns host numpy trees, and jit re-uploads
        # non-device arguments on EVERY call — without the device_put,
        # each served batch would re-transfer the full weight tree
        # (~11.1 GiB for int8 FLUX.1) host-to-device, defeating the
        # resident-process design.
        self.config = config or ServeConfig()
        # per-bucket serving batch chosen by warmup() under auto_batch;
        # un-warmed buckets fall back to config.max_batch
        self._bucket_batch: Dict[Tuple[int, int], int] = {}
        self._queues: Dict[Tuple[int, int], "queue.Queue[_Request]"] = {}
        self._queues_lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._draining = False
        self._thread: Optional[threading.Thread] = None
        self._served = 0
        self._batches = 0
        self._inflight = 0
        self._lat_sum = 0.0
        self._lat_max = 0.0
        self._pipe = pipeline
        if pipeline is not None:
            # the staged per-device copies are the only params the PP
            # paths read; retaining the unsharded tree too would pin an
            # extra full model (~22 GiB bf16 at FLUX.1 scale) for the
            # daemon's lifetime
            self.t_params = None
            self._stage_params = pipeline.place_params(t_params)
            self.vae_params = jax.device_put(vae_params)
            self._prep = jax.jit(self._build_prep())
            self._decode = jax.jit(self._build_decode())
            self._step = None
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ragb_vae_tpu.parallel.tensor_parallel import (
                shard_transformer_params,
            )

            self.t_params, t_shardings = shard_transformer_params(t_params, mesh)
            rep = NamedSharding(mesh, P())
            self.vae_params = jax.device_put(vae_params, rep)
            self._step = jax.jit(
                self._build_step(),
                in_shardings=(t_shardings, rep, rep, rep),
                out_shardings=rep,
            )
        else:
            self.t_params = jax.device_put(t_params)
            self.vae_params = jax.device_put(vae_params)
            self._step = jax.jit(self._build_step())

    # -- jitted core ---------------------------------------------------
    def _build_prep(self):
        """encode + per-request noise draw + cond (first half of the
        single-program step; the PP transformer loop runs on the host)."""
        import jax
        import jax.numpy as jnp

        model = self.model
        steps = self.config.steps

        def prep(vae_params, gt, seeds):
            posterior = model.vae.encode(
                vae_params, (gt * 2.0 - 1.0).astype(model.dtype)
            )
            lat_shape = posterior.mean.shape[1:]

            def draw(seed):
                key = jax.random.PRNGKey(seed)
                k_enc, k_init, k_loop = jax.random.split(key, 3)
                eps = jax.random.normal(k_enc, lat_shape, jnp.float32)
                init = jax.random.normal(k_init, lat_shape, jnp.float32)
                per_step = jax.vmap(
                    lambda i: jax.random.normal(
                        jax.random.fold_in(k_loop, i), lat_shape, jnp.float32
                    )
                )(jnp.arange(steps))
                return eps, init, per_step

            eps, init, per_step = jax.vmap(draw)(seeds)
            latents = posterior.mean.astype(jnp.float32) + posterior.std.astype(
                jnp.float32
            ) * eps
            cond = (latents - model.shift_factor) * model.scaling_factor
            step_noises = jnp.moveaxis(per_step, 1, 0)  # (steps, B, h, w, C)
            return cond, init, step_noises

        return prep

    def _build_decode(self):
        import jax.numpy as jnp

        model = self.model

        def dec(vae_params, lat):
            decoded = model.vae.decode(
                vae_params,
                (lat / model.scaling_factor + model.shift_factor).astype(model.dtype),
            )
            return jnp.clip((decoded.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)

        return dec

    def _build_step(self):
        import jax
        import jax.numpy as jnp

        model = self.model
        steps = self.config.steps

        def step(t_params, vae_params, gt, seeds):
            posterior = model.vae.encode(
                vae_params, (gt * 2.0 - 1.0).astype(model.dtype)
            )
            lat_shape = posterior.mean.shape[1:]

            def draw(seed):
                key = jax.random.PRNGKey(seed)
                k_enc, k_init, k_loop = jax.random.split(key, 3)
                eps = jax.random.normal(k_enc, lat_shape, jnp.float32)
                init = jax.random.normal(k_init, lat_shape, jnp.float32)
                per_step = jax.vmap(
                    lambda i: jax.random.normal(
                        jax.random.fold_in(k_loop, i), lat_shape, jnp.float32
                    )
                )(jnp.arange(steps))
                return eps, init, per_step

            eps, init, per_step = jax.vmap(draw)(seeds)
            # mirrors encode_latents (flux_kontext_textalpha.py:329-333)
            # with the request's own posterior noise
            latents = posterior.mean.astype(jnp.float32) + posterior.std.astype(
                jnp.float32
            ) * eps
            cond = (latents - model.shift_factor) * model.scaling_factor
            step_noises = jnp.moveaxis(per_step, 1, 0)  # (steps, B, h, w, C)
            lat = model.sample_latents_from_noise(t_params, cond, init, step_noises)
            decoded = model.vae.decode(
                vae_params,
                (lat / model.scaling_factor + model.shift_factor).astype(model.dtype),
            )
            return jnp.clip((decoded.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)

        return step

    # -- public API ----------------------------------------------------
    def submit(self, image: np.ndarray, *, seed: Optional[int] = None) -> "Future[np.ndarray]":
        """Enqueue one RGBA image; returns a Future of the prediction."""
        if self._stop.is_set():
            raise RuntimeError("InferenceServer is stopped.")
        if self._draining:
            raise RuntimeError("InferenceServer is draining (shutting down).")
        # copy: np.asarray would alias a caller-owned float32 buffer, and a
        # caller mutating it while the request is queued would corrupt the batch
        image = np.array(image, dtype=np.float32, copy=True)
        if image.ndim != 3 or image.shape[-1] != 4:
            raise ValueError(
                f"submit() expects one (H, W, 4) RGBA image, got {image.shape}."
            )
        orig = (image.shape[0], image.shape[1])
        bucket = snap_size(
            *orig,
            multiple=self.config.bucket_multiple,
            max_pixels=self.config.max_pixels,
        )
        req = _Request(
            image=resize_rgba(image, bucket),
            orig_size=orig,
            # mask into uint32 range: an out-of-range seed would raise in the
            # np.uint32 batch assembly and fail every co-batched request
            seed=(int(seed) & 0xFFFFFFFF) if seed is not None
            else int(time.time_ns() % (2**31)),
        )
        with self._queues_lock:
            q = self._queues.setdefault(bucket, queue.Queue())
        q.put(req)
        if self._stop.is_set() and not req.future.done():
            # raced stop(): the batcher's final drain may already have run,
            # so nobody will ever read this queue entry
            try:
                req.future.set_exception(RuntimeError("Server stopped."))
            except Exception:
                pass  # drain got it first
        self._wake.set()
        return req.future

    def _run_batch(self, images: np.ndarray, seeds: np.ndarray) -> np.ndarray:
        """Run the compiled serving program on one assembled batch."""
        import jax.numpy as jnp

        if self._pipe is not None:
            from ragb_vae_tpu.parallel.pipeline import pipelined_sample_latents

            cond, init, noises = self._prep(
                self.vae_params, jnp.asarray(images), jnp.asarray(seeds)
            )
            lat = pipelined_sample_latents(
                self.model, self._pipe, self._stage_params, cond, init, noises
            )
            return np.asarray(self._decode(self.vae_params, lat))
        return np.asarray(
            self._step(
                self.t_params, self.vae_params, jnp.asarray(images), jnp.asarray(seeds)
            )
        )

    def _batch_for(self, bucket: Tuple[int, int]) -> int:
        return self._bucket_batch.get(bucket, self.config.max_batch)

    def warmup(self, sizes: Optional[List[Tuple[int, int]]] = None) -> None:
        """Pre-compile the serving program for the given bucket sizes, and
        (auto_batch) pick each bucket's serving batch by measurement.

        Cold-start compiles are minutes-long on TPU; a daemon should pay
        them at startup, not on the first request (which would otherwise
        burn the request's timeout budget on XLA). Under auto_batch the
        warmup additionally times one settled run at batch 1 and at
        max_batch and serves the bucket at the smallest batch within
        `auto_batch_tol` of the best measured throughput — the policy that
        makes full-scale int8 serve at b1 (throughput AND latency winner)
        while mid-size keeps b4 (ServeConfig.auto_batch docstring).
        """
        for size in sizes or [(512, 512)]:
            bucket = snap_size(
                *size,
                multiple=self.config.bucket_multiple,
                max_pixels=self.config.max_pixels,
            )
            candidates = [self.config.max_batch]
            if self.config.auto_batch and self.config.max_batch > 1:
                candidates = [1, self.config.max_batch]
            rates: Dict[int, float] = {}
            for b in candidates:
                images = np.zeros((b,) + bucket + (4,), np.float32)
                seeds = np.zeros((b,), np.uint32)
                self._run_batch(images, seeds)  # compile + settle
                if len(candidates) > 1:
                    t0 = time.perf_counter()
                    self._run_batch(images, seeds)
                    rates[b] = b / (time.perf_counter() - t0)
            if rates:
                best = max(rates.values())
                chosen = min(
                    b for b in candidates
                    if rates[b] >= self.config.auto_batch_tol * best
                )
                self._bucket_batch[bucket] = chosen
                print(
                    f"[serving] bucket {bucket[0]}x{bucket[1]}: "
                    + ", ".join(
                        f"b{b} {rates[b]:.3f} img/s" for b in candidates
                    )
                    + f" -> serving at batch {chosen}",
                    flush=True,
                )

    def start(self) -> "InferenceServer":
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._run, name="ragb-serve-batcher", daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30.0)
            if self._thread.is_alive():
                # mid-_launch on a minutes-long compile/sample: leave the
                # handle in place so a later start() cannot spawn a second
                # concurrent batcher over the same queues
                return
            self._thread = None

    def drain(self, timeout: Optional[float] = None) -> bool:
        """Graceful shutdown: refuse new requests, finish queued ones, stop.

        Returns True when the queues emptied within `timeout` (None = wait
        for `request_timeout_s` + one batch); False when stop() fired with
        work still queued (those futures fail with "Server stopped.").
        Pairs with the training stages' preemption handling: on SIGTERM
        the daemon answers everything already accepted, then exits.
        """
        self._draining = True
        if timeout is None:
            timeout = self.config.request_timeout_s + 60.0
        deadline = time.monotonic() + timeout
        clean = False
        while time.monotonic() < deadline:
            # in-flight counts: a batch the batcher has already _take()n is
            # invisible to the queues but its futures are unresolved — a
            # stop() while it computes would exit with answers computed but
            # never delivered, breaking the "answers everything accepted"
            # contract
            if self.stats["pending"] == 0 and self._inflight == 0:
                clean = True
                break
            time.sleep(0.05)
        self.stop()
        return clean

    def __enter__(self) -> "InferenceServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def stats(self) -> Dict[str, int]:
        with self._queues_lock:
            pending = sum(q.qsize() for q in self._queues.values())
        out = {"served": self._served, "pending": pending, "batches": self._batches}
        if self._served:
            # end-to-end request latency (enqueue -> result), ms
            out["latency_avg_ms"] = round(1000.0 * self._lat_sum / self._served, 1)
            out["latency_max_ms"] = round(1000.0 * self._lat_max, 1)
        return out

    # -- batcher -------------------------------------------------------
    def _run(self) -> None:
        max_delay = self.config.max_delay_ms / 1000.0
        while not self._stop.is_set():
            batch = self._collect(max_delay)
            if batch is None:
                continue
            bucket, reqs = batch
            # drop requests already past the client timeout: their callers
            # are gone, and launching them would burn a full sampler run
            # exactly when the server is saturated (retry amplification)
            now = time.monotonic()
            live: List[_Request] = []
            for r in reqs:
                if now - r.enqueued > self.config.request_timeout_s:
                    if not r.future.done():
                        r.future.set_exception(
                            TimeoutError("request expired in queue")
                        )
                else:
                    live.append(r)
            reqs = live
            if not reqs:
                continue
            self._inflight = len(reqs)  # visible to drain(): taken != done
            try:
                self._launch(reqs)
            except Exception as exc:  # surface failures on the futures
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(exc)
            finally:
                self._inflight = 0
        # drain: fail anything still queued
        with self._queues_lock:
            queues = list(self._queues.values())
        for q in queues:
            while True:
                try:
                    req = q.get_nowait()
                except queue.Empty:
                    break
                if not req.future.done():
                    req.future.set_exception(RuntimeError("Server stopped."))

    def _collect(self, max_delay: float) -> Optional[Tuple[Tuple[int, int], List[_Request]]]:
        """Launch a full bucket immediately; otherwise launch the oldest
        EXPIRED bucket. Deadlines are per bucket (first-waiter age), so a
        quiet bucket cannot be starved by a busier one resetting a shared
        timer — max_delay_ms is a real per-bucket latency bound."""
        deadlines: Dict[Tuple[int, int], float] = getattr(self, "_bucket_deadlines", None)
        if deadlines is None:
            deadlines = self._bucket_deadlines = {}
        while not self._stop.is_set():
            with self._queues_lock:
                ready = [(q.qsize(), b, q) for b, q in self._queues.items() if q.qsize()]
            if not ready:
                deadlines.clear()
                self._wake.wait(timeout=0.1)
                self._wake.clear()
                continue
            now = time.monotonic()
            active = {b for _, b, _ in ready}
            for stale in [b for b in deadlines if b not in active]:
                del deadlines[stale]
            for _, b, _ in ready:
                deadlines.setdefault(b, now + max_delay)

            ready.sort(reverse=True, key=lambda t: t[0])
            # expired deadlines FIRST: if a saturated bucket (always >=
            # max_batch waiters) preempted them, a quiet bucket's requests
            # would wait out the full future timeout instead of
            # max_delay_ms — the per-bucket deadline must be a real bound
            # even under sustained load elsewhere
            expired = [
                (sz, b, qq) for sz, b, qq in ready if deadlines[b] <= now
            ]
            if expired:
                _, bucket, q = max(expired, key=lambda t: t[0])
                deadlines.pop(bucket, None)
                return bucket, self._take(q, self._batch_for(bucket))
            size, bucket, q = ready[0]
            if size >= self._batch_for(bucket):
                deadlines.pop(bucket, None)
                return bucket, self._take(q, self._batch_for(bucket))
            self._wake.wait(timeout=max(min(deadlines.values()) - now, 1e-3))
            self._wake.clear()
        return None

    @staticmethod
    def _take(q: "queue.Queue[_Request]", n: int) -> List[_Request]:
        out: List[_Request] = []
        while len(out) < n:
            try:
                out.append(q.get_nowait())
            except queue.Empty:
                break
        return out

    def _launch(self, reqs: List[_Request]) -> None:
        n = len(reqs)
        bucket = (reqs[0].image.shape[0], reqs[0].image.shape[1])
        pad = max(self._batch_for(bucket), n) - n
        images = np.stack([r.image for r in reqs] + [reqs[0].image] * pad)
        seeds = np.asarray([r.seed for r in reqs] + [0] * pad, dtype=np.uint32)
        out = self._run_batch(images, seeds)
        done = time.monotonic()
        self._batches += 1
        for r, pred in zip(reqs, out[:n]):
            if r.future.done():
                # raced stop()/expiry already failed this future; a bare
                # set_result would raise InvalidStateError here and the
                # _run except-path would then fail every innocent
                # co-batched request's computed result along with it
                continue
            r.future.set_result(resize_rgba(pred, r.orig_size))
            self._served += 1
            lat = done - r.enqueued
            self._lat_sum += lat
            if lat > self._lat_max:
                self._lat_max = lat
