"""Host-side data loader: threaded decode + bounded prefetch queue.

The torch `DataLoader(num_workers=N)` replacement. PIL's PNG decode releases
the GIL, so a thread pool gives real decode parallelism without the fork
overhead of process workers; a bounded background queue keeps batches ready
while the TPU computes (the device-transfer double-buffer lives in
`device_prefetch`).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np


def default_collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack array-valued keys to (B, ...) batches; everything else to lists.

    All items must share the same key set (bucket-pure batches share shapes).
    """
    if not items:
        return {}
    out: Dict[str, Any] = {}
    for key in items[0]:
        values = [item[key] for item in items]
        first = values[0]
        if isinstance(first, np.ndarray):
            out[key] = np.stack(values, axis=0)
        elif isinstance(first, (int, float, bool, np.number)):
            out[key] = np.asarray(values)
        else:
            out[key] = values
    return out


def pad_collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Zero-pad each array key to the max H/W in the batch, then stack.

    Parity with `_pad_collate_tensors` (rgba_component_dataset.py:146-170),
    channels-last: pads bottom/right of (H, W, C) arrays.
    """
    tensor_keys = [k for k, v in items[0].items() if isinstance(v, np.ndarray)]
    out: Dict[str, Any] = {}
    for key in tensor_keys:
        max_h = max(item[key].shape[0] for item in items)
        max_w = max(item[key].shape[1] for item in items)
        padded = []
        for item in items:
            arr = item[key]
            pad_h, pad_w = max_h - arr.shape[0], max_w - arr.shape[1]
            if pad_h or pad_w:
                arr = np.pad(arr, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=0.0)
            padded.append(arr)
        out[key] = np.stack(padded, axis=0)
    return out


class DataLoader:
    """Map-style dataset -> iterator of collated batches.

    Either `batch_sampler` (yields index lists) or `batch_size` (+optional
    shuffle/drop_last over range(len(dataset))) must be provided.
    """

    def __init__(
        self,
        dataset,
        *,
        batch_sampler: Optional[Iterable[Sequence[int]]] = None,
        batch_size: Optional[int] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        collate_fn: Optional[Callable[[List[Dict[str, Any]]], Dict[str, Any]]] = None,
        prefetch_batches: int = 2,
        seed: Optional[int] = None,
        process_shard: Optional[Sequence[int]] = None,
    ) -> None:
        """`process_shard=(index, count)`: multi-host input sharding. Every
        process iterates the SAME seeded global index stream (so hosts agree
        on batch boundaries and bucket choices), but fetches/decodes only
        its contiguous sub-slice of each batch — the per-host half of the
        reference's accelerate DataLoader sharding. Batches then carry
        `global_batch_size` so the training loop can reassemble the global
        array (`parallel.put_global_batch`). Global batches must divide by
        `count` (sharded train loaders force drop_last)."""
        if (batch_sampler is None) == (batch_size is None):
            raise ValueError("Provide exactly one of batch_sampler or batch_size.")
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, int(num_workers))
        self.collate_fn = collate_fn or default_collate
        self.prefetch_batches = max(0, int(prefetch_batches))
        self.seed = seed
        if process_shard is not None:
            index, count = (int(process_shard[0]), int(process_shard[1]))
            if not (count >= 1 and 0 <= index < count):
                raise ValueError(f"invalid process_shard {process_shard!r}")
            self.process_shard = (index, count) if count > 1 else None
        else:
            self.process_shard = None
        self._epoch = 0
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers) if self.num_workers else None

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.batch_sampler, "set_epoch"):
            self.batch_sampler.set_epoch(epoch)

    def _index_batches(self) -> Iterator[List[int]]:
        if self.batch_sampler is not None:
            yield from (list(b) for b in self.batch_sampler)
            return
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(None if self.seed is None else (self.seed, self._epoch))
            rng.shuffle(indices)
        n = len(indices)
        limit = n - (n % self.batch_size) if self.drop_last else n
        for start in range(0, limit, self.batch_size):
            yield indices[start : start + self.batch_size].tolist()

    def _fetch(self, batch_indices: List[int]) -> Dict[str, Any]:
        global_n = len(batch_indices)
        if self.process_shard is not None:
            index, count = self.process_shard
            if global_n % count:
                # hosts must agree on a uniform per-host row count (the
                # global array is assembled from equal local slices);
                # build_dataloader forces drop_last on sharded train loaders
                raise ValueError(
                    f"global batch of {global_n} not divisible by "
                    f"{count} processes — use drop_last or a divisible batch_size"
                )
            per = global_n // count
            batch_indices = batch_indices[index * per : (index + 1) * per]
        batch = self._fetch_items(batch_indices)
        if self.process_shard is not None:
            batch["global_batch_size"] = global_n
        return batch

    def _fetch_items(self, batch_indices: List[int]) -> Dict[str, Any]:
        if hasattr(self.dataset, "getitems"):
            # dataset-level batch fetch (e.g. the native C++ batch PNG
            # decode in MixedBucketDataset.getitems — its worker threads
            # replace the Python-side pool for that path). Hand the pool's
            # map to the dataset so its per-item FALLBACK (native lib
            # unbuilt, mixed sizes, non-PNG) still decodes in parallel.
            # kwarg support is detected from the signature (cached), NOT by
            # catching TypeError around the call: a TypeError raised inside
            # item decoding (corrupt image) would be misread as "no map_fn
            # kwarg" and silently re-decode the whole batch, losing the
            # real error.
            accepts_map_fn = getattr(self, "_getitems_accepts_map_fn", None)
            if accepts_map_fn is None:
                import inspect

                try:
                    params = inspect.signature(self.dataset.getitems).parameters
                    accepts_map_fn = "map_fn" in params or any(
                        p.kind is inspect.Parameter.VAR_KEYWORD
                        for p in params.values()
                    )
                except (TypeError, ValueError):  # builtins without signatures
                    accepts_map_fn = False
                self._getitems_accepts_map_fn = accepts_map_fn
            if accepts_map_fn:
                items = list(
                    self.dataset.getitems(
                        batch_indices,
                        map_fn=self._pool.map if self._pool is not None else None,
                    )
                )
            else:
                items = list(self.dataset.getitems(batch_indices))
        elif self._pool is not None and len(batch_indices) > 1:
            items = list(self._pool.map(self.dataset.__getitem__, batch_indices))
        else:
            items = [self.dataset[i] for i in batch_indices]
        return self.collate_fn(items)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.prefetch_batches <= 0:
            for batch_indices in self._index_batches():
                yield self._fetch(batch_indices)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()
        error_holder: List[BaseException] = []
        stop = threading.Event()

        def producer():
            try:
                for batch_indices in self._index_batches():
                    item = self._fetch(batch_indices)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as exc:  # propagate into the consumer
                error_holder.append(exc)
            finally:
                # The sentinel must be DELIVERED, not attempted: at normal
                # epoch end the queue is typically full (consumer alive,
                # mid-step, slower than decode) and a put_nowait would drop
                # it, hanging the consumer in q.get() forever — and losing
                # any producer exception with it. Block with the same
                # stop-aware loop as items; stop means the consumer exited
                # early and is draining, so the sentinel is moot.
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            if error_holder:
                raise error_holder[0]
        finally:
            # An early exit (break / StopIteration / GeneratorExit) must not
            # strand the producer blocked on q.put holding decoded batches
            # for the rest of the process — signal it and drain until it dies.
            stop.set()
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                thread.join(timeout=0.05)

    def __len__(self) -> int:
        if self.batch_sampler is not None:
            return len(self.batch_sampler)  # type: ignore[arg-type]
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)


def device_prefetch(iterator: Iterable[Dict[str, Any]], *, size: int = 2, sharding=None):
    """Move batches onto device ahead of consumption (double-buffering).

    Numpy batches become committed jax arrays (optionally with a
    `NamedSharding` for multi-chip input pipelines) while the previous step
    computes — the host->HBM copy rides under compute.
    """
    import jax

    buf: List[Dict[str, Any]] = []

    def put(batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                out[k] = jax.device_put(v, sharding) if sharding is not None else jax.device_put(v)
            else:
                out[k] = v
        return out

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        batch = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
