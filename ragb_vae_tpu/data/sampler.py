"""Bucket-pure batch sampler with explicit seeded RNG.

Behavioral parity with `BucketBatchSampler` (bucket_dataset.py:312-389 and
its duplicate at text_alpha_bucket_dataset.py:93-171) — every batch holds
samples from exactly one resolution bucket, in sequential-per-bucket or
size-proportional interleaved order. Unlike the reference (module-global
`random`), determinism is first-class: pass a seed, reseed per epoch.
"""
from __future__ import annotations

import math
import random
from typing import Dict, Iterator, List, Optional


class BucketBatchSampler:
    def __init__(
        self,
        bucket_to_indices: Dict[str, List[int]],
        *,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        interleave: bool = False,
        seed: Optional[int] = None,
    ) -> None:
        self.bucket_to_indices = {k: list(v) for k, v in bucket_to_indices.items()}
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.interleave = interleave
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Change the shuffle stream between epochs (seeded mode only)."""
        self._epoch = epoch

    def _rng(self) -> random.Random:
        if self.seed is None:
            return random.Random()
        return random.Random((self.seed, self._epoch).__hash__())

    def _chunk_bucket(self, indices: List[int], rng: random.Random) -> List[List[int]]:
        """Shuffle one bucket's indices and slice them into batch lists.

        Each returned batch is bucket-pure by construction; a trailing
        short batch is kept unless ``drop_last``.
        """
        order = list(indices)
        if self.shuffle:
            rng.shuffle(order)
        n_full, rem = divmod(len(order), self.batch_size)
        chunks = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_full)
        ]
        if rem and not self.drop_last:
            chunks.append(order[n_full * self.batch_size :])
        return chunks

    def __iter__(self) -> Iterator[List[int]]:
        rng = self._rng()
        # Pre-chunk every bucket up front; both modes then only decide the
        # order in which the per-bucket batch queues are consumed.
        queues: Dict[str, List[List[int]]] = {
            key: self._chunk_bucket(idxs, rng)
            for key, idxs in self.bucket_to_indices.items()
        }

        if not self.interleave:
            order = list(queues)
            if self.shuffle:
                rng.shuffle(order)
            for key in order:
                yield from queues[key]
            return

        # Interleaved: at each step pick the bucket whose next batch to
        # emit, weighted by how many samples it still holds (so big buckets
        # appear proportionally often, matching the reference semantics).
        counts = {k: sum(len(b) for b in q) for k, q in queues.items()}
        cursor = {k: 0 for k in queues}
        live = [k for k, q in queues.items() if q]
        while live:
            if self.shuffle and len(live) > 1:
                key = rng.choices(live, weights=[counts[k] for k in live])[0]
            else:
                key = live[0]
            batch = queues[key][cursor[key]]
            cursor[key] += 1
            counts[key] -= len(batch)
            if cursor[key] == len(queues[key]):
                live.remove(key)
            yield batch

    def __len__(self) -> int:
        div = math.floor if self.drop_last else math.ceil
        return sum(
            div(len(indices) / self.batch_size)
            for indices in self.bucket_to_indices.values()
        )
