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

    def __iter__(self) -> Iterator[List[int]]:
        rng = self._rng()
        if not self.interleave:
            bucket_keys = list(self.bucket_to_indices.keys())
            if self.shuffle:
                rng.shuffle(bucket_keys)
            for bucket in bucket_keys:
                indices = list(self.bucket_to_indices[bucket])
                if self.shuffle:
                    rng.shuffle(indices)
                total = len(indices)
                step = self.batch_size
                max_len = total - (total % step) if self.drop_last else total
                for start in range(0, max_len, step):
                    batch = indices[start : start + step]
                    if len(batch) < self.batch_size and self.drop_last:
                        continue
                    yield batch
            return

        # Interleaved: draw buckets proportional to their remaining size.
        remaining = {k: list(v) for k, v in self.bucket_to_indices.items()}
        if self.shuffle:
            for v in remaining.values():
                rng.shuffle(v)
        active = [k for k, v in remaining.items() if v]
        while active:
            if self.shuffle and len(active) > 1:
                weights = [len(remaining[k]) for k in active]
                bucket = rng.choices(active, weights=weights, k=1)[0]
            else:
                bucket = active[0]

            indices = remaining[bucket]
            if len(indices) < self.batch_size:
                if self.drop_last:
                    active.remove(bucket)
                    continue
                batch = indices[:]
                remaining[bucket] = []
            else:
                batch = indices[: self.batch_size]
                remaining[bucket] = indices[self.batch_size :]

            if not remaining[bucket]:
                active.remove(bucket)
            if batch:
                yield batch

    def __len__(self) -> int:
        total = 0
        for indices in self.bucket_to_indices.values():
            if self.drop_last:
                total += math.floor(len(indices) / self.batch_size)
            else:
                total += math.ceil(len(indices) / self.batch_size)
        return total
