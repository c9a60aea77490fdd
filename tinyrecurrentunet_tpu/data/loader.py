"""Batching loader: shuffling, per-host sharding, background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(reference `dataset.py:393-412`): each host reads only its own shard of the
index space (the SPMD analog of DistributedSampler), batches on a
background thread, and hands dense numpy arrays to the jitted step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        # Worker threads decode/augment items in parallel (the reference
        # used 4 torch DataLoader workers, `dataset.py:402`). Determinism is
        # per-item, not per-schedule: each item draws from
        # default_rng((seed, epoch, index)), so results are independent of
        # worker interleaving.
        self.num_workers = max(num_workers, 1)
        self._epoch = 0

    def __len__(self):
        n = len(range(self.shard_index, len(self.dataset), self.num_shards))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # same permutation on every host, then shard (DistributedSampler
            # semantics)
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        return idx[self.shard_index :: self.num_shards]

    def _get_item(self, index: int):
        """Fetch one item; a corrupt/unreadable file falls back to the next
        index instead of killing the epoch (the reference's loader raised,
        hanging the NCCL group — SURVEY.md §5 failure-detection gap)."""
        last_err = None
        for attempt in range(4):
            idx = (int(index) + attempt) % len(self.dataset)
            rng = np.random.default_rng((self.seed, self._epoch, idx))
            try:
                return self.dataset.get(idx, rng)
            except Exception as e:  # noqa: BLE001 - data errors only
                last_err = e
                print(f"data: skipping item {idx}: {e}", flush=True)
        raise RuntimeError(
            f"4 consecutive unreadable dataset items starting at {index}"
        ) from last_err

    def _make_batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray, list]]:
        indices = self._epoch_indices()
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for i in range(0, len(indices), self.batch_size):
                chunk = indices[i : i + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    return
                items = list(pool.map(self._get_item, chunk))
                length = min(len(c) for c, _, _ in items)
                clean = np.stack([c[:length] for c, _, _ in items])
                noisy = np.stack([n[:length] for _, n, _ in items])
                ids = [fid for _, _, fid in items]
                yield clean, noisy, ids

    def __iter__(self):
        """Background-thread prefetch iterator; one pass over the epoch."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for batch in self._make_batches():
                    q.put(batch)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        self._epoch += 1
