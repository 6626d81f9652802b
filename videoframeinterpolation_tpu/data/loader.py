"""Threaded prefetching batch loader with deterministic per-host sharding.

Replaces torch ``DataLoader`` + ``DistributedSampler`` (reference
``train.py:54-56``): each host process sees a disjoint, per-epoch-shuffled
shard of the index space; worker threads decode/augment items while the
accelerator is busy with the previous step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch reshuffle (DistributedSampler.set_epoch semantics)."""
        self._epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.Generator(np.random.PCG64(self.seed + self._epoch))
            rng.shuffle(idx)
        if self.num_shards > 1:
            # Pad so every shard sees the same number of items, then slice
            # (DistributedSampler behavior).
            total = ((n + self.num_shards - 1) // self.num_shards) * self.num_shards
            if total > n:
                idx = np.concatenate([idx, idx[: total - n]])
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        nb = len(self)
        if nb == 0:
            return

        batches = [
            indices[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]

        item_q: "queue.Queue" = queue.Queue()
        out: dict[int, list] = {}
        lock = threading.Lock()
        done = threading.Event()
        ready: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        for bi, batch_idx in enumerate(batches):
            for pos, di in enumerate(batch_idx):
                item_q.put((bi, pos, int(di)))
        counts = [len(b) for b in batches]
        next_emit = [0]

        def worker():
            while not done.is_set():
                try:
                    bi, pos, di = item_q.get_nowait()
                except queue.Empty:
                    return
                item = self.dataset[di]
                to_emit = []
                with lock:
                    slot = out.setdefault(bi, [None] * counts[bi])
                    slot[pos] = item
                    # Collect finished batches in order (emit outside lock).
                    while next_emit[0] < nb:
                        b = out.get(next_emit[0])
                        if b is None or any(x is None for x in b):
                            break
                        to_emit.append(b)
                        del out[next_emit[0]]
                        next_emit[0] += 1
                for b in to_emit:
                    batch = _collate(b)
                    while not done.is_set():
                        try:
                            ready.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for _ in range(nb):
                yield ready.get()
        finally:
            done.set()


def _collate(items: list[dict]) -> dict:
    keys = items[0].keys()
    return {k: np.stack([it[k] for it in items], axis=0) for k in keys}
