"""Threaded batch prefetcher.

The reference feeds each DDP rank from a 10-worker torch DataLoader
(reference: pl/train.py:47-53). Host-side item assembly here is cv2/numpy
(GIL-releasing), so a thread pool + bounded queue overlaps data loading with
the device step without multiprocessing. A native C++ loader can slot in
behind the same iterator contract later.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Sequence

import numpy as np

from .batching import device_batch, stack_batches


class BatchLoader:
    """Iterates stacked device batches of `batch_size` items, prefetching
    `prefetch` batches ahead with `num_workers` threads."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 8, prefetch: int = 4,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[dict]:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        batches: List[Sequence[int]] = []
        for s in range(0, len(order), self.batch_size):
            idxs = order[s: s + self.batch_size]
            if len(idxs) < self.batch_size and self.drop_last:
                break
            batches.append(idxs)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(
                        lambda i: device_batch(self.dataset[int(i)]), idxs))
                    q.put(stack_batches(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    return
                yield b
        finally:
            stop.set()
