"""Host-side input pipeline: threaded prefetching batch loader.

TPU-idiomatic replacement for torch DataLoader(num_workers=8,
pin_memory=True) (reference train.py:132-133): decode/augment on host
threads, collate to stacked numpy NHWC batches, and keep a prefetch
queue full so the device never waits on input. Works with any indexable
dataset returning tuples of numpy arrays.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np


def _collate(samples: Sequence) -> tuple:
    n_fields = len(samples[0])
    return tuple(
        np.stack([s[i] for s in samples], axis=0) for i in range(n_fields)
    )


class DataLoader:
    """Iterate batches of a dataset with background decode threads."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> list:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        return [
            idx[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]

    def __iter__(self) -> Iterator[tuple]:
        batches = self._batches()
        self._epoch += 1
        task_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            task_q.put((bi, b))
        results = {}
        lock = threading.Lock()
        # bound the in-flight backlog so workers don't race arbitrarily far
        budget = threading.Semaphore(self.prefetch + self.num_workers)

        def worker():
            while True:
                budget.acquire()
                try:
                    bi, b = task_q.get_nowait()
                except queue.Empty:
                    budget.release()
                    return
                try:
                    batch = _collate([self.dataset[int(i)] for i in b])
                except Exception as e:  # surface loader errors to consumer
                    batch = e
                with lock:
                    results[bi] = batch

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        next_bi = 0
        import time

        while next_bi < len(batches):
            with lock:
                batch = results.pop(next_bi, None)
            if batch is None:
                time.sleep(0.002)
                continue
            if isinstance(batch, Exception):
                raise batch
            yield batch
            budget.release()
            next_bi += 1
