"""Data loading: multi-worker prefetching over the host pipeline.

Replaces the reference's torch DataLoader workers (mmcv build_dataloader)
with a process-pool + background-thread prefetcher feeding fixed-shape
numpy batches; device transfer happens in the train loop (or is fused into
the jitted step).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class Loader:
    """Infinite shuffling loader with background prefetch."""

    def __init__(self, dataset, batch_size, collate_fn,
                 shuffle=True, seed=0, num_workers=4, prefetch=2,
                 drop_last=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate_fn
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _index_stream(self):
        n = len(self.dataset)
        if n == 0:
            raise ValueError("Loader: empty dataset")
        while True:
            order = self.rng.permutation(n) if self.shuffle else np.arange(n)
            if n < self.batch_size:
                # smaller-than-batch dataset: tile the epoch so a batch
                # can always be formed. Without this, drop_last's
                # `range(0, n - bs + 1, bs)` is EMPTY and the index
                # stream spins forever producing nothing — the consumer
                # deadlocks on queue.get with no error.
                reps = -(-self.batch_size // n)
                order = np.concatenate([
                    self.rng.permutation(n) if self.shuffle
                    else np.arange(n) for _ in range(reps)])
                yield order[:self.batch_size]
                continue
            for i in range(0, n - (self.batch_size - 1 if self.drop_last
                                   else 0), self.batch_size):
                yield order[i:i + self.batch_size]

    def _worker(self):
        with ThreadPoolExecutor(self.num_workers) as pool:
            for idxs in self._index_stream():
                if self._stop.is_set():
                    return
                samples = list(pool.map(self.dataset.__getitem__, idxs))
                self._q.put(self.collate(samples))

    def __iter__(self) -> Iterator:
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker,
                                            daemon=True)
            self._thread.start()
        while True:
            yield self._q.get()

    def stop(self):
        self._stop.set()


def epoch_batches(dataset, batch_size, collate_fn):
    """Single ordered pass (evaluation); last short batch is padded by
    repeating the final sample (callers mask by true count)."""
    n = len(dataset)
    for i in range(0, n, batch_size):
        idxs = list(range(i, min(i + batch_size, n)))
        true = len(idxs)
        while len(idxs) < batch_size:
            idxs.append(idxs[-1])
        yield collate_fn([dataset[j] for j in idxs]), true
