"""Minimal host-side dataset/loader (replaces torch DataLoader usage in the
reference, e.g. ice_exp.py:137-139). Yields numpy batches; all device work
happens inside the jitted train/predict steps. ``prefetch_to_device``
overlaps host batch slicing + H2D transfer with device compute (the role
torch DataLoader workers play for the reference)."""

from __future__ import annotations

import collections
from typing import Iterator, Tuple

import numpy as np


class ArrayDataset:
    """In-memory (x, y, launch_date) triplet dataset."""

    def __init__(self, x: np.ndarray, y: np.ndarray, launch_dates: np.ndarray):
        assert len(x) == len(y) == len(launch_dates)
        self.x = x
        self.y = y
        self.launch_dates = launch_dates
        # (rows, cols), mirroring ref ice_dataset.py:12
        self.image_shape = tuple(x.shape[2:4])

    def __len__(self) -> int:
        return len(self.y)

    def __getitem__(self, idx):
        return self.x[idx], self.y[idx], self.launch_dates[idx]


class DataLoader:
    """Batching iterator with optional shuffling (seeded, reproducible)."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield (
                self.dataset.x[idx],
                self.dataset.y[idx],
                self.dataset.launch_dates[idx],
            )


def prefetch_to_device(loader, size: int = 2):
    """Keep ``size`` (x, y) batches resident on device ahead of the consumer.

    ``jax.device_put`` is asynchronous, so enqueueing the next batch starts
    its host slicing + H2D copy while the consumer's jitted step is still
    executing — the overlap torch's DataLoader workers give the reference.
    launch dates stay host-side numpy (the climatology lookup is host math,
    train/predictor.py _clim_batch).
    """
    import jax

    queue = collections.deque()
    it = iter(loader)

    def enqueue():
        x, y, launch = next(it)
        queue.append((jax.device_put(x), jax.device_put(y), launch))

    try:
        for _ in range(max(size, 1)):
            enqueue()
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            enqueue()
        except StopIteration:
            pass
        yield out
