"""Batching data loader with shuffling, validation split and device prefetch.

Replaces the reference ``BaseDataLoader`` (``base/base_data_loader.py``) +
torch ``DataLoader`` with a numpy/JAX pipeline:

* deterministic validation split: all indices are shuffled once with a fixed
  seed-0 generator and the first ``validation_split`` fraction becomes the
  validation set (reference :29-55);
* per-epoch shuffling of the training indices;
* multi-threaded sample assembly + a background prefetch queue that stages
  the next batches on device while the current step runs (the TPU analog of
  ``num_workers`` CPU workers);
* static shapes: the trailing partial batch is dropped so every step hits
  the same compiled executable.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


class DatasetWrapper:
    """start/end/every_nth view over a dataset (reference ``DS_Wrapper``)."""

    def __init__(self, dataset, start: int = 0, end: int = -1, every_nth: int = 1):
        self.dataset = dataset
        self.start = start
        self.end = len(dataset) if end == -1 else end
        self.every_nth = every_nth

    def __getitem__(self, i: int):
        return self.dataset[i * self.every_nth + self.start]

    def __len__(self) -> int:
        span = self.end - self.start
        return span // self.every_nth + (1 if span % self.every_nth else 0)


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        validation_split: float = 0.0,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 17,
        prefetch: int = 2,
        device_put: bool = True,
        _indices: Optional[np.ndarray] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.device_put = device_put
        # When a trainer attaches its mesh, the prefetch thread device-puts
        # each batch directly with the final (data-axis) sharding so the
        # batch crosses host->device exactly once.
        self.mesh = None
        self._rng = np.random.default_rng(seed)

        n = len(dataset)
        if _indices is not None:
            self.indices = _indices
            self._val_indices = None
        elif validation_split and validation_split > 0:
            if validation_split >= 1:
                n_val = int(validation_split)
            else:
                n_val = int(n * validation_split)
            order = np.arange(n)
            np.random.RandomState(0).shuffle(order)  # fixed split seed
            self._val_indices = order[:n_val]
            self.indices = order[n_val:]
        else:
            self.indices = np.arange(n)
            self._val_indices = None

        self.n_samples = len(self.indices)

    def split_validation(self) -> Optional["DataLoader"]:
        if self._val_indices is None or len(self._val_indices) == 0:
            return None
        return DataLoader(
            self.dataset,
            self.batch_size,
            shuffle=False,
            num_workers=self.num_workers,
            drop_last=self.drop_last,
            prefetch=self.prefetch,
            device_put=self.device_put,
            _indices=self._val_indices,
        )

    def __len__(self) -> int:
        if self.drop_last:
            return self.n_samples // self.batch_size
        return -(-self.n_samples // self.batch_size)

    def _batch_indices(self) -> List[np.ndarray]:
        idx = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        return [
            idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]

    def __iter__(self) -> Iterator[Dict]:
        batches = self._batch_indices()
        if not batches:
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            break
                        samples = list(pool.map(self.dataset.__getitem__, b))
                        batch = collate(samples)
                        if self.mesh is not None:
                            from monorec_tpu.parallel import shard_batch

                            batch = shard_batch(batch, self.mesh)
                        elif self.device_put:
                            import jax

                            batch = jax.device_put(batch)
                        q.put(batch)
            except BaseException as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
