"""Host data loader with background prefetch.

Replaces the reference's ``PrefetchDataLoader`` + CUDA-stream
``DataPrefetcher`` (reference: src/data/datasets/prefetch_dataLoader.py:11-110)
and ``DistributedSampler`` (trainer.py:97).  Design:

* thread-pool sample fetch (cv2/numpy release the GIL) + ordered batch
  assembly;
* a bounded background queue keeps N batches ready while the device runs —
  with JAX's async dispatch this double-buffers host→device transfers;
* per-host sharding: each process iterates only its slice of the global
  index space (SURVEY §5.8), seeded per epoch like ``set_epoch``.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Optional

import numpy as np


def default_collate(samples: list[dict]) -> dict:
    """Stack images; stack array targets, keep dict/None targets as lists."""
    batch: dict[str, Any] = {}
    images = np.stack([s["image"] for s in samples])
    batch["image"] = images
    targets = [s.get("target") for s in samples]
    if targets[0] is None:
        pass
    elif isinstance(targets[0], dict):
        batch["target"] = targets  # task-specific collate should pad these
    else:
        batch["target"] = np.stack([np.asarray(t) for t in targets])
    for k in samples[0]:
        if k not in ("image", "target"):
            batch[k] = [s[k] for s in samples]
    return batch


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 4,
        collate_fn: Callable | None = None,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.collate_fn = collate_fn or getattr(dataset, "collate_fn", None) or default_collate
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = max(prefetch, 1)
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.process_count > 1:
            # pad to a multiple so every host yields the same #batches
            per = -(-n // self.process_count)
            padded = np.resize(idx, per * self.process_count)
            idx = padded[self.process_index::self.process_count]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        n_batches = len(self)
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    chunk = indices[b * self.batch_size:(b + 1) * self.batch_size]
                    try:
                        samples = list(pool.map(self.dataset.__getitem__, chunk))
                        out_q.put(self.collate_fn(samples))
                    except Exception as e:  # surface worker errors to consumer
                        out_q.put(e)
                        return
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


class DevicePrefetcher:
    """Double-buffered device feed (reference:
    src/data/datasets/prefetch_dataLoader.py:11-110 — the CUDA-stream
    prefetcher whose TPU analog this is).

    Wraps a host batch iterator: a daemon thread pulls batches, runs
    ``transfer`` (e.g. ``jax.device_put`` or a sharded put) and keeps up
    to ``depth`` transferred batches in flight, so host decode + H2D for
    step k+1 overlap device compute for step k.  ``jax.device_put``
    releases the GIL during the copy, so the overlap is real even on a
    single host core.  The train loop becomes a pipeline whose throughput
    is its slowest STAGE, not the serial sum of stages.
    """

    def __init__(self, iterator, transfer=None, depth: int = 2):
        import queue as _queue
        import threading as _threading

        import jax as _jax

        self._transfer = transfer or _jax.device_put
        self._q: "_queue.Queue" = _queue.Queue(maxsize=max(depth, 1))
        self._stop = _threading.Event()

        def producer():
            try:
                for batch in iterator:
                    if self._stop.is_set():
                        return
                    self._q.put(self._transfer(batch))
            except Exception as e:            # surface in consumer
                self._q.put(e)
                return
            self._q.put(None)

        self._thread = _threading.Thread(target=producer, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        while self._thread.is_alive():
            try:
                self._q.get_nowait()
            except Exception:
                break
