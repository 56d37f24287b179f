"""Batch loader + device prefetch.

Replaces the reference's torch DataLoader + EnlargedSampler + prefetchers
(Train/basicsr/data/__init__.py:56-127, data_sampler.py,
prefetch_dataloader.py):

  * ``EnlargedShuffleSampler`` — deterministic per-epoch shuffle with
    ``ratio`` enlargement and rank-strided sharding (the DistributedSampler
    variant at data_sampler.py:6-49), host-process version.
  * ``BatchLoader`` — thread-pool sample fetch + numpy collate (the worker
    processes of torch DataLoader become threads; cv2 decode releases the
    GIL so threads scale fine for this workload).
  * ``DevicePrefetcher`` — double-buffered host->device transfer, the
    CUDAPrefetcher equivalent (prefetch_dataloader.py:79-126): while step N
    computes, batch N+1 is already being placed on the mesh.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator

import numpy as np

import jax


class EnlargedShuffleSampler:
    """data_sampler.py:6-49: indices for one epoch, deterministic in
    (seed, epoch), optionally enlarged by ``ratio`` and rank-strided."""

    def __init__(self, num_samples: int, ratio: int = 1, rank: int = 0,
                 world_size: int = 1, shuffle: bool = True, seed: int = 0):
        self.num_samples = num_samples
        self.total = int(np.ceil(num_samples * ratio / world_size)) * world_size
        self.rank = rank
        self.world_size = world_size
        self.shuffle = shuffle
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        if self.shuffle:
            g = np.random.default_rng(self.seed + epoch)
            idx = g.permutation(self.total)
        else:
            idx = np.arange(self.total)
        idx = idx % self.num_samples
        return idx[self.rank::self.world_size]


def default_collate(samples: list[Any]):
    """Stack a list of (possibly nested dict) samples into batched arrays;
    non-array leaves (paths) are collected into lists."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    if isinstance(first, (str, bytes)):
        return list(samples)
    if isinstance(first, np.ndarray) or np.isscalar(first):
        return np.stack([np.asarray(s) for s in samples])
    return list(samples)


class BatchLoader:
    """Iterate epoch batches from a map-style dataset."""

    def __init__(self, dataset, batch_size: int, sampler: EnlargedShuffleSampler,
                 num_workers: int = 4, drop_last: bool = True,
                 collate: Callable = default_collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate = collate
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler.epoch_indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        indices = self.sampler.epoch_indices(self._epoch)
        nb = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline: submit batch i+1 while collating batch i
            futures = None
            for b in range(nb):
                chunk = indices[b * self.batch_size:(b + 1) * self.batch_size]
                next_futures = [pool.submit(self.dataset.__getitem__, int(i))
                                for i in chunk]
                if futures is not None:
                    yield self.collate([f.result() for f in futures])
                futures = next_futures
            if futures is not None:
                yield self.collate([f.result() for f in futures])


class DevicePrefetcher:
    """Double-buffered host->device pipeline: a background thread pulls
    host batches and places the array leaves on the mesh ahead of compute."""

    def __init__(self, batches: Iterable, put: Callable[[Any], Any],
                 depth: int = 2):
        self._iter = iter(batches)
        self._put = put
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._iter:
                self._q.put(self._put(batch))
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item


def device_put_batch(mesh, batch, data_axis: str = "data"):
    """Array leaves -> mesh (batch-dim sharded); non-arrays pass through.

    Multi-process (TPU pod / multi-host CPU): each process's loader yields
    its rank's LOCAL batch (EnlargedShuffleSampler shards the epoch), and
    the local shards are assembled into one global array over the mesh —
    the DistributedSampler+DDP data path (data_sampler.py:40), no NCCL.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[data_axis]
    multiproc = jax.process_count() > 1

    def put(x):
        if isinstance(x, np.ndarray) and x.ndim >= 1:
            sharded = NamedSharding(mesh, P(data_axis))
            if multiproc:
                if (x.shape[0] * jax.process_count()) % n != 0:
                    # replicating per-rank-DIFFERENT data would silently
                    # diverge the replicas — refuse instead
                    raise ValueError(
                        f"global batch {x.shape[0]} x "
                        f"{jax.process_count()} processes is not divisible "
                        f"by the data-axis size {n}; adjust "
                        "batch_size_per_gpu (local batch must be a "
                        "multiple of the per-process device count)")
                return jax.make_array_from_process_local_data(sharded, x)
            if x.shape[0] % n == 0:
                return jax.device_put(x, sharded)
            return jax.device_put(x, NamedSharding(mesh, P()))
        return x

    return jax.tree.map(put, batch)
