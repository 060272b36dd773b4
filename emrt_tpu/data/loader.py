"""Host-side data loading: iteration-based sampling + prefetch to device.

TPU-native replacement for the reference's DataLoader stack
(``src/utils/dataloader.py:22-77`` IterationBasedBatchSampler over a
DistributedBatchSampler, and ``src/utils/multi_batch_collate.py`` val
collate): a deterministic infinite index sampler sharded per host, a
thread-pool map over the numpy dataset, and a double-buffered prefetch of
fixed-shape device batches (so the TPU never waits on the host between
steps).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np


class IterationSampler:
    """Infinite per-host batch-index stream, reshuffled every epoch.

    Equivalent to IterationBasedBatchSampler(set_epoch per iteration) +
    DistributedBatchSampler sharding (reference dataloader.py:22-77): every
    host sees a disjoint 1/num_shards slice of each epoch's permutation.
    """

    def __init__(self, num_samples: int, batch_size: int, shuffle: bool = True,
                 seed: int = 0, shard_index: int | None = None,
                 num_shards: int | None = None, drop_last: bool = True):
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.shard_index = jax.process_index() if shard_index is None else shard_index
        self.num_shards = jax.process_count() if num_shards is None else num_shards
        self.drop_last = drop_last

    def epoch_indices(self, epoch: int) -> np.ndarray:
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1_000_003 + epoch)
            idx = rng.permutation(self.num_samples)
        else:
            idx = np.arange(self.num_samples)
        # pad to a multiple of (num_shards * batch) so every host steps equally
        per = self.num_shards * self.batch_size
        if len(idx) % per:
            pad = per - len(idx) % per
            idx = np.concatenate([idx, idx[:pad]])
        return idx[self.shard_index::self.num_shards]

    def __iter__(self):
        epoch = 0
        while True:
            idx = self.epoch_indices(epoch)
            for i in range(0, len(idx) - self.batch_size + 1, self.batch_size):
                yield idx[i:i + self.batch_size]
            epoch += 1


class DataLoader:
    """Maps a sampler over a dataset with worker threads + device prefetch."""

    def __init__(self, dataset, batch_size: int, iterations: int | None = None,
                 shuffle: bool = True, seed: int = 0, num_workers: int = 2,
                 prefetch: int = 2, sharding=None, drop_last: bool = True,
                 start_iter: int = 0, shard_index: int | None = None,
                 num_shards: int | None = None):
        # shard_index/num_shards default to jax.process_index()/count()
        # inside IterationSampler; explicit values let tests simulate the
        # multi-host path on one process (reference DistributedBatchSampler
        # sharding, src/utils/dataloader.py:38-41)
        self.dataset = dataset
        self.batch_size = batch_size
        self.iterations = iterations
        self.sampler = IterationSampler(len(dataset), batch_size, shuffle=shuffle,
                                        seed=seed, drop_last=drop_last,
                                        shard_index=shard_index,
                                        num_shards=num_shards)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.sharding = sharding
        self.seed = seed
        self.start_iter = start_iter

    def _load_batch(self, indices: np.ndarray, it: int):
        imgs, labels = [], []
        for k, idx in enumerate(indices):
            rng = np.random.default_rng((self.seed, it, int(idx), k))
            img, label = self.dataset.get(int(idx), rng=rng)
            imgs.append(img)
            labels.append(label)
        batch = {"image": np.stack(imgs), "label": np.stack(labels)}
        return batch

    def _to_device(self, batch):
        if self.sharding is None:
            return batch
        if jax.process_count() > 1:
            # true multi-host: each process holds only its shard of the
            # global batch; assemble the global jax.Array from the
            # process-local data (the TPU-native analog of the reference's
            # DistributedBatchSampler feeding paddle.DataParallel,
            # src/utils/dataloader.py:38-41 + train.py:116-123)
            return jax.tree.map(
                lambda a: jax.make_array_from_process_local_data(
                    self.sharding, a), batch)
        return jax.device_put(batch, self.sharding)

    def __iter__(self):
        stop = threading.Event()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def producer():
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            try:
                futures = []
                it = self.start_iter
                sampler_iter = iter(self.sampler)
                # skip already-consumed batches on resume
                for _ in range(self.start_iter):
                    next(sampler_iter)
                for indices in sampler_iter:
                    if stop.is_set() or (self.iterations is not None and it >= self.iterations):
                        break
                    futures.append(pool.submit(self._load_batch, indices, it))
                    it += 1
                    while len(futures) >= self.num_workers or (
                            futures and futures[0].done()):
                        q.put(futures.pop(0).result())
                        if stop.is_set():
                            return
                for f in futures:
                    q.put(f.result())
            finally:
                pool.shutdown(wait=False)
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield self._to_device(batch)
        finally:
            stop.set()

    def __len__(self):
        if self.iterations is not None:
            return self.iterations - self.start_iter
        return len(self.dataset) // self.batch_size


def val_batches(dataset, batch_size: int):
    """Sequential val iteration: yields lists of (img, label) numpy pairs.

    Mirrors the reference's multi_val_fn collate (variable-shape batches as
    python lists, multi_batch_collate.py:17-29).
    """
    batch = []
    for i in range(len(dataset)):
        batch.append(dataset.get(i))
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        yield batch
