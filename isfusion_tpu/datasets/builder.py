"""Dataset + dataloader construction.

Parity surface: mmdet's `build_dataset`/`build_dataloader` used by
`mmdet3d/apis/train.py:41-75`. TPU-native loader: a numpy-collating,
multi-worker (thread pool) prefetching iterator producing fixed-shape
batches ready for `jax.device_put` — replacing torch DataLoader +
DistributedGroupSampler. Per-host sharding for multi-process SPMD is
selected with (shard_id, num_shards).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ..registry import DATASETS, build_from_cfg


def build_dataset(cfg):
    return build_from_cfg(dict(cfg), DATASETS)


def collate_batch(samples: list) -> dict:
    """Stack per-sample dicts of numpy arrays; 'img_metas' collected as a
    list (host-only). Single-variant TTA lists (MultiScaleFlipAug3D with
    flip=False) are unwrapped; multi-variant TTA batches go through the
    aug-test path, not this collate."""
    if samples and isinstance(samples[0], list):
        if any(len(s) != 1 for s in samples):
            raise NotImplementedError(
                "multi-variant TTA samples cannot be stacked into one "
                "batch; run per-variant inference + "
                "core.post_processing.merge_aug_bboxes_3d")
        samples = [s[0] for s in samples]
    out = {}
    for k in samples[0]:
        if k == "img_metas":
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out


class DataLoader:
    """Prefetching loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 shard_id: int = 0, num_shards: int = 1,
                 prefetch: int = 2, plan_fn=None):
        self.dataset = dataset
        # optional collate-time batch enricher (ops/host_plan.make_plan_fn):
        # computes the sparse encoder's integer structure on host inside
        # the prefetch worker, overlapped with the device step
        self.plan_fn = plan_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(int(num_workers), 1)
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        # per-host contiguous shard (DistributedGroupSampler equivalent)
        per = n // self.num_shards
        idx = idx[self.shard_id * per:(self.shard_id + 1) * per]
        if self.drop_last:
            idx = idx[:len(idx) // self.batch_size * self.batch_size]
        return idx

    def __len__(self) -> int:
        per = len(self.dataset) // self.num_shards
        if self.drop_last:
            return per // self.batch_size
        return (per + self.batch_size - 1) // self.batch_size

    def _make(self, b) -> dict:
        batch = collate_batch([self.dataset[int(i)] for i in b])
        if self.plan_fn is not None:
            batch = self.plan_fn(batch)
        return batch

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.num_workers <= 1:
            yield from self._iter_single(batches)
            return
        # pipelined multi-worker prefetch: N threads each build a
        # DIFFERENT future batch (augmentation + collate + host plan), so
        # per-batch host work up to N x the device step stays hidden —
        # the host-plan build alone is ~0.7 s/sample against a ~0.6 s
        # step (PERF.md r5), which a single worker cannot hide. The big
        # per-batch numpy sorts release the GIL, so threads suffice
        # (reference equivalent: workers_per_gpu=6 subprocess loaders,
        # mmdet3d/apis/train.py:66-75). Results yield IN ORDER.
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            from collections import deque
            depth = max(int(self.prefetch), self.num_workers)
            inflight: "deque" = deque()
            it = iter(batches)
            for b in it:
                inflight.append(ex.submit(self._make, b))
                if len(inflight) >= depth:
                    break
            for b in it:
                fut = inflight.popleft()
                inflight.append(ex.submit(self._make, b))
                yield fut.result()
            while inflight:
                yield inflight.popleft().result()
        finally:
            ex.shutdown(wait=False, cancel_futures=True)

    def _iter_single(self, batches) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._make(b))
            except BaseException as e:   # propagate to the consumer —
                q.put(e)                 # a swallowed error looks like an
            finally:                     # empty dataset
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int = 4,
                     num_gpus: int = 1, dist: bool = False, shuffle=True,
                     seed: Optional[int] = None, shard_id: int = 0,
                     num_shards: int = 1, drop_last: Optional[bool] = None,
                     plan_fn=None, **kwargs) -> DataLoader:
    if drop_last is None:
        # evaluation must see every sample; training keeps static shapes
        drop_last = bool(shuffle)
    return DataLoader(dataset, batch_size=samples_per_gpu, shuffle=shuffle,
                      num_workers=workers_per_gpu, seed=seed or 0,
                      shard_id=shard_id, num_shards=num_shards,
                      drop_last=drop_last, plan_fn=plan_fn)
