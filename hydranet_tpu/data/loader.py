"""Batch collation + a multi-process prefetching loader (TPU-native
equivalent of the reference Collater + torch DataLoader usage,
dataloader.py:544-633 and train.py:66-84).

Key TPU-first differences from the reference:

- Detection annotations are padded to a FIXED `max_annotations` (the
  reference pads to the per-batch max, which would trigger an XLA recompile
  per unique count).
- `num_workers > 0` spawns a persistent pool of forked worker processes
  (equivalent of `DataLoader(num_workers=...)`, train.py:67-84), each doing
  the full per-sample pipeline (imread + augment + lane encode) AND the
  batch collation, so the parent process only moves ready batches.
- Augmentation randomness is derived per (seed, epoch, dataset index) via
  `np.random.SeedSequence`, NOT per worker — batches are bit-identical for
  any worker count, which torch's base_seed+worker_id scheme cannot give.
- Large arrays cross the process boundary through POSIX shared memory
  (one memcpy each side) instead of being pickled through a pipe; at
  640x640x3 float32 a bs32 batch is ~157 MB, far too big for pipe IPC.

Batches are NHWC numpy arrays ready for device put.
"""

from __future__ import annotations

import atexit
import multiprocessing as mp
import os
import queue
import threading
import traceback
import weakref
from multiprocessing import shared_memory
from typing import Dict, Iterator, List, Optional

import cv2
import numpy as np

from hydranet_tpu.config import Config
from hydranet_tpu.data.dataset import MultitaskDataset

# Arrays at least this big ride shared memory instead of the result pipe.
_SHM_THRESHOLD_BYTES = 1 << 20


class Collater:
    def __init__(self, target_width: int, target_height: int,
                 is_lane=True, is_det=True, is_seg=True,
                 max_annotations: int = 64):
        self.target_width = target_width
        self.target_height = target_height
        self.is_lane = is_lane
        self.is_det = is_det
        self.is_seg = is_seg
        self.max_annotations = max_annotations

    def __call__(self, batch: List[Dict]) -> Dict:
        out: Dict = {}
        out["image"] = np.stack([b["image"] for b in batch])
        out["src_image_shape"] = [b["src_image_shape"] for b in batch]
        out["src_image_path"] = [b["src_image_path"] for b in batch]

        if self.is_lane:
            out["gt_loc"] = np.stack([b["gt_loc"] for b in batch])
            out["gt_cls"] = np.stack([b["gt_cls"] for b in batch])
            out["annot_lane"] = [b["annot_lane"] for b in batch]
            out["annot_lane_path"] = [b["annot_lane_path"] for b in batch]

        if self.is_seg:
            # nearest-neighbour resize of the label mask to net input size
            # (the reference passes INTER_NEAREST positionally as `dst`,
            # dataloader.py:578 — an upstream bug; we pass it correctly).
            out["gt_seg"] = np.stack([
                b["gt_seg"]
                if b["gt_seg"].shape == (self.target_height, self.target_width)
                else cv2.resize(b["gt_seg"],
                                (self.target_width, self.target_height),
                                interpolation=cv2.INTER_NEAREST)
                for b in batch])

        if self.is_det:
            m = self.max_annotations
            ann = -np.ones((len(batch), m, 5), dtype=np.float32)
            for i, b in enumerate(batch):
                a = np.asarray(b["gt_det"], dtype=np.float32).reshape(-1, 5)
                shape = b["src_image_shape"]
                sx = self.target_width / float(shape["width"])
                sy = self.target_height / float(shape["height"])
                a = a.copy()
                a[:, :4] *= np.array([sx, sy, sx, sy], dtype=np.float32)
                n = min(len(a), m)
                ann[i, :n] = a[:n]
            out["gt_det"] = ann
        return out


def _sample_rng(seed: int, epoch: int, ds_idx: int) -> np.random.RandomState:
    """Deterministic per-sample RNG, independent of worker assignment."""
    ss = np.random.SeedSequence([int(seed), int(epoch), int(ds_idx)])
    return np.random.RandomState(ss.generate_state(1)[0])


# ---------------------------------------------------------------------------
# Shared-memory transport: worker encodes big ndarrays into shm segments,
# parent decodes them zero-copy and unlinks; a finalizer closes the mapping
# when the batch array is garbage-collected.
# ---------------------------------------------------------------------------

def _shm_encode(batch: Dict) -> Dict:
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.nbytes >= _SHM_THRESHOLD_BYTES:
            shm = shared_memory.SharedMemory(create=True, size=v.nbytes)
            dst = np.ndarray(v.shape, dtype=v.dtype, buffer=shm.buf)
            np.copyto(dst, v)
            name = shm.name
            # The worker hands ownership to the parent: drop this process's
            # mapping and tell its resource tracker to forget the segment so
            # it is not unlinked again when the worker exits.
            shm.close()
            try:
                from multiprocessing import resource_tracker
                resource_tracker.unregister("/" + name.lstrip("/"),
                                            "shared_memory")
            except Exception:
                pass
            out[k] = ("__shm__", name, v.shape, str(v.dtype))
        else:
            out[k] = v
    return out


def _shm_decode(batch: Dict) -> Dict:
    out = {}
    for k, v in batch.items():
        if isinstance(v, tuple) and len(v) == 4 and v[0] == "__shm__":
            _, name, shape, dtype = v
            shm = shared_memory.SharedMemory(name=name)
            arr = np.ndarray(shape, dtype=np.dtype(dtype), buffer=shm.buf)
            # Unlink now (POSIX keeps the pages alive while mapped); close
            # the mapping when the array dies.
            try:
                shm.unlink()
            except FileNotFoundError:
                pass
            weakref.finalize(arr, shm.close)
            out[k] = arr
        else:
            out[k] = v
    return out


def _worker_loop(dataset: MultitaskDataset, collate: Collater, seed: int,
                 task_q, result_q) -> None:
    # Workers each run the cv2 pipeline single-threaded; parallelism comes
    # from the pool itself (same as torch's worker init).
    cv2.setNumThreads(0)
    while True:
        task = task_q.get()
        if task is None:
            return
        batch_id, epoch, chunk = task
        try:
            samples = [dataset.get(i, _sample_rng(seed, epoch, i))
                       for i in chunk]
            payload = _shm_encode(collate(samples))
            result_q.put((batch_id, payload, None))
        except BaseException:
            result_q.put((batch_id, None, traceback.format_exc()))


class DataLoader:
    """Shuffling, batching loader with a multi-process worker pool.

    num_workers = 0 → samples are produced inline (optionally prefetched on
    one background thread, `num_prefetch`); num_workers > 0 → a persistent
    pool of forked processes builds whole collated batches, `prefetch_factor`
    batches in flight per worker. Either path yields identical batches for a
    fixed seed.
    """

    def __init__(self, dataset: MultitaskDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 max_annotations: int = 64, num_workers: int = 0,
                 prefetch_factor: int = 2, num_prefetch: int = 2,
                 seed: int = 0, shard_rank: int = 0, shard_count: int = 1):
        """shard_rank/shard_count: multi-host data parallelism — each host
        iterates a disjoint 1/shard_count slice of every (epoch-shuffled)
        index permutation, same role as torch's DistributedSampler (which
        the reference never wires up — its DDP is world_size=1 with a plain
        shuffling DataLoader, train.py:67-74,129-137). All hosts must use
        the same seed so the per-epoch permutation agrees."""
        if not (0 <= shard_rank < shard_count):
            raise ValueError(f"shard_rank {shard_rank} not in "
                             f"[0, {shard_count})")
        self.shard_rank = shard_rank
        self.shard_count = shard_count
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, int(num_workers))
        self.prefetch_factor = max(1, int(prefetch_factor))
        self.num_prefetch = num_prefetch
        self.seed = seed
        self.epoch = 0
        self.collate = Collater(
            target_width=dataset.input_w, target_height=dataset.input_h,
            is_lane=dataset.train_lane, is_det=dataset.train_detect,
            is_seg=dataset.train_seg, max_annotations=max_annotations)
        self._pool: Optional[List] = None
        self._task_q = None
        self._result_q = None
        if self.num_workers > 0:
            # Fork eagerly, before the caller initialises heavy device state.
            self._start_pool()

    # -- worker pool ------------------------------------------------------

    def _start_pool(self) -> None:
        ctx = mp.get_context("fork")
        self._task_q = ctx.SimpleQueue()
        self._result_q = ctx.SimpleQueue()
        self._pool = []
        for _ in range(self.num_workers):
            p = ctx.Process(
                target=_worker_loop,
                args=(self.dataset, self.collate, self.seed,
                      self._task_q, self._result_q),
                daemon=True)
            p.start()
            self._pool.append(p)
        atexit.register(DataLoader._shutdown_weak, weakref.ref(self))

    @staticmethod
    def _shutdown_weak(ref) -> None:
        self = ref()
        if self is not None:
            self.shutdown()

    def shutdown(self) -> None:
        """Stop the worker pool (idempotent)."""
        if not self._pool:
            return
        for _ in self._pool:
            try:
                self._task_q.put(None)
            except Exception:
                pass
        for p in self._pool:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._pool = None

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass

    # -- iteration --------------------------------------------------------

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.shard_count > 1:
            # ceil-split: ranks 0..n%count-1 get one extra sample
            n = (n - self.shard_rank + self.shard_count - 1) // self.shard_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self, epoch: int) -> Iterator[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # Epoch-keyed shuffle: reproducible regardless of worker count.
            np.random.RandomState(
                np.random.SeedSequence([self.seed, epoch]).generate_state(1)[0]
            ).shuffle(idx)
        if self.shard_count > 1:
            # strided split of the SHARED permutation -> disjoint shards
            idx = idx[self.shard_rank::self.shard_count]
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield [int(j) for j in chunk]

    def __iter__(self) -> Iterator[Dict]:
        epoch = self.epoch
        self.epoch += 1
        if self.num_workers > 0:
            yield from self._iter_pool(epoch)
        elif self.num_prefetch > 0:
            yield from self._iter_thread(epoch)
        else:
            for chunk in self._batches(epoch):
                samples = [self.dataset.get(i, _sample_rng(self.seed, epoch, i))
                           for i in chunk]
                yield self.collate(samples)

    def _iter_thread(self, epoch: int) -> Iterator[Dict]:
        q: queue.Queue = queue.Queue(maxsize=self.num_prefetch)
        sentinel = object()

        def worker():
            try:
                for chunk in self._batches(epoch):
                    samples = [
                        self.dataset.get(i, _sample_rng(self.seed, epoch, i))
                        for i in chunk]
                    q.put(self.collate(samples))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def _iter_pool(self, epoch: int) -> Iterator[Dict]:
        if not self._pool:
            self._start_pool()
        batches = self._batches(epoch)
        in_flight = 0
        next_submit = 0
        next_yield = 0
        done_submitting = False
        stash: Dict[int, Dict] = {}
        max_in_flight = self.num_workers * self.prefetch_factor

        def submit_up_to_limit():
            nonlocal in_flight, next_submit, done_submitting
            while not done_submitting and in_flight < max_in_flight:
                chunk = next(batches, None)
                if chunk is None:
                    done_submitting = True
                    return
                self._task_q.put((next_submit, epoch, chunk))
                next_submit += 1
                in_flight += 1

        submit_up_to_limit()
        try:
            while in_flight > 0 or next_yield in stash:
                while next_yield in stash:
                    payload = stash.pop(next_yield)
                    next_yield += 1
                    yield payload
                if in_flight == 0:
                    break
                batch_id, payload, err = self._result_q.get()
                in_flight -= 1
                if err is not None:
                    self.shutdown()
                    raise RuntimeError(f"DataLoader worker failed:\n{err}")
                stash[batch_id] = _shm_decode(payload)
                submit_up_to_limit()
        finally:
            # If the consumer abandons the iterator mid-epoch, drain the
            # in-flight results so the next epoch doesn't receive this
            # epoch's leftovers (batch ids restart at 0 per epoch). Decode
            # them so their shared-memory segments are reclaimed.
            while in_flight > 0:
                _, payload, err = self._result_q.get()
                in_flight -= 1
                if err is None:
                    _shm_decode(payload)
