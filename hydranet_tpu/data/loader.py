"""Batch collation + a simple prefetching loader (TPU-native equivalent of
the reference Collater + torch DataLoader usage, dataloader.py:544-633 and
train.py:66-84).

Key TPU-first difference: detection annotations are padded to a FIXED
`max_annotations` (the reference pads to the per-batch max, which would
trigger an XLA recompile per unique count). Batches are NHWC numpy arrays
ready for device put.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import cv2
import numpy as np

from hydranet_tpu.config import Config
from hydranet_tpu.data.dataset import MultitaskDataset


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
                cv2.resize(b["gt_seg"], (self.target_width, self.target_height),
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


class DataLoader:
    """Shuffling, batching, optional background-thread prefetch."""

    def __init__(self, dataset: MultitaskDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 max_annotations: int = 64, num_prefetch: int = 2,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_prefetch = num_prefetch
        self.rng = np.random.RandomState(seed)
        self.collate = Collater(
            target_width=dataset.input_w, target_height=dataset.input_h,
            is_lane=dataset.train_lane, is_det=dataset.train_detect,
            is_seg=dataset.train_seg, max_annotations=max_annotations)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield list(chunk)

    def __iter__(self) -> Iterator[Dict]:
        if self.num_prefetch <= 0:
            for chunk in self._batches():
                yield self.collate([self.dataset[i] for i in chunk])
            return

        q: queue.Queue = queue.Queue(maxsize=self.num_prefetch)
        sentinel = object()

        def worker():
            try:
                for chunk in self._batches():
                    q.put(self.collate([self.dataset[i] for i in chunk]))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
