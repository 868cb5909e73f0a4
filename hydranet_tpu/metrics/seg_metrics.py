"""Streaming segmentation IoU (TPU-native equivalent of
/root/reference/model/head_seg/seg_metrics.py).

The reference accumulates per-class TP/FP/FN via scatter_add_ on CPU per
image (seg_metrics.py:12-44, train.py:301-306); here the per-batch counts are
computed on device (one jitted bincount-style segment-sum) and only the
[n_classes] count vectors stream back.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(2,))
def _stat_scores(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int):
    """Per-class (tp, fp, fn, support) with the reference's clamp-to-
    num_classes overflow bucket (seg_metrics.py:17-44)."""
    pred = jnp.clip(pred.reshape(-1).astype(jnp.int32), None, num_classes)
    target = jnp.clip(target.reshape(-1).astype(jnp.int32), None, num_classes)
    match = (pred == target)
    nbins = num_classes + 1
    tp = jnp.zeros(nbins).at[pred].add(match.astype(jnp.float32))
    fp = jnp.zeros(nbins).at[pred].add((~match).astype(jnp.float32))
    fn = jnp.zeros(nbins).at[target].add((~match).astype(jnp.float32))
    sup = jnp.zeros(nbins).at[target].add(1.0)
    return tp[:num_classes], fp[:num_classes], fn[:num_classes], sup[:num_classes]


class IntersectionOverUnion:
    """Streaming per-class IoU — seg_metrics.py:49-101."""

    def __init__(self, n_classes: int, ignore_index: Optional[int] = None,
                 absent_score: float = 0.0):
        self.n_classes = n_classes
        self.ignore_index = ignore_index
        self.absent_score = absent_score
        self.reset()

    def reset(self):
        self.tp = np.zeros(self.n_classes)
        self.fp = np.zeros(self.n_classes)
        self.fn = np.zeros(self.n_classes)
        self.sup = np.zeros(self.n_classes)

    def update(self, prediction, target):
        tp, fp, fn, sup = _stat_scores(jnp.asarray(prediction),
                                       jnp.asarray(target), self.n_classes)
        self.tp += np.asarray(tp)
        self.fp += np.asarray(fp)
        self.fn += np.asarray(fn)
        self.sup += np.asarray(sup)

    def compute(self) -> np.ndarray:
        scores = np.zeros(self.n_classes, dtype=np.float32)
        for c in range(self.n_classes):
            if c == self.ignore_index:
                continue
            if self.sup[c] + self.tp[c] + self.fp[c] == 0:
                scores[c] = self.absent_score
                continue
            denom = self.tp[c] + self.fp[c] + self.fn[c]
            scores[c] = self.tp[c] / denom
        if self.ignore_index is not None and 0 <= self.ignore_index < self.n_classes:
            scores = np.concatenate([scores[:self.ignore_index],
                                     scores[self.ignore_index + 1:]])
        return scores
