"""Anchor coverage of a dataset's detection GT (learnability probe).

For every GT box (scaled to the network input size, as the loader does),
computes the max IoU against the full anchor set and reports the fraction
assignable as focal-loss positives (IoU >= 0.5, detection_loss.py). If
coverage is low, mAP is capped by anchor geometry (anchor_scale / ratios /
scales in the config), not by training.

On artifacts/procedural_data valid (2026-08-17): 121 boxes, 100% >= 0.5,
median max-IoU 0.677 — the det-AP ceiling is open; low AP means
undertraining, not anchor mismatch.

Usage: python scripts/det_anchor_coverage.py [--data DIR] [--split valid]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from hydranet_tpu.config import load_config  # noqa: E402
from hydranet_tpu.data.dataset import MultitaskDataset  # noqa: E402
from hydranet_tpu.heads.detection import generate_anchors  # noqa: E402


def max_iou_per_box(anchors: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """anchors [A,4] (y1,x1,y2,x2) vs boxes [M,4] (x1,y1,x2,y2) -> [M]."""
    ay1, ax1, ay2, ax2 = anchors.T
    out = np.zeros(len(boxes))
    for m, (bx1, by1, bx2, by2) in enumerate(boxes):
        ix1 = np.maximum(ax1, bx1)
        iy1 = np.maximum(ay1, by1)
        ix2 = np.minimum(ax2, bx2)
        iy2 = np.minimum(ay2, by2)
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        union = ((ax2 - ax1) * (ay2 - ay1)
                 + (bx2 - bx1) * (by2 - by1) - inter)
        out[m] = (inter / np.maximum(union, 1e-8)).max()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="artifacts/procedural_data")
    ap.add_argument("--split", default="valid")
    ap.add_argument("--config",
                    default="configs/hydranet_convergence_procedural.yml")
    args = ap.parse_args()

    cfg = load_config(os.path.join(REPO, args.config))
    h, w = cfg.input_hw
    anchors = generate_anchors(
        (h, w), cfg.detection.anchor_scale,
        [lvl + 3 for lvl in range(cfg.detection.pyramid_levels)],
        cfg.detection.scales, cfg.detection.aspect_ratios)

    best, sizes = [], []
    for name in (ln.strip() for ln in
                 open(os.path.join(args.data, "list",
                                   f"{args.split}.txt"))):
        stem = os.path.splitext(os.path.basename(name))[0]
        label = os.path.join(args.data, "labels_object", stem + ".txt")
        if not os.path.exists(label):
            continue
        rows = MultitaskDataset.load_detect_annot(label)
        if rows.size == 0:
            continue
        oh, ow = cv2.imread(name).shape[:2]
        boxes = rows[:, :4].astype(np.float64) * [w / ow, h / oh,
                                                  w / ow, h / oh]
        best.extend(max_iou_per_box(anchors, boxes))
        sizes.extend(np.sqrt((boxes[:, 2] - boxes[:, 0])
                             * (boxes[:, 3] - boxes[:, 1])))
    best, sizes = np.asarray(best), np.asarray(sizes)
    print(f"{args.split}: {len(best)} GT boxes | positives (maxIoU>=0.5): "
          f"{(best >= 0.5).mean():.3f} | >=0.4: {(best >= 0.4).mean():.3f} "
          f"| median maxIoU: {np.median(best):.3f}")
    for lo, hi in [(0, 16), (16, 32), (32, 64), (64, 128), (128, 10**9)]:
        sel = (sizes >= lo) & (sizes < hi)
        if sel.any():
            print(f"  size[{lo:>3d},{hi:>4d}): n={int(sel.sum()):4d}  "
                  f"cover>=0.5: {(best[sel] >= 0.5).mean():.3f}  "
                  f"median: {np.median(best[sel]):.3f}")


if __name__ == "__main__":
    main()
