"""Lane F1 metric (TPU-native equivalent of
/root/reference/model/head_lane/lane_metric.py).

Rasterize GT & predicted lanes (spline-interp, configurable pixel width) ->
bitwise IoU -> Hungarian matching -> hit count -> P/R/F1 over probability
thresholds. Host-side by design, as in the reference (it runs per validation
epoch over decoded lanes, not in the hot path).
"""

from __future__ import annotations

import sys
from itertools import product
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np
from scipy.optimize import linear_sum_assignment

from hydranet_tpu.heads.lane_geometry import natural_cubic_interp


def _rasterize(lane: Sequence[Dict], shape, lane_width: int) -> np.ndarray:
    im = np.zeros(shape, np.uint8)
    xs = [float(p["x"]) for p in lane]
    ys = [float(p["y"]) for p in lane]
    pts = natural_cubic_interp(xs, ys, step_t=1.0)
    for i in range(len(pts) - 1):
        cv2.line(im, (int(pts[i][0]), int(pts[i][1])),
                 (int(pts[i + 1][0]), int(pts[i + 1][1])), 255, lane_width)
    return im


def lane_iou(lane1, lane2, height: int, width: int, lane_width: int) -> float:
    """Bitwise IoU of two rasterized lanes — lane_metric.py:166-196."""
    im1 = _rasterize(lane1, (height, width), lane_width)
    im2 = _rasterize(lane2, (height, width), lane_width)
    union = cv2.bitwise_or(im1, im2).sum()
    if union == 0:
        return 0.0
    inter = int(im1.sum()) + int(im2.sum()) - int(union)
    return inter / float(union)


def evaluate_image(gt_lanes: List, pr_lanes: List, height: int, width: int,
                   iou_thresh: float, lane_width: int) -> Dict[str, int]:
    """Per-image matching — lane_metric.py:202-265."""
    gt_num, pr_num, hit_num = len(gt_lanes), len(pr_lanes), 0
    if gt_num > 0 and pr_num > 0:
        iou_mat = np.zeros((gt_num, pr_num))
        for (gi, gt), (pi, pr) in product(enumerate(gt_lanes),
                                          enumerate(pr_lanes)):
            iou_mat[gi][pi] = lane_iou(gt, pr, height, width, lane_width)
        rows, cols = linear_sum_assignment(1.0 - iou_mat)
        for gi, pi in zip(rows, cols):
            if iou_mat[gi][pi] > iou_thresh:
                hit_num += 1
    return dict(gt_num=gt_num, pr_num=pr_num, hit_num=hit_num)


class LaneMetricCore:
    """Accumulates per-image results for one probability threshold —
    lane_metric.py:310-386."""

    def __init__(self, iou_thresh: float, lane_width: int,
                 prob_thresh: Optional[float] = None):
        self.iou_thresh = iou_thresh
        self.lane_width = lane_width
        self.prob_thresh = prob_thresh
        self.reset()

    def reset(self):
        self.result_record: List[Dict[str, int]] = []

    def __call__(self, gt_result: Dict, pr_result: Dict):
        gt_wh = gt_result["Shape"]
        gt_lanes = [l for l in gt_result["Lines"] if len(l) > 0]
        pr_lanes = []
        for line in pr_result["Lines"]:
            if isinstance(line, dict) and "score" in line:
                if self.prob_thresh is None or line["score"] > self.prob_thresh:
                    line = line["points"]
                else:
                    line = []
            if len(line) > 0:
                pr_lanes.append(line)
        self.result_record.append(evaluate_image(
            gt_lanes, pr_lanes, gt_wh["height"], gt_wh["width"],
            self.iou_thresh, self.lane_width))

    def summary(self) -> Dict[str, float]:
        hit = sum(r["hit_num"] for r in self.result_record)
        pr = sum(r["pr_num"] for r in self.result_record)
        gt = sum(r["gt_num"] for r in self.result_record)
        eps = sys.float_info.epsilon
        precision = hit / (pr + eps)
        recall = hit / (gt + eps)
        f1 = 2 * precision * recall / (precision + recall + eps)
        return dict(f1_measure=f1, precision=precision, recall=recall)


class LaneMetric:
    """Max of the chosen method over a threshold list —
    lane_metric.py:389-437."""

    def __init__(self, method: str = "f1_measure", iou_thresh: float = 0.5,
                 lane_width: int = 30,
                 thresh_list: Optional[Sequence[float]] = None):
        if method not in ("f1_measure", "precision", "recall"):
            raise NotImplementedError(method)
        self.method = method
        threshes = list(thresh_list) if thresh_list is not None else [None]
        self.metric_handlers = [
            LaneMetricCore(iou_thresh=iou_thresh, lane_width=lane_width,
                           prob_thresh=t) for t in threshes]

    def __call__(self, output: List[Dict]):
        for handler in self.metric_handlers:
            for pair in output:
                handler(gt_result=pair["gt_result"],
                        pr_result=pair["pr_result"])

    def reset(self):
        for handler in self.metric_handlers:
            handler.reset()

    def summary(self) -> float:
        return max(h.summary()[self.method] for h in self.metric_handlers)
