"""COCO-style bbox mAP evaluation, self-contained (equivalent capability to
the reference's pycocotools usage — /root/reference/model/head_detect/
detect_eval.py:3-14 and gen_val_json.py — pycocotools is not available in
this image).

Implements the COCOeval bbox protocol: 101-point interpolated precision
averaged over IoU thresholds .50:.05:.95, area ranges (all/small/medium/large)
and maxDets (1/10/100), greedy per-image matching in descending score order
with the highest-IoU available GT.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def box_iou_xywh(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """IoU between [N, 4] and [M, 4] xywh boxes (COCO convention)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    iw = np.minimum(dx2[:, None], gx2[None, :]) - np.maximum(dx1[:, None], gx1[None, :])
    ih = np.minimum(dy2[:, None], gy2[None, :]) - np.maximum(dy1[:, None], gy1[None, :])
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    area_d = dt[:, 2] * dt[:, 3]
    area_g = gt[:, 2] * gt[:, 3]
    union = area_d[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


class COCOMeanAP:
    """Accumulate {image_id, category_id, bbox xywh, score} detections against
    GT of the same schema and summarize AP/AR like COCOeval."""

    def __init__(self, gt_annotations: Sequence[Dict],
                 categories: Sequence[int],
                 image_ids: Optional[Sequence[int]] = None):
        self.categories = list(categories)
        self.gts = defaultdict(list)
        img_ids = set(image_ids) if image_ids is not None else None
        self._image_ids = set()
        for ann in gt_annotations:
            if img_ids is not None and ann["image_id"] not in img_ids:
                continue
            self.gts[(ann["image_id"], ann["category_id"])].append(ann)
            self._image_ids.add(ann["image_id"])
        if image_ids is not None:
            self._image_ids = set(image_ids)
        self.reset()

    def reset(self):
        self.dts = defaultdict(list)

    def update(self, detections: Sequence[Dict]):
        for d in detections:
            if d["image_id"] in self._image_ids:
                self.dts[(d["image_id"], d["category_id"])].append(d)

    def _evaluate_img(self, img_id: int, cat: int, max_dets: int,
                      area_rng: Tuple[float, float]):
        gts = self.gts.get((img_id, cat), [])
        dts = sorted(self.dts.get((img_id, cat), []),
                     key=lambda d: -d["score"])[:max_dets]
        if not gts and not dts:
            return None
        gt_boxes = np.array([g["bbox"] for g in gts]).reshape(-1, 4)
        gt_area = gt_boxes[:, 2] * gt_boxes[:, 3] if len(gts) else np.zeros(0)
        gt_ignore = ~((gt_area >= area_rng[0]) & (gt_area < area_rng[1]))
        # sort gts: unignored first (COCOeval convention)
        gorder = np.argsort(gt_ignore, kind="stable")
        gt_boxes = gt_boxes[gorder]
        gt_ignore = gt_ignore[gorder]

        dt_boxes = np.array([d["bbox"] for d in dts]).reshape(-1, 4)
        dt_scores = np.array([d["score"] for d in dts])
        iou = box_iou_xywh(dt_boxes, gt_boxes)

        t = len(IOU_THRS)
        dt_m = -np.ones((t, len(dts)), dtype=np.int64)
        gt_m = -np.ones((t, len(gts)), dtype=np.int64)
        for ti, thr in enumerate(IOU_THRS):
            for di in range(len(dts)):
                best, best_iou = -1, min(thr, 1 - 1e-10)
                for gi in range(len(gts)):
                    if gt_m[ti, gi] >= 0:
                        continue
                    # prefer any unignored match; once we're onto ignored gts
                    # and already have a match, stop (COCOeval logic)
                    if best > -1 and not gt_ignore[best] and gt_ignore[gi]:
                        break
                    if iou[di, gi] < best_iou:
                        continue
                    best_iou = iou[di, gi]
                    best = gi
                if best >= 0:
                    dt_m[ti, di] = best
                    gt_m[ti, best] = di

        dt_area = dt_boxes[:, 2] * dt_boxes[:, 3] if len(dts) else np.zeros(0)
        dt_out_of_range = ~((dt_area >= area_rng[0]) & (dt_area < area_rng[1]))
        # unmatched out-of-range detections are ignored; matched-to-ignored too
        dt_ignore = np.zeros((t, len(dts)), bool)
        for ti in range(t):
            matched = dt_m[ti] >= 0
            ign_gt = np.zeros(len(dts), bool)
            ign_gt[matched] = gt_ignore[dt_m[ti][matched]]
            dt_ignore[ti] = ign_gt | (~matched & dt_out_of_range)
        return dict(scores=dt_scores, matched=dt_m >= 0, dt_ignore=dt_ignore,
                    num_gt=int(np.sum(~gt_ignore)))

    def _accumulate(self, max_dets: int, area: str) -> np.ndarray:
        """Per-(iou_thr, category) AP matrix; -1 where no GT exists."""
        area_rng = AREA_RANGES[area]
        t = len(IOU_THRS)
        ap = -np.ones((t, len(self.categories)))
        for ci, cat in enumerate(self.categories):
            evals = [self._evaluate_img(i, cat, max_dets, area_rng)
                     for i in sorted(self._image_ids)]
            evals = [e for e in evals if e is not None]
            if not evals:
                continue
            num_gt = sum(e["num_gt"] for e in evals)
            if num_gt == 0:
                continue
            scores = np.concatenate([e["scores"] for e in evals])
            order = np.argsort(-scores, kind="mergesort")
            matched = np.concatenate([e["matched"] for e in evals], axis=1)[:, order]
            ignored = np.concatenate([e["dt_ignore"] for e in evals], axis=1)[:, order]
            for ti in range(t):
                keep = ~ignored[ti]
                tps = np.cumsum(matched[ti] & keep)[keep]
                fps = np.cumsum(~matched[ti] & keep)[keep]
                if len(tps) == 0:
                    ap[ti, ci] = 0.0
                    continue
                rc = tps / num_gt
                pr = tps / np.maximum(tps + fps, 1e-12)
                # make precision monotonically decreasing
                for k in range(len(pr) - 1, 0, -1):
                    pr[k - 1] = max(pr[k - 1], pr[k])
                inds = np.searchsorted(rc, RECALL_THRS, side="left")
                q = np.zeros(len(RECALL_THRS))
                valid = inds < len(pr)
                q[valid] = pr[inds[valid]]
                ap[ti, ci] = q.mean()
        return ap

    def summarize(self, verbose: bool = True) -> Dict[str, float]:
        """COCOeval-style summary — the 6 AP rows of summarize()."""
        def mean_ap(ap):
            valid = ap > -1
            return float(ap[valid].mean()) if valid.any() else -1.0

        ap_all = self._accumulate(100, "all")
        results = {
            "AP": mean_ap(ap_all),
            "AP50": mean_ap(ap_all[0:1]),
            "AP75": mean_ap(ap_all[5:6]),
            "AP_small": mean_ap(self._accumulate(100, "small")),
            "AP_medium": mean_ap(self._accumulate(100, "medium")),
            "AP_large": mean_ap(self._accumulate(100, "large")),
        }
        if verbose:
            for k, v in results.items():
                print(f" Average Precision ({k}) = {v:.3f}")
        return results


def gen_coco_gt(root_dir: str, list_name: str = "valid.txt",
                class_names: Optional[Sequence[str]] = None
                ) -> Tuple[List[Dict], List[int], Dict[int, str]]:
    """Build COCO-format GT annotations from labels_object/*.txt files —
    equivalent of reference gen_val_json.py:31-109 without the json
    side-file. Returns (annotations, image_ids, id->path)."""
    import cv2

    list_txt = os.path.join(root_dir, "list", list_name)
    with open(list_txt) as f:
        img_list = [line.strip() for line in f]
    annotations: List[Dict] = []
    image_ids: List[int] = []
    id_to_path: Dict[int, str] = {}
    cnt = 0
    annoid = 0
    for img_path in img_list:
        txt = img_path.replace("images", "labels_object").replace(".jpg", ".txt")
        with open(txt) as f:
            lines = [l for l in f.readlines() if l.strip()]
        if not lines:
            continue
        cnt += 1
        image_ids.append(cnt)
        id_to_path[cnt] = img_path
        for line in lines:
            parts = line.strip("\n").split(",")
            x1, y1, x2, y2 = (float(parts[0]), float(parts[1]),
                              float(parts[2]), float(parts[3]))
            category = int(parts[4])
            annoid += 1
            annotations.append(dict(
                image_id=cnt, category_id=category,
                bbox=[x1, y1, max(0, int(x2 - x1)), max(0, int(y2 - y1))],
                id=annoid, iscrowd=0))
    return annotations, image_ids, id_to_path


def write_coco_gt_json(root_dir: str, list_name: str = "valid.txt",
                       class_names: Optional[Sequence[str]] = None,
                       out_path: Optional[str] = None) -> str:
    """Persist the COCO-format GT as a json side-file for drop-in tooling
    parity with reference gen_val_json.py:31-109 (which writes
    eval_detect/gt_bbox_results.json). Images with no annotations are
    skipped and image sizes are read from the files, as in the reference.
    Returns the json path (existing file is reused, reference behavior)."""
    import json

    import cv2

    if out_path is None:
        out_dir = os.path.join(root_dir, "eval_detect")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, "gt_bbox_results.json")
    if os.path.exists(out_path):
        return out_path

    annotations, image_ids, id_to_path = gen_coco_gt(root_dir, list_name,
                                                     class_names)
    images = []
    for img_id in image_ids:
        im = cv2.imread(id_to_path[img_id])
        h, w = (im.shape[:2] if im is not None else (0, 0))
        images.append(dict(license=5, file_name=id_to_path[img_id],
                           coco_url="local", height=h, width=w, id=img_id))
    names = list(class_names) if class_names else []
    categories = [dict(supercategory="object", id=i + 1, name=n)
                  for i, n in enumerate(names)]
    for ann in annotations:
        ann = dict(ann)
        ann.setdefault("segmentation", [])
        ann.setdefault("area", ann["bbox"][2] * ann["bbox"][3])
    dataset = dict(
        info=dict(description="hydranet_tpu detection GT",
                  version="1.0", contributor="hydranet_tpu"),
        images=images,
        annotations=[dict(segmentation=[], iscrowd=a["iscrowd"],
                          area=a["bbox"][2] * a["bbox"][3],
                          image_id=a["image_id"], bbox=a["bbox"],
                          category_id=a["category_id"], id=a["id"])
                     for a in annotations],
        categories=categories)
    with open(out_path, "w") as f:
        json.dump(dataset, f)
    return out_path
