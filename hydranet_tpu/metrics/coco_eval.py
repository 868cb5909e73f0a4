"""COCO-style bbox mAP/mAR evaluation, self-contained (equivalent capability
to the reference's pycocotools usage — /root/reference/model/head_detect/
detect_eval.py:3-14 and gen_val_json.py — pycocotools is not available in
this image).

Implements the COCOeval bbox protocol: greedy per-image matching in
descending score order against the highest-IoU available GT (later GT wins
exact ties, ignored GT only when no unignored GT matches), 101-point
interpolated precision averaged over IoU thresholds .50:.05:.95, area ranges
(all/small/medium/large) and maxDets (1/10/100), and the full 12-row
summarize() (6 AP + 6 AR). Matching runs once per (image, category, area)
at the largest maxDets and is truncated for the smaller ones, exactly like
pycocotools' evaluateImg/accumulate split. The matcher's GT inner loop and
the accumulation are vectorized (pycocotools does this part in C).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
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


def _greedy_match(iou: np.ndarray, gt_ignore: np.ndarray,
                  thrs: np.ndarray) -> np.ndarray:
    """COCOeval's greedy matcher for all IoU thresholds at once.

    `iou` is [D, G] with detections already in descending-score order.
    `gt_ignore` is [G] (one ignore set) or [R, G] (R independent ignore
    sets, e.g. the four area ranges, matched in one pass — the per-
    detection loop is the Python hot spot, so all R x T rows advance
    together). Returns dt_match [T, D] / [R, T, D] of matched gt indices
    (-1 unmatched). Semantics (pycocotools cocoeval.py evaluateImg): each
    detection takes the available gt with the highest IoU >= thr; among
    equal IoUs the LATER gt wins; an ignored gt is only taken when no
    unignored gt matched; a match to an unignored gt is final even if an
    ignored gt has higher IoU.

    pycocotools iterates gts sorted unignored-first; indices here stay in
    the caller's order, which is equivalent: the candidate class (prefer
    unignored) is selected explicitly, candidates are therefore always a
    single class per row, and a stable unignored-first sort preserves
    relative order within each class — so last-tie-wins picks the same gt
    either way (verified bit-exact vs the oracle in tests/test_metrics.py,
    which sorts like pycocotools).
    """
    gi = gt_ignore[None] if gt_ignore.ndim == 1 else gt_ignore   # [R, G]
    r = gi.shape[0]
    t = len(thrs)
    d, g = iou.shape
    dt_m = -np.ones((r, t, d), dtype=np.int64)
    if g == 0:
        return dt_m[0] if gt_ignore.ndim == 1 else dt_m
    n = r * t
    flat = dt_m.reshape(n, d)
    gt_avail = np.ones((n, g), dtype=bool)
    # effective threshold per row (r-major grouping): min(thr, 1-1e-10)
    thr_eff = np.tile(np.minimum(thrs, 1 - 1e-10), r)[:, None]   # [n, 1]
    unignored = np.repeat(~gi, t, axis=0)                        # [n, G]
    # tie-break helper: argmax picks the FIRST max; COCOeval's loop keeps
    # the LAST tied gt, so argmax over the reversed gt axis.
    rev = slice(None, None, -1)
    rows = np.arange(n)
    for di in range(d):
        row = iou[di][None, :]                               # [1, G]
        ok = gt_avail & (row >= thr_eff)                     # [n, G]
        ok_un = ok & unignored
        has_un = ok_un.any(axis=1)                           # [n]
        # candidate set: unignored where any, else ignored
        cand = np.where(has_un[:, None], ok_un, ok)          # [n, G]
        masked = np.where(cand, row, -1.0)                   # [n, G]
        best = g - 1 - np.argmax(masked[:, rev], axis=1)     # last tie wins
        hit = cand[rows, best]
        flat[:, di] = np.where(hit, best, -1)
        gt_avail[rows, best] &= ~hit
    return dt_m[0] if gt_ignore.ndim == 1 else dt_m


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
        self._eval_cache = {}

    def update(self, detections: Sequence[Dict]):
        self._eval_cache = {}
        for d in detections:
            if d["image_id"] in self._image_ids:
                self.dts[(d["image_id"], d["category_id"])].append(d)

    def _evaluate_img(self, img_id: int, cat: int) -> Optional[Dict]:
        """Match the top-maxDets(=100) detections at every IoU threshold for
        one (image, category) across ALL area ranges in one matcher pass —
        pycocotools evaluateImg with maxDet = p.maxDets[-1] (smaller maxDets
        truncate in _accumulate); the IoU matrix and the matcher's per-
        detection loop are shared across area ranges (pycocotools likewise
        computes self.ious once per (img, cat)). Returns {area: eval}."""
        gts = self.gts.get((img_id, cat), [])
        dts = sorted(self.dts.get((img_id, cat), []),
                     key=lambda d: -d["score"])[:MAX_DETS[-1]]
        if not gts and not dts:
            return None
        gt_boxes = np.array([g["bbox"] for g in gts]).reshape(-1, 4)
        gt_area = gt_boxes[:, 2] * gt_boxes[:, 3] if len(gts) else np.zeros(0)
        dt_boxes = np.array([d["bbox"] for d in dts]).reshape(-1, 4)
        dt_scores = np.array([d["score"] for d in dts])
        dt_area = dt_boxes[:, 2] * dt_boxes[:, 3] if len(dts) else np.zeros(0)
        iou = box_iou_xywh(dt_boxes, gt_boxes)

        areas = list(AREA_RANGES.items())
        # pycocotools convention: in-range is inclusive on BOTH ends
        gt_ig = np.stack([~((gt_area >= lo) & (gt_area <= hi))
                          for _, (lo, hi) in areas])          # [A, G]
        dt_m = _greedy_match(iou, gt_ig, IOU_THRS)            # [A, T, D]

        out = {}
        for ai, (name, (lo, hi)) in enumerate(areas):
            gt_ignore = gt_ig[ai]
            m = dt_m[ai]                                      # [T, D]
            matched = m >= 0
            if len(gts):
                ign_gt = np.where(matched, gt_ignore[np.clip(m, 0, None)],
                                  False)
            else:
                ign_gt = np.zeros_like(matched)
            dt_oor = ~((dt_area >= lo) & (dt_area <= hi))
            # unmatched out-of-range detections are ignored;
            # matched-to-ignored too
            dt_ignore = ign_gt | (~matched & dt_oor[None, :])
            out[name] = dict(scores=dt_scores, matched=matched,
                             dt_ignore=dt_ignore,
                             num_gt=int(np.sum(~gt_ignore)))
        return out

    def _img_evals(self, cat: int, area: str) -> List[Dict]:
        key = (cat, area)
        if key not in self._eval_cache:
            evals = [self._evaluate_img(i, cat)
                     for i in sorted(self._image_ids)]
            for name in AREA_RANGES:
                self._eval_cache[(cat, name)] = [
                    e[name] for e in evals if e is not None]
        return self._eval_cache[key]

    def _accumulate(self, max_dets: int, area: str
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-(iou_thr, category) AP and AR matrices; -1 where no GT."""
        t = len(IOU_THRS)
        ap = -np.ones((t, len(self.categories)))
        ar = -np.ones((t, len(self.categories)))
        for ci, cat in enumerate(self.categories):
            evals = self._img_evals(cat, area)
            if not evals:
                continue
            num_gt = sum(e["num_gt"] for e in evals)
            if num_gt == 0:
                continue
            scores = np.concatenate([e["scores"][:max_dets] for e in evals])
            order = np.argsort(-scores, kind="mergesort")
            matched = np.concatenate(
                [e["matched"][:, :max_dets] for e in evals], axis=1)[:, order]
            ignored = np.concatenate(
                [e["dt_ignore"][:, :max_dets] for e in evals], axis=1)[:, order]

            # vectorized over thresholds: cumulate tp/fp along the kept dets
            keep = ~ignored                                   # [T, N]
            tps = np.cumsum(matched & keep, axis=1)           # [T, N]
            fps = np.cumsum(~matched & keep, axis=1)
            for ti in range(t):
                tp = tps[ti][keep[ti]]
                fp = fps[ti][keep[ti]]
                if len(tp) == 0:
                    ap[ti, ci] = 0.0
                    ar[ti, ci] = 0.0
                    continue
                rc = tp / num_gt
                pr = tp / np.maximum(tp + fp, 1e-12)
                ar[ti, ci] = rc[-1]
                # make precision monotonically decreasing (reverse cummax)
                pr = np.maximum.accumulate(pr[::-1])[::-1]
                inds = np.searchsorted(rc, RECALL_THRS, side="left")
                q = np.zeros(len(RECALL_THRS))
                valid = inds < len(pr)
                q[valid] = pr[inds[valid]]
                ap[ti, ci] = q.mean()
        return ap, ar

    def summarize(self, verbose: bool = True) -> Dict[str, float]:
        """The full 12-row COCOeval summary: 6 AP + 6 AR."""
        def mean_of(m):
            valid = m > -1
            return float(m[valid].mean()) if valid.any() else -1.0

        ap_all, ar100 = self._accumulate(100, "all")
        ap_s, ar_s = self._accumulate(100, "small")
        ap_m, ar_m = self._accumulate(100, "medium")
        ap_l, ar_l = self._accumulate(100, "large")
        results = {
            "AP": mean_of(ap_all),
            "AP50": mean_of(ap_all[0:1]),
            "AP75": mean_of(ap_all[5:6]),
            "AP_small": mean_of(ap_s),
            "AP_medium": mean_of(ap_m),
            "AP_large": mean_of(ap_l),
            "AR1": mean_of(self._accumulate(1, "all")[1]),
            "AR10": mean_of(self._accumulate(10, "all")[1]),
            "AR100": mean_of(ar100),
            "AR_small": mean_of(ar_s),
            "AR_medium": mean_of(ar_m),
            "AR_large": mean_of(ar_l),
        }
        if verbose:
            for k, v in results.items():
                kind = ("Average Precision" if k.startswith("AP")
                        else "Average Recall")
                print(f" {kind} ({k}) = {v:.3f}")
        return results


def gen_coco_gt(root_dir: str, list_name: str = "valid.txt",
                class_names: Optional[Sequence[str]] = None
                ) -> Tuple[List[Dict], List[int], Dict[int, str]]:
    """Build COCO-format GT annotations from labels_object/*.txt files —
    equivalent of reference gen_val_json.py:31-109 without the json
    side-file. Returns (annotations, image_ids, id->path)."""
    list_txt = os.path.join(root_dir, "list", list_name)
    with open(list_txt) as f:
        img_list = [line.strip() for line in f if line.strip()]
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
