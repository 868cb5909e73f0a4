"""Augmentation debug fixture (equivalent of the reference's DEBUG draws,
/root/reference/model/dataset/dataloader.py:296, 336-337, 498-541): renders
image + det boxes + lane polylines + seg mask BEFORE and AFTER each forced
geometric transform (flip / rotate / shear / crop / split-crop) plus one full
random `augment_sample`, as side-by-side images.

Usage: python scripts/augment_debug.py [--out artifacts/aug_debug]
The committed outputs let a reviewer confirm all three label kinds transform
consistently with the pixels.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from hydranet_tpu.data.augment import (_affine_identity, _crop_keep_size,
                                       _fliplr, _rotate, _shear_x,
                                       _split_matrix, apply_geometry,
                                       augment_sample, cal_split)

SEG_COLORS = {1: (128, 0, 128), 2: (255, 255, 255)}


def make_scene(w=640, h=420, seed=0):
    """Synthetic road scene with seg road/marking, 2 lanes, 2 det boxes."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w, 3), 70, np.uint8)
    img += rng.randint(0, 30, (h, w, 3), np.uint8)  # texture
    seg = np.zeros((h, w), np.uint8)
    # road trapezoid (class 1)
    road = np.array([[w * 0.15, h - 1], [w * 0.85, h - 1],
                     [w * 0.60, h * 0.45], [w * 0.40, h * 0.45]], np.int32)
    cv2.fillPoly(seg, [road], 1)
    cv2.fillPoly(img, [road], (90, 90, 95))
    # two lane lines (left: x grows going up; right: x shrinks going up)
    lanes = {"Lines": [], "Labels": ["l", "r"]}
    for x0, x1 in [(w * 0.28, w * 0.45), (w * 0.72, w * 0.55)]:
        ys = np.linspace(h - 1, h * 0.48, 8)
        xs = np.linspace(x0, x1, 8)
        pts = [{"x": float(x), "y": float(y)} for x, y in zip(xs, ys)]
        lanes["Lines"].append(pts)
        for p0, p1 in zip(pts[:-1], pts[1:]):
            cv2.line(img, (int(p0["x"]), int(p0["y"])),
                     (int(p1["x"]), int(p1["y"])), (200, 200, 200), 4)
            cv2.line(seg, (int(p0["x"]), int(p0["y"])),
                     (int(p1["x"]), int(p1["y"])), 2, 6)
    # two "vehicles"
    det = np.array([[w * 0.42, h * 0.50, w * 0.52, h * 0.60, 0],
                    [w * 0.58, h * 0.62, w * 0.74, h * 0.80, 2]])
    for x1, y1, x2, y2, _ in det:
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                      (40, 60, 160), -1)
    return img, lanes, det, seg


def draw_labels(img, lanes, det, seg):
    vis = img.copy()
    if seg is not None:
        overlay = np.zeros_like(vis)
        for cid, color in SEG_COLORS.items():
            overlay[seg == cid] = color
        vis = cv2.addWeighted(vis, 0.75, overlay, 0.5, 0)
    if lanes is not None:
        for line in lanes["Lines"]:
            pts = [(int(p["x"]), int(p["y"])) for p in line]
            for p0, p1 in zip(pts[:-1], pts[1:]):
                cv2.line(vis, p0, p1, (0, 255, 255), 2)
            for p in pts:
                cv2.circle(vis, p, 3, (0, 0, 255), -1)
    if det is not None:
        for x1, y1, x2, y2, cls in np.asarray(det).reshape(-1, 5):
            cv2.rectangle(vis, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 255, 0), 2)
            cv2.putText(vis, str(int(cls)), (int(x1), int(y1) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    return vis


def side_by_side(before, after, title):
    h = max(before.shape[0], after.shape[0])
    w = before.shape[1] + after.shape[1] + 8
    canvas = np.full((h + 28, w, 3), 30, np.uint8)
    canvas[28:28 + before.shape[0], :before.shape[1]] = before
    canvas[28:28 + after.shape[0], before.shape[1] + 8:] = after
    cv2.putText(canvas, f"{title}: before | after", (8, 20),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 1)
    return canvas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/aug_debug")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    img, lanes, det, seg = make_scene()
    h, w = img.shape[:2]
    before = draw_labels(img, lanes, det, seg)
    rng = np.random.RandomState(3)

    cases = {
        "fliplr": _fliplr(w),
        "rotate+12deg": _rotate(12, w / 2, h / 2),
        "shear-12deg": _shear_x(-12, w / 2, h / 2),
        "crop_keep_size": _crop_keep_size(0.15, 0.10, 0.0, 0.10, w, h),
    }
    ok, ratio = cal_split(lanes, w, h)
    if ok:
        cases["split_crop"] = _split_matrix(w, h, np.random.RandomState(1),
                                            ratio)

    for name, m in cases.items():
        out = apply_geometry(img, m, lane_label=lanes, det_label=det,
                             seg_label=seg)
        after = draw_labels(out["image"], out["lane_label"],
                            out["det_label"], out["seg_label"])
        cv2.imwrite(os.path.join(args.out, f"{name}.jpg"),
                    side_by_side(before, after, name))
        print("wrote", name)

    # one full random augment (color + composed geometry), net-fused path
    out = augment_sample(img, lane_label=lanes, det_label=det, seg_label=seg,
                         rng=rng, do_split=ok, split_ratio=ratio,
                         image_out_wh=(512, 512))
    # labels are in original coords; scale for drawing on the 512x512 image
    sx, sy = 512 / w, 512 / h
    lanes_s = {"Lines": [[{"x": p["x"] * sx, "y": p["y"] * sy} for p in l]
                         for l in out["lane_label"]["Lines"]]}
    det_s = np.asarray(out["det_label"]).reshape(-1, 5).copy()
    if len(det_s):
        det_s[:, :4] *= [sx, sy, sx, sy]
    after = draw_labels(out["image"], lanes_s, det_s, out["seg_label"])
    cv2.imwrite(os.path.join(args.out, "full_random_aug.jpg"),
                side_by_side(before, after, "augment_sample (fused 512x512)"))
    print("wrote full_random_aug")


if __name__ == "__main__":
    main()
