"""Detection visualization (same rendering capability as the reference's
/root/reference/model/head_detect/display.py: per-class colored box + filled
caption strip with class name and score, coordinates rescaled from network
input to the original frame). Implementation is our own: the per-class
palette is generated on the HSV wheel with golden-angle hue stepping
(deterministic, arbitrarily many distinct classes, no webcolors dependency)
and the caption strip is measured once from the composed text and flipped
below the box top when it would clip off-frame."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import cv2
import numpy as np

_GOLDEN_ANGLE = 137.50776405003785  # degrees


def class_color(class_id: int) -> Tuple[int, int, int]:
    """Deterministic, well-separated BGR color for a class id: hue walks the
    color wheel in golden-angle steps (consecutive ids land far apart),
    saturation/value alternate over a small cycle for extra separation."""
    hue = (class_id * _GOLDEN_ANGLE) % 360.0
    sat = (200, 255, 160)[class_id % 3]
    val = (255, 200, 230)[class_id % 3]
    hsv = np.array([[[hue / 2.0, sat, val]]], dtype=np.uint8)  # cv2 H in 0..179
    b, g, r = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0]
    return int(b), int(g), int(r)


def draw_box_caption(img: np.ndarray, box: Sequence[float], caption: str,
                     color: Tuple[int, int, int],
                     thickness: int = None) -> None:
    """Draw one rectangle and a filled caption strip on a BGR frame.

    The strip sits above the top edge, or inside the box when the top edge
    is too close to the frame border to fit it."""
    if thickness is None:
        diag = float(np.hypot(img.shape[0], img.shape[1]))
        thickness = max(1, int(diag / 400.0))
    x1, y1, x2, y2 = (int(round(v)) for v in box)
    cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
    if not caption:
        return
    font, scale = cv2.FONT_HERSHEY_SIMPLEX, thickness / 3.0
    text_thickness = max(1, thickness - 1)
    (tw, th), baseline = cv2.getTextSize(caption, font, scale, text_thickness)
    pad = baseline // 2 + 1
    strip_h = th + baseline + 2 * pad
    top = y1 - strip_h if y1 - strip_h >= 0 else y1
    cv2.rectangle(img, (x1, top), (x1 + tw + 2 * pad, top + strip_h),
                  color, cv2.FILLED)
    cv2.putText(img, caption, (x1 + pad, top + strip_h - pad - baseline // 2),
                font, scale, (0, 0, 0), text_thickness, cv2.LINE_AA)


def display_detections(detections, imgs: List[np.ndarray],
                       obj_list: Sequence[str],
                       org_size: Tuple[int, int],
                       target_size: Tuple[int, int]) -> List[np.ndarray]:
    """Draw fixed-shape Detections (hydranet_tpu.heads.detection.Detections)
    onto BGR frames, rescaling target->original (same contract as reference
    display.py:64-84)."""
    boxes = np.asarray(detections.boxes)
    scores = np.asarray(detections.scores)
    classes = np.asarray(detections.classes)
    valid = np.asarray(detections.valid)
    sx = org_size[0] / float(target_size[0])
    sy = org_size[1] / float(target_size[1])
    for i in range(len(imgs)):
        ks = np.where(valid[i])[0]
        if len(ks) == 0:
            continue
        imgs[i] = imgs[i].copy()
        for k in ks:
            cid = int(classes[i, k])
            x1, y1, x2, y2 = boxes[i, k]
            draw_box_caption(
                imgs[i], (x1 * sx, y1 * sy, x2 * sx, y2 * sy),
                f"{obj_list[cid]} {scores[i, k]:.0%}", class_color(cid))
    return imgs
