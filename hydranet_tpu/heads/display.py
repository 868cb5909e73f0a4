"""Detection visualization (TPU-native equivalent of
/root/reference/model/head_detect/display.py): per-class color table from
webcolors names, box + label + score drawing with target->original rescale."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import cv2
import numpy as np

STANDARD_COLORS = [
    "LawnGreen", "Chartreuse", "Aqua", "Beige", "Azure", "BlanchedAlmond",
    "Bisque", "Aquamarine", "BlueViolet", "BurlyWood", "CadetBlue",
    "AntiqueWhite", "Chocolate", "Coral", "CornflowerBlue", "Cornsilk",
    "Crimson", "Cyan", "DarkCyan", "DarkGoldenRod", "DarkGrey", "DarkKhaki",
    "DarkOrange", "DarkOrchid", "DarkSalmon", "DarkSeaGreen", "DarkTurquoise",
    "DarkViolet", "DeepPink", "DeepSkyBlue", "DodgerBlue", "FireBrick",
    "FloralWhite", "ForestGreen", "Fuchsia", "Gainsboro", "GhostWhite",
    "Gold", "GoldenRod", "Salmon", "Tan", "HoneyDew", "HotPink", "IndianRed",
    "Ivory",
]


def _name_to_bgr(name: str) -> Tuple[int, int, int]:
    try:
        import webcolors

        rgb = webcolors.name_to_rgb(name)
        return (rgb.blue, rgb.green, rgb.red)
    except Exception:
        h = abs(hash(name))
        return (h % 256, (h // 256) % 256, (h // 65536) % 256)


COLOR_LIST = [_name_to_bgr(c) for c in STANDARD_COLORS]


def plot_one_box(img: np.ndarray, coord: Sequence[float], label: str = None,
                 score: float = None, color=None, line_thickness=None):
    """Box + filled label strip — reference display.py:49-61."""
    tl = line_thickness or int(round(0.003 * max(img.shape[0:2])))
    c1 = (int(coord[0]), int(coord[1]))
    c2 = (int(coord[2]), int(coord[3]))
    cv2.rectangle(img, c1, c2, color, thickness=tl)
    if label:
        tf = max(tl - 2, 1)
        s_size = cv2.getTextSize(f"{score:.0%}", 0, fontScale=float(tl) / 3,
                                 thickness=tf)[0]
        t_size = cv2.getTextSize(label, 0, fontScale=float(tl) / 3,
                                 thickness=tf)[0]
        c2 = (c1[0] + t_size[0] + s_size[0] + 15, c1[1] - t_size[1] - 3)
        cv2.rectangle(img, c1, c2, color, -1)
        cv2.putText(img, f"{label}{score:.0%}", (c1[0], c1[1] - 2), 0,
                    float(tl) / 3, [0, 0, 0], thickness=tf,
                    lineType=cv2.FONT_HERSHEY_SIMPLEX)


def display_detections(detections, imgs: List[np.ndarray],
                       obj_list: Sequence[str],
                       org_size: Tuple[int, int],
                       target_size: Tuple[int, int]) -> List[np.ndarray]:
    """Draw fixed-shape Detections (hydranet_tpu.heads.detection.Detections)
    onto BGR frames, rescaling target->original — reference display.py:64-84.
    """
    boxes = np.asarray(detections.boxes)
    scores = np.asarray(detections.scores)
    classes = np.asarray(detections.classes)
    valid = np.asarray(detections.valid)
    for i in range(len(imgs)):
        ks = np.where(valid[i])[0]
        if len(ks) == 0:
            continue
        imgs[i] = imgs[i].copy()
        for k in ks:
            x1, y1, x2, y2 = boxes[i, k]
            x1 = x1 / float(target_size[0]) * org_size[0]
            x2 = x2 / float(target_size[0]) * org_size[0]
            y1 = y1 / float(target_size[1]) * org_size[1]
            y2 = y2 / float(target_size[1]) * org_size[1]
            obj = obj_list[int(classes[i, k])]
            plot_one_box(imgs[i], [x1, y1, x2, y2], label=obj,
                         score=float(scores[i, k]),
                         color=COLOR_LIST[int(classes[i, k]) % len(COLOR_LIST)])
    return imgs
