"""Synthetic on-disk dataset fixture following the reference's layout
conventions (images/ + labels_lane/*.json + labels_segmentation/*.png +
labels_object/*.txt + list/{train,valid}.txt — utility.py:235-257)."""

import json
import os

import cv2
import numpy as np


def make_dataset(root: str, n_train: int = 4, n_valid: int = 2,
                 size=(480, 640), n_seg_classes: int = 3,
                 n_det_classes: int = 4, seed: int = 0,
                 empty_det: tuple = ()) -> str:
    """`empty_det` lists 0-based image indices whose labels_object txt is
    written EMPTY (the reference's empty-label-file case that used to shift
    detection-eval image ids)."""
    rng = np.random.RandomState(seed)
    h, w = size
    for sub in ["images", "labels_lane", "labels_segmentation",
                "labels_object", "list"]:
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    names = [f"im{i:03d}" for i in range(n_train + n_valid)]
    for idx, name in enumerate(names):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(root, "images", name + ".jpg"), img)

        seg = rng.randint(0, n_seg_classes, (h, w)).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "labels_segmentation", name + ".png"),
                    seg)

        lines = []
        for li in range(rng.randint(1, 4)):
            x0 = rng.uniform(80, w - 80)
            slope = rng.uniform(-0.6, 0.6)
            ys = np.linspace(rng.uniform(h * 0.3, h * 0.5), h - 1, 6)
            pts = [[float(x0 + slope * (y - h)), float(y)] for y in ys]
            lines.append({"label": "lane", "points": pts[::-1]})
        with open(os.path.join(root, "labels_lane", name + ".json"), "w") as f:
            json.dump({"shapes": lines}, f)

        rows = []
        if idx not in empty_det:
            for _ in range(rng.randint(1, 5)):
                x1 = rng.randint(0, w - 60)
                y1 = rng.randint(0, h - 60)
                bw = rng.randint(10, 60)
                bh = rng.randint(10, 60)
                cat = rng.randint(1, n_det_classes + 1)  # 1-based (0 = bg)
                rows.append(f"{x1},{y1},{x1 + bw},{y1 + bh},{cat}")
        with open(os.path.join(root, "labels_object", name + ".txt"), "w") as f:
            f.write("\n".join(rows) + ("\n" if rows else ""))

    img_paths = [os.path.join(root, "images", n + ".jpg") for n in names]
    with open(os.path.join(root, "list", "train.txt"), "w") as f:
        f.write("\n".join(img_paths[:n_train]) + "\n")
    with open(os.path.join(root, "list", "valid.txt"), "w") as f:
        f.write("\n".join(img_paths[n_train:]) + "\n")
    return root
