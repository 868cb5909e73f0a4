"""Procedural driving-scene dataset generator for convergence runs.

Writes the reference directory layout (images/ + labels_lane/*.json +
labels_segmentation/*.png + labels_object/*.txt + list/{train,valid}.txt —
reference utility.py:235-257 conventions) with STRUCTURED scenes a model can
actually learn:

- perspective road: a trapezoid from a horizon-line vanishing region to the
  bottom edge (seg class 1), textured asphalt over a sky/ground background
- lane markings: 2-5 polylines converging toward the vanishing point, drawn
  as bright dashed/solid strips (seg class 2) and annotated as labelme-style
  point lists for the lane head
- vehicles: 4 visually distinct object classes (car/truck/bus/bike) rendered
  as shaded boxes with wheels/windows sitting on the road, annotated as
  x1,y1,x2,y2,cat detection rows
- illumination/noise jitter so the tasks are not pixel-lookup trivial

Usage: python scripts/gen_procedural_dataset.py OUT_DIR [n_train] [n_valid]
"""

from __future__ import annotations

import json
import os
import sys

import cv2
import numpy as np

SEG_BG, SEG_ROAD, SEG_MARK = 0, 1, 2
W, H = 640, 480


def _road_geometry(rng):
    """Vanishing point + road edge x-positions at the bottom."""
    vx = rng.uniform(0.35, 0.65) * W
    vy = rng.uniform(0.35, 0.5) * H
    half_bottom = rng.uniform(0.3, 0.48) * W
    cx_bottom = rng.uniform(0.35, 0.65) * W
    return (vx, vy), (cx_bottom - half_bottom, cx_bottom + half_bottom)


def _lane_xs(rng, n_lanes, left, right):
    """Bottom-edge x positions of the lane lines, inside the road."""
    xs = np.linspace(left, right, n_lanes)
    xs = xs + rng.uniform(-0.02, 0.02, n_lanes) * (right - left)
    return xs


def _lane_points(vp, x_bottom, y_top, n=12):
    """Points along the line from (x_bottom, H-1) toward the vanishing
    point, cut at y_top (below the horizon)."""
    vx, vy = vp
    ys = np.linspace(H - 1, y_top, n)
    ts = (H - 1 - ys) / max(H - 1 - vy, 1e-6)
    xs = x_bottom + ts * (vx - x_bottom)
    return np.stack([xs, ys], axis=1)


def _draw_vehicle(img, seg, rng, cls, vp, road_l, road_r, t=None):
    """One vehicle on the road; returns (x1, y1, x2, y2, cat 1-based)."""
    # place by depth: t in [0.1, 0.75] toward the vanishing point
    if t is None:
        t = rng.uniform(0.1, 0.75)
    vx, vy = vp
    yb = (H - 1) + t * (vy - (H - 1))          # bottom of vehicle
    lane_x = rng.uniform(road_l + 30, road_r - 30)
    xc = lane_x + t * (vx - lane_x)
    scale = 1.0 - 0.88 * t
    # class geometry: (width, height, base BGR)
    geom = {
        1: (90, 70, (40, 40, 190)),    # car: red-ish
        2: (120, 95, (50, 140, 60)),   # truck: green-ish
        3: (140, 110, (170, 90, 30)),  # bus: blue-ish
        4: (34, 60, (30, 180, 200)),   # bike: yellow-ish
    }[cls]
    bw = max(8, int(geom[0] * scale))
    bh = max(8, int(geom[1] * scale))
    x1, x2 = int(xc - bw / 2), int(xc + bw / 2)
    y1, y2 = int(yb - bh), int(yb)
    x1c, y1c = max(0, x1), max(0, y1)
    x2c, y2c = min(W - 1, x2), min(H - 1, y2)
    if x2c - x1c < 6 or y2c - y1c < 6:
        return None
    color = tuple(int(np.clip(c + rng.randint(-25, 25), 0, 255))
                  for c in geom[2])
    cv2.rectangle(img, (x1, y1), (x2, y2), color, cv2.FILLED)
    cv2.rectangle(img, (x1, y1), (x2, y2), (20, 20, 20), max(1, bw // 20))
    # the vehicle occludes the road/markings: the seg GT must not keep
    # the occluded class labels under its body
    seg[y1c:y2c + 1, x1c:x2c + 1] = SEG_BG
    # class-distinct detail: windows (car/bus), cab line (truck), wheel (bike)
    if cls in (1, 3):
        wy = y1 + bh // 5
        cv2.rectangle(img, (x1 + bw // 6, wy), (x2 - bw // 6, wy + bh // 4),
                      (200, 220, 230), cv2.FILLED)
    elif cls == 2:
        cv2.line(img, (x1, y1 + bh // 3), (x2, y1 + bh // 3), (20, 20, 20),
                 max(1, bh // 12))
    else:
        cv2.circle(img, ((x1 + x2) // 2, y2 - bh // 6), max(2, bw // 4),
                   (15, 15, 15), cv2.FILLED)
    return (x1c, y1c, x2c, y2c, cls)


def render_scene(rng):
    """One scene -> (image BGR, seg mask, lane point lists, det rows)."""
    img = np.zeros((H, W, 3), np.uint8)
    seg = np.zeros((H, W), np.uint8)

    vp, (road_l, road_r) = _road_geometry(rng)
    vx, vy = vp

    # sky: vertical gradient; ground: noisy green-brown
    sky_top = np.array([rng.randint(140, 210)] * 3) + np.array([40, 10, -30])
    for y in range(H):
        f = y / H
        base = sky_top * (1 - f) + np.array([60, 80, 70]) * f
        img[y, :] = np.clip(base + rng.randint(-6, 6), 0, 255)
    ground = seg_poly = None

    # road trapezoid (clipped at horizon+eps)
    y_top = vy + 0.06 * (H - vy)
    t_top = (H - 1 - y_top) / (H - 1 - vy)
    lx_top = road_l + t_top * (vx - road_l)
    rx_top = road_r + t_top * (vx - road_r)
    poly = np.array([[road_l, H - 1], [road_r, H - 1],
                     [rx_top, y_top], [lx_top, y_top]], np.int32)
    asphalt = rng.randint(70, 110)
    cv2.fillPoly(img, [poly], (asphalt, asphalt, asphalt))
    cv2.fillPoly(seg, [poly], SEG_ROAD)
    # asphalt texture
    noise = rng.randint(-8, 8, (H, W, 1), np.int16)
    road_mask = seg == SEG_ROAD
    img[road_mask] = np.clip(img[road_mask].astype(np.int16)
                             + noise[road_mask], 0, 255).astype(np.uint8)

    # lane lines
    n_lanes = rng.randint(2, 6)
    lane_annots = []
    xs = _lane_xs(rng, n_lanes, road_l + 10, road_r - 10)
    for li, xb in enumerate(xs):
        pts = _lane_points(vp, xb, y_top)
        width_b = rng.uniform(6, 11)
        dashed = rng.rand() < 0.4 and 0 < li < n_lanes - 1
        col = (int(rng.uniform(200, 255)),) * 3 if rng.rand() < 0.7 else \
            (60, 200, 240)  # white or yellow-ish
        for k in range(len(pts) - 1):
            if dashed and k % 2 == 1:
                continue
            tmid = (H - 1 - pts[k, 1]) / (H - 1 - vy)
            wline = max(1, int(width_b * (1 - 0.85 * tmid)))
            p0 = tuple(np.round(pts[k]).astype(int))
            p1 = tuple(np.round(pts[k + 1]).astype(int))
            cv2.line(img, p0, p1, col, wline)
            cv2.line(seg, p0, p1, SEG_MARK, wline)
        # labelme-style bottom-to-top point list
        lane_annots.append([{"x": float(x), "y": float(y)} for x, y in pts])

    # vehicles (drawn far-to-near so nearer ones overdraw)
    det_rows = []
    n_veh = rng.randint(1, 5)
    cls_list = rng.randint(1, 5, n_veh)
    depths = [rng.uniform(0.1, 0.75) for _ in cls_list]
    rows = []
    # high t = closer to the vanishing point = farther away; draw far
    # first so nearer vehicles overdraw
    for t, cls in sorted(zip(depths, cls_list.tolist()), reverse=True):
        r = _draw_vehicle(img, seg, rng, int(cls), vp, road_l, road_r, t=t)
        if r is not None:
            rows.append(r)
    det_rows = rows

    # global illumination jitter + sensor noise
    gain = rng.uniform(0.8, 1.15)
    img = np.clip(img.astype(np.float32) * gain
                  + rng.randn(H, W, 3) * 4, 0, 255).astype(np.uint8)
    return img, seg, lane_annots, det_rows


def generate(root: str, n_train: int = 400, n_valid: int = 48,
             seed: int = 0) -> str:
    rng = np.random.RandomState(seed)
    for sub in ["images", "labels_lane", "labels_segmentation",
                "labels_object", "list"]:
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    n = n_train + n_valid
    paths = []
    for i in range(n):
        name = f"scene{i:04d}"
        img, seg, lanes, dets = render_scene(rng)
        p = os.path.join(root, "images", name + ".jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 92])
        cv2.imwrite(os.path.join(root, "labels_segmentation", name + ".png"),
                    seg)
        shapes = [{"label": "lane", "points": [[pt["x"], pt["y"]]
                                               for pt in line]}
                  for line in lanes]
        with open(os.path.join(root, "labels_lane", name + ".json"),
                  "w") as f:
            json.dump({"shapes": shapes}, f)
        with open(os.path.join(root, "labels_object", name + ".txt"),
                  "w") as f:
            f.write("\n".join(f"{x1},{y1},{x2},{y2},{c}"
                              for x1, y1, x2, y2, c in dets)
                    + ("\n" if dets else ""))
        paths.append(p)
    with open(os.path.join(root, "list", "train.txt"), "w") as f:
        f.write("\n".join(paths[:n_train]) + "\n")
    with open(os.path.join(root, "list", "valid.txt"), "w") as f:
        f.write("\n".join(paths[n_train:]) + "\n")
    return root


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "artifacts/procedural_data"
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    nv = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    generate(out, nt, nv)
    print(f"wrote {nt}+{nv} scenes to {out}")
