"""Joint multitask augmentation (equivalent capability to the reference's
imgaug pipeline, /root/reference/model/dataset/dataloader.py:44-162).

imgaug is not available in this image; the same augmentation family is
implemented directly with cv2/numpy:

- color jitter, one of: gaussian blur, linear contrast, multiply,
  additive gaussian noise, HSV hue/saturation/value scaling
  (dataloader.py:57-68)
- geometric, 4 of: horizontal flip, translate-x +-16px, shear-x +-15deg,
  rotate +-15deg, crop (top<=20%, sides<=15%) with keep_size
  (dataloader.py:70-90)
- optional lane-geometry-driven "split" crop (dataloader.py:82-84, cal_split
  in the dataset)

Every geometric op is composed into a single 2x3 affine matrix applied
consistently to the image (bilinear), segmentation mask (nearest), lane
polylines (point transform), and detection boxes (corner transform ->
axis-aligned bbox -> clip), matching imgaug's augmentable semantics.
Each op fires with probability 0.6, as in the reference Sequential.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np


def _affine_identity() -> np.ndarray:
    return np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])


def _compose(m: np.ndarray, op: np.ndarray) -> np.ndarray:
    return op @ m


def _translate(tx: float, ty: float) -> np.ndarray:
    m = _affine_identity()
    m[0, 2], m[1, 2] = tx, ty
    return m


def _center_op(op: np.ndarray, cx: float, cy: float) -> np.ndarray:
    return _translate(cx, cy) @ op @ _translate(-cx, -cy)


def _fliplr(w: int) -> np.ndarray:
    m = _affine_identity()
    m[0, 0] = -1.0
    m[0, 2] = w - 1.0
    return m


def _shear_x(deg: float, cx: float, cy: float) -> np.ndarray:
    m = _affine_identity()
    m[0, 1] = math.tan(math.radians(deg))
    return _center_op(m, cx, cy)


def _rotate(deg: float, cx: float, cy: float) -> np.ndarray:
    rad = math.radians(deg)
    m = _affine_identity()
    m[0, 0] = math.cos(rad)
    m[0, 1] = -math.sin(rad)
    m[1, 0] = math.sin(rad)
    m[1, 1] = math.cos(rad)
    return _center_op(m, cx, cy)


def _crop_keep_size(top: float, right: float, bottom: float, left: float,
                    w: int, h: int) -> np.ndarray:
    """Crop by fractional margins then scale back to (w, h)."""
    x0, y0 = left * w, top * h
    cw = w - x0 - right * w
    ch = h - y0 - bottom * h
    scale = _affine_identity()
    scale[0, 0] = w / max(cw, 1.0)
    scale[1, 1] = h / max(ch, 1.0)
    return scale @ _translate(-x0, -y0)


# 1.5x linear contrast about 127.5, clip + truncate — bit-identical to the
# float round trip np.clip(127.5 + 1.5*(v-127.5), 0, 255).astype(uint8).
_CONTRAST_LUT_15 = np.clip(
    127.5 + 1.5 * (np.arange(256, dtype=np.float32) - 127.5),
    0, 255).astype(np.uint8)


def _mult_lut(alpha: float) -> np.ndarray:
    """LUT for clip(v*alpha, 0, 255) with truncation (uint8 Multiply aug)."""
    return np.clip(np.arange(256, dtype=np.float32) * np.float32(alpha),
                   0, 255).astype(np.uint8)


def _apply_color(image: np.ndarray, rng: np.random.RandomState,
                 sigma_scale: float = 1.0) -> np.ndarray:
    """One randomly chosen color op — dataloader.py:57-68.

    sigma_scale rescales the blur sigma when the op runs at a different
    resolution than the original frame (fused warp+resize fast path)."""
    choice = rng.randint(7)
    img = image
    if choice == 0:
        sigma = rng.uniform(0.5, 1.5) * sigma_scale
        img = cv2.GaussianBlur(img, (0, 0), max(sigma, 0.01))
    elif choice == 1:
        # 256-entry LUT: exact clip+truncate semantics at C speed.
        # (convertScaleAbs is NOT usable here: it computes |alpha*x+beta|,
        # so the negative pre-clip values under 1.5x contrast reflect to
        # gray instead of clipping to black.)
        img = cv2.LUT(img, _CONTRAST_LUT_15)
    elif choice == 2:
        if rng.rand() < 0.2:
            mult = rng.uniform(0.8, 1.2, size=3)
            img = cv2.merge([cv2.LUT(c, _mult_lut(m))
                             for c, m in zip(cv2.split(img), mult)])
        else:
            img = cv2.LUT(img, _mult_lut(rng.uniform(0.8, 1.2)))
    elif choice == 3:
        scale = rng.uniform(0.0, 0.1 * 255)
        # f32 noise (f64 Box-Muller over 1080p x 3ch dominated the whole
        # augmentation pipeline); cv2.add saturates like the old clip
        if rng.rand() < 0.5:
            noise = rng.normal(0, scale, img.shape).astype(np.float32)
        else:
            noise = np.broadcast_to(
                rng.normal(0, scale, img.shape[:2])[..., None].astype(
                    np.float32), img.shape)
        img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
    else:
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
        if choice == 4:
            hsv[..., 0] = np.mod(hsv[..., 0] * rng.uniform(0.7, 1.3), 180)
        elif choice == 5:
            hsv[..., 1] = np.clip(hsv[..., 1] * rng.uniform(0.1, 2.0), 0, 255)
        else:
            hsv[..., 2] = np.clip(hsv[..., 2] * rng.uniform(0.5, 1.5), 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return img


def _geometry_matrix(w: int, h: int, rng: np.random.RandomState,
                     do_flip: bool, do_split: bool,
                     split_ratio: Optional[float]) -> np.ndarray:
    """Compose 4 randomly chosen geometric ops — dataloader.py:70-90."""
    cx, cy = w / 2.0, h / 2.0
    ops = [
        lambda: _fliplr(w),
        lambda: _translate(rng.uniform(-16, 16), 0.0),
        lambda: _shear_x(rng.uniform(-15, 15), cx, cy),
        lambda: _rotate(rng.uniform(-15, 15), cx, cy),
    ]
    if do_flip:
        def flipud():
            m = _affine_identity()
            m[1, 1] = -1.0
            m[1, 2] = h - 1.0
            return m
        ops.append(flipud)
    if not do_split:
        ops.append(lambda: _crop_keep_size(
            rng.uniform(0, 0.2), rng.uniform(0, 0.15), 0.0,
            rng.uniform(0, 0.15), w, h))

    chosen = rng.choice(len(ops), size=min(4, len(ops)), replace=False)
    m = _affine_identity()
    for i in chosen:
        m = _compose(m, ops[i]())
    return m


def _split_matrix(w: int, h: int, rng: np.random.RandomState,
                  split_ratio: float) -> np.ndarray:
    """Lane-driven split crop: keep one side of the scene —
    dataloader.py:82-84."""
    top = rng.uniform(0, 0.2)
    if rng.rand() < 0.5:
        right, left = 1.0 - split_ratio, rng.uniform(0, 0.15)
    else:
        right, left = rng.uniform(0, 0.15), split_ratio
    return _crop_keep_size(top, right, 0.0, left, w, h)


def cal_split(lane_label: Optional[Dict], w: int, h: int
              ) -> Tuple[bool, Optional[float]]:
    """Decide whether a split crop is geometrically possible and its ratio
    from the left/right lane bottom intersections — reference
    dataloader.py:428-480."""
    if not lane_label or not lane_label.get("Lines"):
        return False, None
    slopes, all_lines = [], []
    for lane in lane_label["Lines"]:
        pts = np.array([[float(p["x"]), h - float(p["y"])] for p in lane])
        if len(pts) < 2 or np.ptp(pts[:, 0]) < 1e-6:
            return False, None
        k = np.polyfit(pts[:, 0], pts[:, 1], 1)[0]
        slopes.append(k)
        all_lines.append(pts)
    slopes = np.array(slopes)
    if np.all(slopes >= 0) or np.all(slopes <= 0):
        return False, None
    order = np.argsort(slopes)
    sorted_k = slopes[order]
    left_idx = order[np.where(sorted_k <= 0)[0][0]]
    right_idx = order[-1]
    left_x = all_lines[left_idx][np.argsort(all_lines[left_idx][:, 1])][0, 0]
    right_x = all_lines[right_idx][np.argsort(all_lines[right_idx][:, 1])][0, 0]
    return True, (left_x + right_x) / 2.0 / w


def augment_sample(
    image: np.ndarray,  # RGB or BGR uint8 (treated uniformly)
    lane_label: Optional[Dict] = None,
    det_label: Optional[np.ndarray] = None,  # [M, 5] x1 y1 x2 y2 cls
    seg_label: Optional[np.ndarray] = None,  # [H, W] uint8
    *,
    rng: Optional[np.random.RandomState] = None,
    do_flip: bool = False,
    do_split: bool = False,
    split_ratio: Optional[float] = None,
    image_out_wh: Optional[Tuple[int, int]] = None,
) -> Dict:
    """Jointly augment image + all labels — reference _lane_argue
    (dataloader.py:44-162).

    If `image_out_wh=(ow, oh)` is given and a geometric op fires, the
    net-input resize is FUSED into the warp: the image/seg warp straight to
    (ow, oh) (warp cost scales with the output size, so this replaces a
    full-res warp + separate resize with one small warp) and the color op
    runs at net resolution with a scale-adjusted blur sigma. Label
    transforms stay in ORIGINAL-image coordinates either way, so the
    downstream lane-encode / det-rescale contracts are unchanged. When no
    geometric op fires the image is returned untouched (the caller's
    INTER_AREA resize path keeps reference semantics).
    """
    rng = rng or np.random.RandomState()
    h, w = image.shape[:2]

    do_color = rng.rand() < 0.6

    m = _affine_identity()
    if do_split and split_ratio is not None and rng.rand() < 0.6:
        m = _compose(m, _split_matrix(w, h, rng, split_ratio))
    if rng.rand() < 0.6:
        m = _compose(m, _geometry_matrix(w, h, rng, do_flip, do_split,
                                         split_ratio))

    sigma_scale = 1.0
    if not np.allclose(m, _affine_identity()):
        out = apply_geometry(image, m, lane_label=lane_label,
                             det_label=det_label, seg_label=seg_label,
                             image_out_wh=image_out_wh)
        image, lane_label = out["image"], out["lane_label"]
        det_label, seg_label = out["det_label"], out["seg_label"]
        if image_out_wh is not None:
            sigma_scale = (image_out_wh[0] / float(w)
                           + image_out_wh[1] / float(h)) / 2.0

    if do_color:
        image = _apply_color(image, rng, sigma_scale)

    return dict(image=image, lane_label=lane_label, det_label=det_label,
                seg_label=seg_label)


def apply_geometry(
    image: np.ndarray,
    m: np.ndarray,  # [3, 3] affine in ORIGINAL-image coordinates
    lane_label: Optional[Dict] = None,
    det_label: Optional[np.ndarray] = None,
    seg_label: Optional[np.ndarray] = None,
    image_out_wh: Optional[Tuple[int, int]] = None,
) -> Dict:
    """Apply one affine jointly to image (bilinear), seg mask (nearest), lane
    polylines, and det boxes (corner transform -> aabb -> clip) — the
    augmentable semantics of the reference's imgaug pipeline. Labels stay in
    original-image coordinates; `image_out_wh` fuses the net-input resize
    into the image/seg warp (see augment_sample). Also used standalone by
    scripts/augment_debug.py to render forced transforms."""
    h, w = image.shape[:2]
    if image_out_wh is not None:
        ow, oh = image_out_wh
        scale = _affine_identity()
        scale[0, 0] = ow / float(w)
        scale[1, 1] = oh / float(h)
        m23 = (scale @ m)[:2]
        out_wh = (ow, oh)
    else:
        m23 = m[:2]
        out_wh = (w, h)
    image = cv2.warpAffine(image, m23, out_wh, flags=cv2.INTER_LINEAR)
    if seg_label is not None:
        seg_label = cv2.warpAffine(seg_label, m23, out_wh,
                                   flags=cv2.INTER_NEAREST)

    def tx_points(pts):  # [N, 2]
        pts = np.asarray(pts, dtype=np.float64)
        return pts @ m[:2, :2].T + m[:2, 2]

    if lane_label is not None:
        lines = []
        for line in lane_label["Lines"]:
            pts = tx_points([[float(p["x"]), float(p["y"])] for p in line])
            # reference casts augmented lane points to int (dataloader.py:142)
            lines.append([dict(x=float(int(px)), y=float(int(py)))
                          for px, py in pts])
        lane_label = dict(Lines=lines, Labels=None)

    if det_label is not None and len(det_label):
        boxes = []
        for x1, y1, x2, y2, cls in det_label:
            corners = tx_points([[x1, y1], [x2, y1], [x2, y2], [x1, y2]])
            nx1, ny1 = corners.min(axis=0)
            nx2, ny2 = corners.max(axis=0)
            # clip_out_of_image semantics (dataloader.py:150-154)
            nx1, nx2 = np.clip([nx1, nx2], 0, w)
            ny1, ny2 = np.clip([ny1, ny2], 0, h)
            if nx2 - nx1 >= 1 and ny2 - ny1 >= 1:
                boxes.append([nx1, ny1, nx2, ny2, cls])
        det_label = (np.array(boxes) if boxes
                     else np.zeros((0, 5)))

    return dict(image=image, lane_label=lane_label, det_label=det_label,
                seg_label=seg_label)
