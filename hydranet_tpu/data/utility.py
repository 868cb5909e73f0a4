"""Data utilities (TPU-native equivalent of
/root/reference/model/dataset/utility.py): image IO, normalization, and the
dataset path-derivation convention."""

from __future__ import annotations

import json
import os
from typing import Dict, List

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def imread(img_path: str) -> np.ndarray:
    """Read a BGR image, raising on missing/corrupt files —
    utility.py:138-154."""
    img_path = os.path.normpath(os.path.abspath(os.path.expanduser(img_path)))
    if not os.path.exists(img_path):
        raise FileNotFoundError(img_path)
    img = cv2.imread(img_path)
    if img is None:
        raise IOError(img_path)
    return img


def imread_reduced(img_path: str, min_w: int, min_h: int):
    """Read a BGR image, decoding JPEGs at half resolution via libjpeg DCT
    scaling (IMREAD_REDUCED_COLOR_2, ~3x faster) when the source is at
    least (2*min_w, 2*min_h). Returns (image, (scale_x, scale_y)) where the
    scales map ORIGINAL coordinates to the returned image's coordinates.

    Train-time fast path only; falls back to a full decode otherwise."""
    img_path = os.path.normpath(os.path.abspath(os.path.expanduser(img_path)))
    if not os.path.exists(img_path):
        raise FileNotFoundError(img_path)
    if img_path.lower().endswith((".jpg", ".jpeg")):
        try:
            from PIL import Image  # header-only size read, no decode
            with Image.open(img_path) as im:
                ow, oh = im.size
        except Exception:
            ow = oh = 0
        if ow >= 2 * min_w and oh >= 2 * min_h:
            img = cv2.imread(img_path, cv2.IMREAD_REDUCED_COLOR_2)
            if img is not None:
                h, w = img.shape[:2]
                return img, (w / float(ow), h / float(oh))
    img = cv2.imread(img_path)
    if img is None:
        raise IOError(img_path)
    return img, (1.0, 1.0)


def exif_transpose(img: np.ndarray, orientation: int) -> np.ndarray:
    """Apply an EXIF Orientation tag (274) to a decoded HWC array — numpy
    mirror of the reference's PIL transform table (utility.py:49-96).

    PIL `rotate(-90, expand=True)` is a clockwise quarter turn
    (np.rot90(k=-1)); `transpose(FLIP_LEFT_RIGHT)` is np.fliplr."""
    if orientation == 2:
        return np.fliplr(img)
    if orientation == 3:
        return np.rot90(img, 2)
    if orientation == 4:
        return np.flipud(img)
    if orientation == 5:
        return np.fliplr(np.rot90(img, -1))
    if orientation == 6:
        return np.rot90(img, -1)
    if orientation == 7:
        return np.fliplr(np.rot90(img, 1))
    if orientation == 8:
        return np.rot90(img, 1)
    return img


def load_image_file(file, mode: str = "RGB") -> np.ndarray:
    """Load an image into a numpy array with EXIF orientation applied —
    equivalent of the reference's load_image_file (utility.py:99-135);
    cv2.imread's tag handling is version-dependent, so orientation is
    read and applied explicitly."""
    from PIL import Image

    with Image.open(file) as im:
        try:
            orientation = int(im.getexif().get(274, 1))
        except Exception:
            orientation = 1
        arr = np.array(im.convert(mode))
    return np.ascontiguousarray(exif_transpose(arr, orientation))


def get_img_whc(img: np.ndarray) -> Dict[str, int]:
    """Image {width, height, channel} — utility.py:157-173."""
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    elif img.ndim == 3:
        h, w, c = img.shape
    else:
        raise NotImplementedError()
    return dict(width=w, height=h, channel=c)


def bgr2rgb(img: np.ndarray) -> np.ndarray:
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def resize_by_wh(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """INTER_AREA resize — utility.py:31-46."""
    return cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA)


def imagenet_normalize(img: np.ndarray) -> np.ndarray:
    """RGB uint8 -> normalized float32 — utility.py:213-227.

    In-place arithmetic on one float32 buffer (same values as the naive
    `(x/255 - mean)/std`, ~2x fewer full-frame passes)."""
    img = img.astype(np.float32)
    img /= 255.0
    img -= IMAGENET_MEAN
    img /= IMAGENET_STD
    return img


def imagenet_denormalize(img: np.ndarray) -> np.ndarray:
    """Normalized float (H, W, 3) RGB -> uint8 BGR — utility.py:229-233."""
    img = ((img * IMAGENET_STD + IMAGENET_MEAN) * 255.0).clip(0, 255)
    return cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR)


def load_json(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


def load_img_list(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f]


def create_subset(data_list: str, with_lane=False, with_seg=False,
                  with_detect=False) -> List[Dict[str, str]]:
    """Path-derivation convention: images -> labels_lane(.json) /
    labels_segmentation(.png) / labels_object(.txt) — utility.py:235-257."""
    pairs = []
    for image_path in load_img_list(data_list):
        pair = dict(image_path=image_path)
        if with_lane:
            pair["annot_path_lane"] = image_path.replace(
                ".jpg", ".json").replace("images", "labels_lane")
        if with_seg:
            pair["annot_path_seg"] = image_path.replace(
                ".jpg", ".png").replace("images", "labels_segmentation")
        if with_detect:
            pair["annot_path_detect"] = image_path.replace(
                ".jpg", ".txt").replace("images", "labels_object")
        pairs.append(pair)
    return pairs
