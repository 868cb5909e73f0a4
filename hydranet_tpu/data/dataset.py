"""Multitask dataset (TPU-native equivalent of
/root/reference/model/dataset/dataloader.py:167-541).

Per-sample: read image, per-task labels (lane json "shapes", seg png,
det txt "x1,y1,x2,y2,cat"), optional joint augmentation, lane GT encoding via
LaneCodec, resize + imagenet-normalize. Emits NHWC float32 (the reference
emits CHW for torch; TPU wants channels-last).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import cv2
import numpy as np

from hydranet_tpu.config import Config
from hydranet_tpu.data import utility
from hydranet_tpu.data.augment import augment_sample, cal_split
from hydranet_tpu.heads.lane_codec import LaneCodec


class MultitaskDataset:
    def __init__(self, cfg: Config, mode: str = "train",
                 seed: Optional[int] = None):
        self.cfg = cfg
        self.mode = mode
        dl = cfg.dataloader
        self.input_w = dl.network_input_width
        self.input_h = dl.network_input_height
        self.with_aug = dl.with_aug and mode == "train"
        self.do_split = dl.do_split
        self.do_flip = dl.do_flip
        self.fast_decode = getattr(dl, "fast_decode", False) and mode == "train"

        self.train_detect = cfg.train.train_detect
        self.train_seg = cfg.train.train_seg
        self.train_lane = cfg.train.train_lane
        if not (self.train_lane or self.train_seg or self.train_detect):
            raise ValueError("must train at least one head")

        self.points_per_line = cfg.lane_points_per_line
        self.lane_coder = LaneCodec(
            input_width=self.input_w, input_height=self.input_h,
            anchor_stride=cfg.lane.anchor_stride,
            points_per_line=self.points_per_line,
            do_interpolate=cfg.lane.interpolate,
            anchor_lane_num=cfg.lane.anchor_lane_num,
            scale_invariance=cfg.lane.scale_invariance)

        list_file = os.path.join(
            dl.data_list, "train.txt" if mode == "train" else "valid.txt")
        self.pairs = utility.create_subset(
            list_file, with_lane=self.train_lane, with_seg=self.train_seg,
            with_detect=self.train_detect)
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.pairs)

    @staticmethod
    def parse_own_label(labels: Dict) -> Dict:
        """labelme-style {"shapes": [{label, points}]} -> {"Lines","Labels"}
        — reference dataloader.py:382-392."""
        lane_list = {"Lines": [], "Labels": []}
        for shape in labels["shapes"]:
            lane_list["Lines"].append(
                [{"x": pt[0], "y": pt[1]} for pt in shape["points"]])
            lane_list["Labels"].append(shape["label"])
        return lane_list

    @staticmethod
    def load_detect_annot(path: str) -> np.ndarray:
        """"x1,y1,x2,y2,category" lines -> [M, 5] (x1, y1, x2, y2, cls0based),
        skipping degenerate boxes — reference dataloader.py:394-426."""
        rows = []
        with open(path) as f:
            for line in f:
                parts = line.strip("\n").split(",")
                if len(parts) < 5:
                    continue
                x1, y1, x2, y2, cat = (int(parts[0]), int(parts[1]),
                                       int(parts[2]), int(parts[3]),
                                       int(parts[4]))
                if x2 - x1 < 1 or y2 - y1 < 1:
                    continue
                rows.append([x1, y1, x2, y2, cat - 1])  # drop background id
        return np.array(rows, dtype=np.float64).reshape(-1, 5)

    def __getitem__(self, idx: int) -> Dict:
        return self.get(idx, self.rng)

    def get(self, idx: int, rng: np.random.RandomState) -> Dict:
        """Fetch one sample using an explicit augmentation RNG.

        The DataLoader derives `rng` deterministically from
        (loader seed, epoch, dataset index), so a sample's augmentation is
        identical no matter which worker process produces it (unlike torch's
        per-worker base_seed scheme, where results change with num_workers).
        """
        pair = self.pairs[idx]
        if self.fast_decode:
            image, (sx, sy) = utility.imread_reduced(
                pair["image_path"], self.input_w, self.input_h)
        else:
            image = utility.imread(pair["image_path"])
            sx = sy = 1.0
        whc = utility.get_img_whc(image)

        lane_label = None
        annot_lane_path = None
        if self.train_lane:
            annot_lane_path = pair["annot_path_lane"]
            lane_label = self.parse_own_label(utility.load_json(annot_lane_path))
            if sx != 1.0 or sy != 1.0:
                lane_label = {
                    "Lines": [[{"x": p["x"] * sx, "y": p["y"] * sy}
                               for p in line]
                              for line in lane_label["Lines"]],
                    "Labels": lane_label["Labels"]}

        seg_label = None
        if self.train_seg:
            seg_label = cv2.imread(pair["annot_path_seg"], cv2.IMREAD_UNCHANGED)
            if seg_label is not None and seg_label.ndim == 3:
                seg_label = seg_label[:, :, 0]
            if seg_label is not None and seg_label.shape[:2] != image.shape[:2]:
                seg_label = cv2.resize(
                    seg_label, (image.shape[1], image.shape[0]),
                    interpolation=cv2.INTER_NEAREST)

        obj_label = None
        if self.train_detect:
            obj_label = self.load_detect_annot(pair["annot_path_detect"])
            if (sx != 1.0 or sy != 1.0) and len(obj_label):
                obj_label[:, :4] *= np.array([sx, sy, sx, sy])

        if self.with_aug:
            if self.do_split:
                do_split, ratio = cal_split(lane_label, whc["width"],
                                            whc["height"])
            else:
                do_split, ratio = False, None
            aug = augment_sample(
                image, lane_label=lane_label, det_label=obj_label,
                seg_label=seg_label, rng=rng, do_flip=self.do_flip,
                do_split=do_split, split_ratio=ratio,
                image_out_wh=(self.input_w, self.input_h))
            image = aug["image"]
            lane_label = aug["lane_label"] if self.train_lane else None
            seg_label = aug["seg_label"] if self.train_seg else None
            obj_label = aug["det_label"] if self.train_detect else None

        encode_type = encode_loc = None
        if self.train_lane:
            encode_type, encode_loc = self.lane_coder.encode_lane(
                lane_label, org_width=whc["width"], org_height=whc["height"])
            if self.lane_coder.scale_invariance:
                ppl = self.points_per_line
                encode_loc = encode_loc.copy()
                encode_loc[:, ppl + 2: 2 * ppl + 2] /= self.lane_coder.interval
                encode_loc[:, :ppl] /= self.lane_coder.interval

        if image.shape[:2] != (self.input_h, self.input_w):
            image = utility.resize_by_wh(
                image, width=self.input_w, height=self.input_h)
        net_img = utility.imagenet_normalize(utility.bgr2rgb(image))

        return dict(
            image=net_img.astype(np.float32),
            src_image_shape=whc,
            src_image_path=pair["image_path"],
            annot_lane=json.dumps(lane_label) if lane_label else None,
            annot_lane_path=annot_lane_path,
            gt_loc=encode_loc,
            gt_cls=encode_type,
            gt_seg=seg_label,
            gt_det=obj_label,
        )
