"""Lane-metric ceiling of a dataset under the anchor codec.

Round-trips the GROUND-TRUTH lane annotations through the lane codec
(encode_lane -> perfect cls/loc "predictions" -> decode_lanes + lane_nms ->
lanes_to_points) and scores the result against the same GT with LaneMetric.
The resulting F1 is the upper bound any trained model can reach on this
dataset through this codec/decoder/metric chain — anchor-grid quantization,
start/end rounding and the rasterized-IoU threshold all eat from it.

Usage: python scripts/lane_metric_ceiling.py [--data DIR] [--split valid]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from hydranet_tpu.config import load_config  # noqa: E402
from hydranet_tpu.data.dataset import MultitaskDataset  # noqa: E402
from hydranet_tpu.heads import lane_codec as lane_ops  # noqa: E402
from hydranet_tpu.metrics.lane_metric import LaneMetric  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="artifacts/procedural_data")
    ap.add_argument("--split", default="valid")
    ap.add_argument("--config",
                    default="configs/hydranet_convergence_procedural.yml")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    cfg = load_config(os.path.join(REPO, args.config))
    h, w = cfg.input_hw
    fh, fw = cfg.lane_feat_hw
    ppl = cfg.lane_points_per_line
    cl = cfg.lane

    codec = lane_ops.LaneCodec(
        input_width=w, input_height=h, anchor_stride=cl.anchor_stride,
        points_per_line=ppl, do_interpolate=cl.interpolate,
        anchor_lane_num=cl.anchor_lane_num,
        scale_invariance=cl.scale_invariance)

    def decode_one(cls_i, loc_i):
        lanes = lane_ops.decode_lanes(
            cls_i, loc_i, feature_height=fh, feature_width=fw,
            points_per_line=ppl, interval=h / ppl,
            stride=cl.anchor_stride, input_width=w, input_height=h,
            scale_invariance=cl.scale_invariance, exist_threshold=0.5)
        return lane_ops.lane_nms(lanes, thresh=100, top_k=cl.pre_nms_top_k,
                                 max_lanes=cl.max_lanes)

    decode = jax.jit(decode_one)
    metric = LaneMetric(method="f1_measure", iou_thresh=0.5, lane_width=30)

    names = [ln.strip() for ln in
             open(os.path.join(args.data, "list", f"{args.split}.txt"))]
    if args.limit:
        names = names[:args.limit]
    results = []
    for name in names:
        img_path = name  # list entries are repo-relative paths
        stem = os.path.splitext(os.path.basename(name))[0]
        lane_path = os.path.join(args.data, "labels_lane", stem + ".json")
        im = cv2.imread(img_path)
        oh, ow = im.shape[:2]
        gt = MultitaskDataset.parse_own_label(json.load(open(lane_path)))
        gt_type, gt_loc = codec.encode_lane(gt, ow, oh)
        if cl.scale_invariance:  # dataset.py:160-164 normalizes by interval
            gt_loc = gt_loc.copy()
            gt_loc[:, ppl + 2: 2 * ppl + 2] /= codec.interval
            gt_loc[:, :ppl] /= codec.interval

        lanes = decode(np.asarray(gt_type), np.asarray(gt_loc))
        lines = lane_ops.lanes_to_points(
            lanes, input_height=h, interval=h / ppl,
            scale_x=ow / w, scale_y=oh / h)
        shape = {"width": ow, "height": oh}
        results.append(dict(pr_result={"Lines": lines, "Shape": shape},
                            gt_result={**gt, "Shape": shape}))
    metric(output=results)
    f1 = metric.summary()
    print(f"{args.split}: {len(names)} images, GT-roundtrip lane F1 ceiling "
          f"= {f1:.4f}")


if __name__ == "__main__":
    main()
