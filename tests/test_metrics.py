"""Metrics: streaming IoU parity vs reference, COCO mAP sanity, lane F1."""

import numpy as np
import pytest
import torch

import tests.ref_compat as rc
from hydranet_tpu.metrics.coco_eval import COCOMeanAP
from hydranet_tpu.metrics.lane_metric import LaneMetric
from hydranet_tpu.metrics.seg_metrics import IntersectionOverUnion


def test_iou_matches_reference():
    rc.install()
    from head_seg.seg_metrics import IntersectionOverUnion as RefIoU

    rng = np.random.RandomState(0)
    ours = IntersectionOverUnion(n_classes=5)
    ref = RefIoU(n_classes=5)
    for _ in range(3):
        pred = rng.randint(0, 5, (1, 32, 32))
        tgt = rng.randint(0, 5, (1, 32, 32))
        ours.update(pred, tgt)
        ref.update(torch.from_numpy(pred), torch.from_numpy(tgt))
    np.testing.assert_allclose(ours.compute(), ref.compute().numpy(),
                               rtol=1e-6)


def test_coco_map_perfect_and_miss():
    gt = [
        dict(image_id=1, category_id=1, bbox=[10, 10, 40, 40], id=1, iscrowd=0),
        dict(image_id=1, category_id=2, bbox=[60, 60, 30, 30], id=2, iscrowd=0),
        dict(image_id=2, category_id=1, bbox=[5, 5, 50, 50], id=3, iscrowd=0),
    ]
    ev = COCOMeanAP(gt, categories=[1, 2], image_ids=[1, 2])
    # perfect predictions
    ev.update([
        dict(image_id=1, category_id=1, bbox=[10, 10, 40, 40], score=0.9),
        dict(image_id=1, category_id=2, bbox=[60, 60, 30, 30], score=0.8),
        dict(image_id=2, category_id=1, bbox=[5, 5, 50, 50], score=0.95),
    ])
    res = ev.summarize(verbose=False)
    assert res["AP"] > 0.99
    assert res["AP50"] > 0.99

    # complete misses
    ev.reset()
    ev.update([
        dict(image_id=1, category_id=1, bbox=[200, 200, 10, 10], score=0.9)])
    res = ev.summarize(verbose=False)
    assert res["AP"] == 0.0


def test_coco_map_half_recall():
    gt = [dict(image_id=1, category_id=1, bbox=[10, 10, 40, 40], id=1,
               iscrowd=0),
          dict(image_id=1, category_id=1, bbox=[100, 100, 40, 40], id=2,
               iscrowd=0)]
    ev = COCOMeanAP(gt, categories=[1], image_ids=[1])
    ev.update([dict(image_id=1, category_id=1, bbox=[10, 10, 40, 40],
                    score=0.9)])
    res = ev.summarize(verbose=False)
    # one of two boxes found with perfect precision -> AP ~ 0.5
    assert 0.45 < res["AP50"] < 0.55


def test_lane_metric_parity_with_reference():
    rc.install()
    from head_lane.lane_metric import LaneMetric as RefMetric

    rng = np.random.RandomState(2)
    shape = dict(width=320, height=240, channel=3)

    def mk_lane(x0, slope):
        return [dict(x=float(x0 + slope * t), y=float(239 - t * 30))
                for t in range(6)]

    pairs = []
    for i in range(4):
        gt_lanes = [mk_lane(60 + 40 * k, rng.uniform(-1, 1))
                    for k in range(2)]
        pr = [dict(score=0.9, points=gt_lanes[0])]  # hit one, miss one
        if i % 2 == 0:
            pr.append(dict(score=0.7, points=mk_lane(300, 2.0)))  # spurious
        pairs.append(dict(
            gt_result=dict(Lines=gt_lanes, Labels=["l"] * 2, Shape=shape),
            pr_result=dict(Lines=pr, Shape=shape)))

    ours = LaneMetric(method="f1_measure", iou_thresh=0.5, lane_width=30,
                      thresh_list=[0.5])
    ref = RefMetric(method="f1_measure", iou_thresh=0.5, lane_width=30,
                    thresh_list=[0.5])
    ours.reset()
    [h.reset() for h in ref.metric_handlers]
    ours(output=pairs)
    ref(output=pairs)
    np.testing.assert_allclose(ours.summary(), ref.summary(), rtol=1e-6)


def test_lane_ordering():
    from hydranet_tpu.heads.lane_ordering import order_lanes_x_axis

    def lane(x_bottom, slope):
        return dict(score=0.9, points=[
            dict(x=x_bottom + slope * t, y=200 - t * 20) for t in range(5)])

    # reference slope convention (lane_codec_utils.py:100-124): as y
    # decreases going up, a LEFT lane's x increases toward the center
    # (k = dx/dy < 0); a RIGHT lane's decreases (k > 0).
    lanes = [lane(250, -2.0), lane(50, 2.0)]
    ordered = order_lanes_x_axis(lanes, height=201)
    xs = [l["points"][0]["x"] for l in ordered]
    assert xs == sorted(xs)
    idxs = [l["idx"] for l in ordered]
    assert idxs == [-1, 1]


def test_write_coco_gt_json(tmp_path):
    import json
    import sys

    sys.path.insert(0, "tests")
    from synth_data import make_dataset

    from hydranet_tpu.metrics.coco_eval import write_coco_gt_json

    root = make_dataset(str(tmp_path / "d"), n_train=2, n_valid=2)
    p = write_coco_gt_json(root, class_names=["a", "b", "c", "d"])
    with open(p) as f:
        ds = json.load(f)
    assert set(ds) >= {"info", "images", "annotations", "categories"}
    assert len(ds["categories"]) == 4 and ds["categories"][0]["id"] == 1
    assert ds["images"] and ds["images"][0]["height"] == 480
    ann = ds["annotations"][0]
    assert set(ann) == {"segmentation", "iscrowd", "area", "image_id",
                        "bbox", "category_id", "id"}
    # idempotent: existing file is reused (reference behavior)
    assert write_coco_gt_json(root) == p
