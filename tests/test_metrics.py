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


def test_coco_image_id_alignment_with_empty_label_file(tmp_path):
    """An empty labels_object txt in the MIDDLE of the val list must not
    shift the GT ids of the images after it. Prediction ids keyed by the
    gen_coco_gt path map score perfectly; the old position-based scheme
    (reference train.py:343 — reproduced in round 2, fixed in round 3)
    misattributes every post-gap prediction and loses AP."""
    from hydranet_tpu.metrics.coco_eval import gen_coco_gt
    from tests.synth_data import make_dataset

    # 0 train / 4 valid images; the 2nd valid image (index 1) has an empty
    # detection label file.
    root = make_dataset(str(tmp_path / "data"), n_train=0, n_valid=4,
                        empty_det=(1,), seed=3)
    gt_ann, image_ids, id_to_path = gen_coco_gt(root)
    # 3 images carry GT; the empty one got no id
    assert len(image_ids) == 3
    path_to_id = {p: i for i, p in id_to_path.items()}

    with open(f"{root}/list/valid.txt") as f:
        val_paths = [l.strip() for l in f]
    assert len(val_paths) == 4

    cats = sorted({a["category_id"] for a in gt_ann})
    gt_by_image = {}
    for a in gt_ann:
        gt_by_image.setdefault(a["image_id"], []).append(a)

    def predictions(id_scheme):
        """Perfect predictions (GT boxes replayed), ids assigned per scheme."""
        preds = []
        for pos, path in enumerate(val_paths):
            true_id = path_to_id.get(path)
            pid = pos + 1 if id_scheme == "position" else true_id
            if pid is None or true_id is None:
                continue
            for a in gt_by_image[true_id]:
                preds.append(dict(image_id=pid, category_id=a["category_id"],
                                  bbox=list(a["bbox"]), score=0.9))
        return preds

    ev = COCOMeanAP(gt_ann, categories=cats, image_ids=image_ids)
    ev.update(predictions("path"))
    assert ev.summarize(verbose=False)["AP"] > 0.99

    ev.reset()
    ev.update(predictions("position"))
    # images 3 and 4 sit at positions 3/4 but carry GT ids 2/3: their
    # predictions land on the wrong images and AP craters
    assert ev.summarize(verbose=False)["AP"] < 0.6


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


# --------------------------------------------------------------------------
# Property test: COCOMeanAP vs a brute-force oracle over random scenes.
# The oracle is an independent, loop-by-loop transliteration of pycocotools'
# published algorithm (cocoeval.py evaluateImg/accumulate), kept deliberately
# slow and literal; COCOMeanAP's vectorized matcher/accumulation must agree
# bit-for-bit on every (area range, maxDets) combination.

def _oracle_match(iou, gt_ignore, thrs):
    """Literal port of the pycocotools evaluateImg matching loop."""
    T, (D, G) = len(thrs), iou.shape
    gtm = -np.ones((T, G), dtype=np.int64)
    dtm = -np.ones((T, D), dtype=np.int64)
    for tind, t in enumerate(thrs):
        for dind in range(D):
            best_iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] >= 0:
                    continue
                if m > -1 and not gt_ignore[m] and gt_ignore[gind]:
                    break
                if iou[dind, gind] < best_iou:
                    continue
                best_iou = iou[dind, gind]
                m = gind
            if m == -1:
                continue
            dtm[tind, dind] = m
            gtm[tind, m] = dind
    return dtm


def _oracle_accumulate(gts, dts, categories, image_ids, max_dets, area_rng):
    from hydranet_tpu.metrics.coco_eval import (IOU_THRS, RECALL_THRS,
                                                box_iou_xywh)

    T = len(IOU_THRS)
    ap = -np.ones((T, len(categories)))
    ar = -np.ones((T, len(categories)))
    for ci, cat in enumerate(categories):
        all_scores, all_m, all_ig = [], [], []
        num_gt = 0
        any_entry = False
        for img in sorted(image_ids):
            g = [a for a in gts if a["image_id"] == img
                 and a["category_id"] == cat]
            d = sorted([a for a in dts if a["image_id"] == img
                        and a["category_id"] == cat],
                       key=lambda x: -x["score"])[:100]
            if not g and not d:
                continue
            any_entry = True
            gb = np.array([a["bbox"] for a in g]).reshape(-1, 4)
            ga = gb[:, 2] * gb[:, 3]
            gig = ~((ga >= area_rng[0]) & (ga <= area_rng[1]))
            order = np.argsort(gig, kind="mergesort")
            gb, gig = gb[order], gig[order]
            db = np.array([a["bbox"] for a in d]).reshape(-1, 4)
            ds = np.array([a["score"] for a in d])
            dtm = _oracle_match(box_iou_xywh(db, gb), gig, IOU_THRS)
            da = db[:, 2] * db[:, 3]
            d_oor = ~((da >= area_rng[0]) & (da <= area_rng[1]))
            dig = np.zeros((T, len(d)), bool)
            for ti in range(T):
                for di in range(len(d)):
                    if dtm[ti, di] >= 0:
                        dig[ti, di] = gig[dtm[ti, di]]
                    elif d_oor[di]:
                        dig[ti, di] = True
            num_gt += int(np.sum(~gig))
            all_scores.append(ds[:max_dets])
            all_m.append((dtm >= 0)[:, :max_dets])
            all_ig.append(dig[:, :max_dets])
        if not any_entry or num_gt == 0:
            continue
        scores = np.concatenate(all_scores)
        order = np.argsort(-scores, kind="mergesort")
        m = np.concatenate(all_m, axis=1)[:, order]
        ig = np.concatenate(all_ig, axis=1)[:, order]
        for ti in range(T):
            tp_list, fp_list = [], []
            tp = fp = 0
            for k in range(m.shape[1]):
                if ig[ti, k]:
                    continue
                tp += int(m[ti, k])
                fp += int(not m[ti, k])
                tp_list.append(tp)
                fp_list.append(fp)
            if not tp_list:
                ap[ti, ci] = 0.0
                ar[ti, ci] = 0.0
                continue
            rc = np.array(tp_list) / num_gt
            pr = np.array(tp_list) / np.maximum(
                np.array(tp_list) + np.array(fp_list), 1e-12)
            ar[ti, ci] = rc[-1]
            for k in range(len(pr) - 1, 0, -1):
                pr[k - 1] = max(pr[k - 1], pr[k])
            inds = np.searchsorted(rc, RECALL_THRS, side="left")
            q = np.zeros(len(RECALL_THRS))
            ok = inds < len(pr)
            q[ok] = pr[inds[ok]]
            ap[ti, ci] = q.mean()
    return ap, ar


def _random_scene(rng):
    """Random GT + detections with deliberate nastiness: score ties, IoU
    ties (duplicate boxes), areas straddling the small/medium/large bounds,
    empty images, detections on GT-less images, crowded clusters."""
    n_img = rng.randint(2, 6)
    cats = list(range(1, rng.randint(2, 4)))
    image_ids = list(range(1, n_img + 1))
    gts, dts = [], []
    aid = 0
    for img in image_ids:
        if rng.rand() < 0.15:
            continue  # image with no GT at all
        for cat in cats:
            for _ in range(rng.randint(0, 5)):
                aid += 1
                # sizes spanning the area-range boundaries (32^2, 96^2)
                s = rng.choice([8, 31, 32, 33, 95, 96, 97, 150])
                x, y = rng.randint(0, 500), rng.randint(0, 500)
                gts.append(dict(image_id=img, category_id=cat, id=aid,
                                bbox=[float(x), float(y), float(s),
                                      float(s + rng.randint(0, 3))],
                                iscrowd=0))
    for img in image_ids:
        for cat in cats:
            for _ in range(rng.randint(0, 7)):
                if gts and rng.rand() < 0.5:
                    # jittered (sometimes identical) copy of a random GT box
                    g = gts[rng.randint(len(gts))]
                    j = rng.choice([0.0, 0.0, 2.0, 8.0])
                    bbox = [g["bbox"][0] + j * rng.randn(),
                            g["bbox"][1] + j * rng.randn(),
                            max(1.0, g["bbox"][2] + j * rng.randn()),
                            max(1.0, g["bbox"][3] + j * rng.randn())]
                else:
                    s = rng.choice([10, 32, 60, 96, 140])
                    bbox = [float(rng.randint(0, 500)),
                            float(rng.randint(0, 500)), float(s), float(s)]
                # quantized scores force ties through the mergesort path
                score = round(rng.rand(), 1)
                dts.append(dict(image_id=img, category_id=cat,
                                bbox=[float(v) for v in bbox], score=score))
    return gts, dts, cats, image_ids


@pytest.mark.slow
def test_coco_map_property_vs_oracle():
    from hydranet_tpu.metrics.coco_eval import AREA_RANGES, COCOMeanAP

    rng = np.random.RandomState(0)
    for scene in range(50):
        gts, dts, cats, image_ids = _random_scene(rng)
        ev = COCOMeanAP(gts, categories=cats, image_ids=image_ids)
        ev.update(dts)
        for area, rng_a in AREA_RANGES.items():
            for md in (1, 10, 100):
                ap, ar = ev._accumulate(md, area)
                oap, oar = _oracle_accumulate(gts, dts, cats, image_ids,
                                              md, rng_a)
                np.testing.assert_allclose(ap, oap, atol=1e-12,
                                           err_msg=f"AP scene={scene} "
                                                   f"area={area} maxDets={md}")
                np.testing.assert_allclose(ar, oar, atol=1e-12,
                                           err_msg=f"AR scene={scene} "
                                                   f"area={area} maxDets={md}")
