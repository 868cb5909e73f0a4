"""Dataset, augmentation, and loader tests on a synthetic on-disk dataset."""

import numpy as np
import pytest

from hydranet_tpu.config import Config
from hydranet_tpu.data.augment import augment_sample, cal_split
from hydranet_tpu.data.dataset import MultitaskDataset
from hydranet_tpu.data.loader import DataLoader
from tests.synth_data import make_dataset
from tests.test_hydranet import small_config


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_dataset(str(root))


@pytest.fixture(scope="module")
def cfg(data_root) -> Config:
    c = small_config()
    d = c.to_dict()
    d["dataloader"]["data_list"] = f"{data_root}/list"
    d["dataloader"]["with_aug"] = True
    return Config.from_dict(d)


def test_dataset_sample_shapes(cfg):
    ds = MultitaskDataset(cfg, mode="train", seed=0)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (128, 128, 3)
    assert s["image"].dtype == np.float32
    n = (128 // 32) ** 2
    ppl = 128 // 8
    assert s["gt_cls"].shape == (n, 2)
    assert s["gt_loc"].shape == (n, 2 * ppl + 2)
    assert s["gt_seg"].shape == (480, 640)  # original-size mask
    assert s["gt_det"].shape[1] == 5
    # class-1 annotations become 0-based
    assert s["gt_det"][:, 4].min() >= 0


def test_loader_batches(cfg):
    ds = MultitaskDataset(cfg, mode="val")
    dl = DataLoader(ds, batch_size=2, max_annotations=16)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (2, 128, 128, 3)
    assert b["gt_seg"].shape == (2, 128, 128)
    assert b["gt_det"].shape == (2, 16, 5)
    # padded rows are -1 (reference Collater semantics, dataloader.py:593)
    counts = (b["gt_det"][:, :, 4] >= 0).sum(axis=1)
    assert (counts >= 1).all()
    # annotations scaled to net-input pixels
    valid_boxes = b["gt_det"][b["gt_det"][:, :, 4] >= 0]
    assert valid_boxes[:, :4].max() <= 128.0 + 1e-5


def test_augment_consistency():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 200, 3), np.uint8)
    seg = rng.randint(0, 3, (100, 200)).astype(np.uint8)
    det = np.array([[20.0, 20.0, 80.0, 70.0, 1.0]])
    lane = {"Lines": [[{"x": 50.0, "y": 90.0}, {"x": 60.0, "y": 50.0}]],
            "Labels": ["l"]}
    for seed in range(8):
        out = augment_sample(img, lane_label=lane, det_label=det,
                             seg_label=seg, rng=np.random.RandomState(seed))
        assert out["image"].shape == img.shape
        assert out["seg_label"].shape == seg.shape
        assert out["det_label"].shape[1] == 5
        if len(out["det_label"]):
            b = out["det_label"]
            assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
            assert b[:, :4].min() >= 0
        assert len(out["lane_label"]["Lines"]) == 1


def test_cal_split():
    h, w = 100, 200
    # one left lane (negative slope in flipped coords) + one right
    lane = {"Lines": [
        [{"x": 40, "y": 90}, {"x": 80, "y": 30}],   # leans right going up
        [{"x": 160, "y": 90}, {"x": 120, "y": 30}],  # leans left going up
    ]}
    ok, ratio = cal_split(lane, w, h)
    assert ok
    assert 0 < ratio < 1

    # all slopes one sign -> no split
    lane2 = {"Lines": [
        [{"x": 40, "y": 90}, {"x": 80, "y": 30}],
        [{"x": 60, "y": 90}, {"x": 100, "y": 30}],
    ]}
    ok2, _ = cal_split(lane2, w, h)
    assert not ok2
