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
    # mask is original-size, or already net-size when a geometric aug fired
    # (fused warp+resize fast path)
    assert s["gt_seg"].shape in ((480, 640), (128, 128))
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


def _batches_equal(a, b):
    assert set(a.keys()) == set(b.keys())
    for k in a:
        if isinstance(a[k], np.ndarray):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        else:
            assert a[k] == b[k], k


def test_multiworker_determinism(cfg):
    """Worker-pool batches are bit-identical to inline batches: augmentation
    RNG is keyed on (seed, epoch, dataset index), not on the worker."""
    ds = MultitaskDataset(cfg, mode="train", seed=0)
    inline = DataLoader(ds, batch_size=2, shuffle=True, max_annotations=16,
                        num_workers=0, num_prefetch=0, seed=7)
    pooled = DataLoader(ds, batch_size=2, shuffle=True, max_annotations=16,
                        num_workers=3, seed=7)
    try:
        for epoch in range(2):  # epoch advance must stay in sync too
            got_inline = list(inline)
            got_pooled = list(pooled)
            assert len(got_inline) == len(got_pooled) == 2
            for bi, bp in zip(got_inline, got_pooled):
                _batches_equal(bi, bp)
    finally:
        pooled.shutdown()


def test_multiworker_shm_transport(cfg, monkeypatch):
    """Force every array through the shared-memory path (threshold 1 byte)
    and check batches still round-trip exactly."""
    import hydranet_tpu.data.loader as loader_mod

    monkeypatch.setattr(loader_mod, "_SHM_THRESHOLD_BYTES", 1)
    ds = MultitaskDataset(cfg, mode="val")
    ref = list(DataLoader(ds, batch_size=2, max_annotations=16,
                          num_workers=0, num_prefetch=0))
    dl = DataLoader(ds, batch_size=2, max_annotations=16, num_workers=2)
    try:
        got = list(dl)
    finally:
        dl.shutdown()
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        _batches_equal(a, b)


def test_multiworker_error_propagates(cfg):
    ds = MultitaskDataset(cfg, mode="val")
    ds.pairs[0]["image_path"] = "/nonexistent/does_not_exist.jpg"
    dl = DataLoader(ds, batch_size=2, max_annotations=16, num_workers=2)
    try:
        with pytest.raises(RuntimeError, match="DataLoader worker failed"):
            list(dl)
    finally:
        dl.shutdown()


def test_fast_decode(cfg):
    """Reduced-resolution JPEG decode keeps shapes/encodings consistent:
    net-input image identical in shape, lane GT grids identical in shape,
    det boxes scaled into the same net-pixel space."""
    d = cfg.to_dict()
    d["dataloader"]["with_aug"] = False
    slow = MultitaskDataset(Config.from_dict(d), mode="train", seed=0)
    d["dataloader"]["fast_decode"] = True
    fast = MultitaskDataset(Config.from_dict(d), mode="train", seed=0)

    a, b = slow[0], fast[0]
    # synthetic sources are 640x480 (<2x the 128 net input in no dim? they
    # ARE >=2x 128) — reduced decode should engage
    assert b["src_image_shape"]["width"] in (320, 640)
    assert a["image"].shape == b["image"].shape
    assert a["gt_cls"].shape == b["gt_cls"].shape
    assert a["gt_loc"].shape == b["gt_loc"].shape
    # lane/det encodings are in net-normalized space: near-identical values
    np.testing.assert_allclose(a["gt_cls"], b["gt_cls"])
    # det boxes in image coords scale with the decode ratio
    ra = a["gt_det"][:, :4] / max(a["src_image_shape"]["width"], 1)
    rb = b["gt_det"][:, :4] / max(b["src_image_shape"]["width"], 1)
    np.testing.assert_allclose(ra, rb, atol=0.01)


def test_color_luts_exact():
    """The contrast/multiply LUTs must be bit-identical to the float
    round-trip clip+truncate they replace — in particular dark pixels under
    1.5x contrast clip to 0 (convertScaleAbs reflected them to gray)."""
    from hydranet_tpu.data.augment import _CONTRAST_LUT_15, _mult_lut

    v = np.arange(256, dtype=np.float32)
    expect = np.clip(127.5 + 1.5 * (v - 127.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(_CONTRAST_LUT_15, expect)
    assert _CONTRAST_LUT_15[0] == 0 and _CONTRAST_LUT_15[10] == 0

    for alpha in [0.8, 0.9537, 1.0, 1.2]:
        expect = np.clip(v * np.float32(alpha), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(_mult_lut(alpha), expect)


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


def test_sharded_loader_partitions(cfg):
    """Multi-host sharding: shards are disjoint, cover the epoch, and follow
    the same shared permutation on every rank (DistributedSampler role)."""
    ds = MultitaskDataset(cfg, mode="train", seed=0)
    paths = []
    for rank in range(2):
        dl = DataLoader(ds, batch_size=1, shuffle=True, max_annotations=16,
                        num_prefetch=0, seed=5, shard_rank=rank,
                        shard_count=2)
        got = [b["src_image_path"][0] for b in dl]
        assert len(got) == len(dl)
        paths.append(got)
    joint = paths[0] + paths[1]
    assert len(set(joint)) == len(ds)  # disjoint + complete cover

    # different epochs reshuffle consistently across ranks
    dl0 = DataLoader(ds, batch_size=1, shuffle=True, num_prefetch=0, seed=5,
                     shard_rank=0, shard_count=2)
    e0 = [b["src_image_path"][0] for b in dl0]
    e1 = [b["src_image_path"][0] for b in dl0]
    assert e0 != e1 or len(ds) <= 2

    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=1, shard_rank=2, shard_count=2)


def test_pool_abandoned_iterator_is_drained(cfg):
    """Breaking out of a pooled epoch must not leak this epoch's results
    into the next one (batch ids restart at 0 per epoch)."""
    ds = MultitaskDataset(cfg, mode="train", seed=0)
    dl = DataLoader(ds, batch_size=1, shuffle=True, max_annotations=16,
                    num_workers=2, seed=11)
    ref = DataLoader(ds, batch_size=1, shuffle=True, max_annotations=16,
                     num_workers=0, num_prefetch=0, seed=11)
    try:
        it = iter(dl)
        next(it)          # take one batch...
        it.close()        # ...abandon the epoch
        ref_it = iter(ref)
        next(ref_it)
        ref_it.close()
        # second epoch must match the inline loader's second epoch exactly
        for a, b in zip(ref, dl):
            _batches_equal(a, b)
    finally:
        dl.shutdown()


def test_exif_orientation_applied(tmp_path):
    """load_image_file must undo the EXIF Orientation tag — equivalent of
    the reference's exif_transpose (utility.py:49-96): a camera that
    stores the sensor image rotated must come back upright."""
    from PIL import Image

    from hydranet_tpu.data.utility import exif_transpose, load_image_file

    rng = np.random.RandomState(3)
    stored = rng.randint(0, 255, (32, 48, 3), np.uint8)

    for orientation in range(1, 9):
        p = tmp_path / f"o{orientation}.png"  # png: lossless, keeps exif
        exif = Image.Exif()
        exif[274] = orientation
        Image.fromarray(stored).save(p, exif=exif)

        got = load_image_file(str(p))
        want = exif_transpose(stored, orientation)
        assert got.shape == want.shape, orientation
        np.testing.assert_array_equal(got, want)

    # orientation 6 (the common "camera held vertically" case) is a
    # clockwise quarter turn: stored top-right corner becomes top-left
    want6 = exif_transpose(stored, 6)
    assert want6.shape == (48, 32, 3)
    np.testing.assert_array_equal(want6[0, 0], stored[-1, 0])
