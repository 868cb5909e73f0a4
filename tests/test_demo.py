"""Demo CLI (hydranet_tpu/demo.py): image-folder mode end-to-end on CPU,
float and int8-PTQ serving (reference equivalent: model/demo.py image loop,
demo.py:150-261)."""

import os

import cv2
import numpy as np
import pytest
import yaml

from tests.test_hydranet import small_config


@pytest.fixture(scope="module")
def demo_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("demo")
    img_dir = root / "imgs"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    for i in range(3):
        img = rng.randint(0, 255, (128, 128, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"f{i}.jpg"), img)
    cfg_path = root / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(small_config().to_dict(), f)
    return str(cfg_path), str(img_dir), str(root)


def test_demo_images_float(demo_setup):
    from hydranet_tpu.demo import main

    cfg_path, img_dir, root = demo_setup
    out = os.path.join(root, "out_float")
    main(["--config", cfg_path, "--images", img_dir, "--out", out])
    names = sorted(os.listdir(out))
    assert names == ["f0.jpg", "f1.jpg", "f2.jpg"]
    vis = cv2.imread(os.path.join(out, "f0.jpg"))
    assert vis is not None and vis.shape == (128, 128, 3)


def test_demo_images_int8(demo_setup, capsys):
    from hydranet_tpu.demo import main

    cfg_path, img_dir, root = demo_setup
    out = os.path.join(root, "out_int8")
    main(["--config", cfg_path, "--images", img_dir, "--out", out,
          "--quant", "int8", "--calib-frames", "2",
          "--calib-percentile", "99.5"])
    assert sorted(os.listdir(out)) == ["f0.jpg", "f1.jpg", "f2.jpg"]
    captured = capsys.readouterr().out
    assert "int8: calibrated on 2 frame(s) at percentile 99.5" in captured


def _write_video(path, n_frames):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (128, 128))
    rng = np.random.RandomState(1)
    for _ in range(n_frames):
        writer.write(rng.randint(0, 255, (128, 128, 3), np.uint8))
    writer.release()


@pytest.mark.parametrize("quant,n_frames", [
    ("off", 5),
    ("int8", 5),   # calib window (3) shorter than the video
    ("int8", 2),   # video shorter than the calib window
])
def test_demo_video(demo_setup, quant, n_frames, capsys):
    from hydranet_tpu.demo import main

    cfg_path, _, root = demo_setup
    vid_path = os.path.join(root, f"clip_{quant}_{n_frames}.mp4")
    _write_video(vid_path, n_frames)
    out = os.path.join(root, f"out_vid_{quant}_{n_frames}")
    main(["--config", cfg_path, "--video", vid_path, "--out", out,
          "--quant", quant, "--calib-frames", "3"])
    captured = capsys.readouterr().out
    assert f"processed {n_frames} frames" in captured
    result = cv2.VideoCapture(os.path.join(out, os.path.basename(vid_path)))
    assert int(result.get(cv2.CAP_PROP_FRAME_COUNT)) == n_frames
