"""Heads can be toggled off independently (reference train.train_detect/
train_seg/train_lane flags, model.py:69-154 — the reason its DDP needed
find_unused_parameters). Covers BASELINE configs 1 (seg-only) and 2
(det-only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.config import Config
from hydranet_tpu.models.hydranet import HydraNet
from tests.test_hydranet import small_config


@pytest.mark.parametrize("detect,seg,lane", [
    (False, True, False),   # config 1: backbone + seg head
    (True, False, False),   # config 2: backbone + det head
    (False, False, True),
    (True, True, False),
])
def test_head_subsets(detect, seg, lane):
    d = small_config().to_dict()
    d["train"].update(dict(train_detect=detect, train_seg=seg,
                           train_lane=lane))
    cfg = Config.from_dict(d)
    model = HydraNet(cfg=cfg)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 128, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert ("seg" in out) == seg
    assert ("detection" in out) == detect
    assert ("lane" in out) == lane
    # only the enabled heads own parameters
    assert ("segheader" in variables["params"]) == seg
    assert ("detectheader" in variables["params"]) == detect
    assert ("laneheader" in variables["params"]) == lane

    batch = {}
    if seg:
        batch["gt_seg"] = jnp.zeros((1, 128, 128), jnp.int32)
    if detect:
        batch["gt_det"] = jnp.asarray(
            [[[10, 10, 60, 60, 1]]], dtype=jnp.float32)
    if lane:
        n = (128 // 32) ** 2
        ppl = 128 // 8
        gt_cls = np.zeros((1, n, 2), np.float32)
        gt_cls[..., 0] = 1
        gt_cls[0, :3, 1] = 1
        gt_cls[0, :3, 0] = 0
        batch["gt_cls"] = jnp.asarray(gt_cls)
        batch["gt_loc"] = jnp.ones((1, n, 2 * ppl + 2), jnp.float32)
    losses = model.compute_losses(out, batch)
    total = model.total_loss(losses)
    assert np.isfinite(float(total))
