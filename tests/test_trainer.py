"""Trainer: masked fine-tuning updates, checkpoint roundtrip, eval decode."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.config import Config
from hydranet_tpu.models.hydranet import HydraNet
from hydranet_tpu.parallel.mesh import make_mesh
from hydranet_tpu.parallel.train_step import (
    TrainState, all_trainable, head_mask, make_train_step)
from hydranet_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from hydranet_tpu.train.optimizer import cosine_annealing_lr, make_optimizer
from tests.test_hydranet import small_config


def _tiny_batch(rng, b=2, hw=128):
    n = (hw // 32) ** 2
    ppl = hw // 8
    gt_cls = np.zeros((b, n, 2), np.float32)
    fg = rng.rand(b, n) > 0.8
    gt_cls[..., 1] = fg
    gt_cls[..., 0] = ~fg
    ann = -np.ones((b, 4, 5), np.float32)
    ann[:, 0] = [10, 10, 60, 70, 1]
    return {
        "image": jnp.asarray(rng.randn(b, hw, hw, 3).astype(np.float32)),
        "gt_seg": jnp.asarray(rng.randint(0, 3, (b, hw, hw))),
        "gt_det": jnp.asarray(ann),
        "gt_cls": jnp.asarray(gt_cls),
        "gt_loc": jnp.asarray(
            rng.randn(b, n, 2 * ppl + 2).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = small_config()
    model = HydraNet(cfg=cfg)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])
    tx = make_optimizer(1e-3, 1e-8, total_iters=100)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, mesh=None, donate=False)
    return model, tx, state, step, batch


def test_train_step_decreases_loss(setup):
    model, tx, state, step, batch = setup
    losses0 = None
    for i in range(4):
        state, losses = step(state, batch, all_trainable(state.params))
        if losses0 is None:
            losses0 = losses
    assert float(losses["total_loss"]) < float(losses0["total_loss"])
    assert int(state.step) == 4


def test_head_mask_freezes_other_params(setup):
    model, tx, state, step, batch = setup
    mask = head_mask(state.params, "laneheader")
    new_state, _ = step(state, batch, mask)

    def max_delta(tree_a, tree_b):
        leaves = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), tree_a, tree_b)
        return max(jax.tree_util.tree_leaves(leaves), default=0.0)

    assert max_delta(new_state.params["backbone"],
                     state.params["backbone"]) == 0.0
    assert max_delta(new_state.params["segheader"],
                     state.params["segheader"]) == 0.0
    assert max_delta(new_state.params["laneheader"],
                     state.params["laneheader"]) > 0.0
    # optimizer moments of frozen params untouched (torch param-group
    # semantics, train.py:477-482)
    adam_new = new_state.opt_state[1]
    adam_old = state.opt_state[1]
    assert max_delta(adam_new.mu["backbone"], adam_old.mu["backbone"]) == 0.0
    assert max_delta(adam_new.mu["laneheader"],
                     adam_old.mu["laneheader"]) > 0.0


def test_cosine_schedule_matches_torch():
    import torch

    lr0, T = 1e-3, 50
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T, eta_min=1e-8)
    ours = cosine_annealing_lr(lr0, T, eta_min=1e-8)
    for t in range(T):
        want = opt.param_groups[0]["lr"]
        got = float(ours(t))
        np.testing.assert_allclose(got, want, rtol=1e-5)
        opt.step()
        sched.step()


def test_checkpoint_roundtrip(tmp_path, setup):
    model, tx, state, step, batch = setup
    state2, _ = step(state, batch, all_trainable(state.params))
    path = save_checkpoint(str(tmp_path), 0, state2)
    assert os.path.exists(path)
    restored = restore_checkpoint(path, target=jax.device_get(state2))
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
