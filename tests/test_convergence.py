"""Training convergence: overfitting a single synthetic batch must drive
every task loss down substantially — end-to-end proof that gradients,
losses, the optimizer, and BN statistics cooperate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.models.hydranet import HydraNet
from hydranet_tpu.parallel.train_step import (
    TrainState, all_trainable, make_train_step)
from hydranet_tpu.train.optimizer import make_optimizer
from tests.test_hydranet import small_config
from tests.test_trainer import _tiny_batch


@pytest.mark.slow
def test_overfit_single_batch():
    cfg = small_config()
    model = HydraNet(cfg=cfg)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng, b=2)

    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])
    tx = make_optimizer(3e-4, 0.0, total_iters=10000)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, mesh=None, donate=False)
    mask = all_trainable(state.params)

    first = None
    losses = None
    for i in range(40):
        state, losses = step(state, batch, mask)
        if first is None:
            first = {k: float(v) for k, v in losses.items()}
    last = {k: float(v) for k, v in losses.items()}

    # detection focal cls starts huge (every random anchor is a confident
    # negative) and decays slowly; the other losses should collapse fast.
    assert last["total_loss"] < 0.8 * first["total_loss"], (first, last)
    assert last["loss_lane_cls_neg"] < 0.3 * first["loss_lane_cls_neg"]
    assert last["loss_det_reg"] < 0.3 * first["loss_det_reg"]
    assert last["loss_seg"] < first["loss_seg"]
    assert last["loss_det_cls"] < first["loss_det_cls"]
    assert all(np.isfinite(v) for v in last.values())
