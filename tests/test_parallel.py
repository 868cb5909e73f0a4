"""Data parallelism over the 8-device virtual CPU mesh: the sharded train
step must produce the same result as the single-device step (XLA inserts the
gradient psum — the reference's DDP allreduce equivalent, train.py:129-137)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.models.hydranet import HydraNet
from hydranet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from hydranet_tpu.parallel.train_step import (
    TrainState, all_trainable, make_train_step)
from hydranet_tpu.train.optimizer import make_optimizer
from tests.test_hydranet import small_config
from tests.test_trainer import _tiny_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_sharded_step_matches_single_device():
    cfg = small_config()
    model = HydraNet(cfg=cfg)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng, b=8)

    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])
    tx = make_optimizer(1e-3, 1e-8, total_iters=100)

    def fresh_state():
        return TrainState(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tx.init(variables["params"]),
                          step=jnp.zeros((), jnp.int32))

    mask = all_trainable(variables["params"])

    # single device
    step1 = make_train_step(model, tx, mesh=None, donate=False)
    s1, l1 = step1(fresh_state(), batch, mask)

    # 8-device mesh, batch sharded
    mesh = make_mesh()
    stepN = make_train_step(model, tx, mesh=mesh, donate=False)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh))
    state = jax.device_put(fresh_state(), replicated(mesh))
    maskN = jax.device_put(mask, replicated(mesh))
    sN, lN = stepN(state, sharded_batch, maskN)

    for k in l1:
        np.testing.assert_allclose(float(lN[k]), float(l1[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    # parameters after the update agree. The cross-device psum reassociates
    # the gradient sum; Adam's m/(sqrt(v)+eps) can amplify an epsilon-sized
    # gradient difference up to a full step, so the bound is 2*lr per param.
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flatN = jax.tree_util.tree_leaves(sN.params)
    for a, b in zip(flat1, flatN):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2.5e-3)


def test_eval_step_sharded():
    from hydranet_tpu.parallel.train_step import make_eval_step

    cfg = small_config()
    model = HydraNet(cfg=cfg)
    rng = np.random.RandomState(1)
    batch = _tiny_batch(rng, b=8)
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])

    mesh = make_mesh()
    evalN = make_eval_step(model, mesh=mesh)
    sharded = jax.device_put(batch, batch_sharding(mesh))
    out, losses = evalN(jax.device_put(variables["params"], replicated(mesh)),
                        jax.device_put(variables["batch_stats"],
                                       replicated(mesh)),
                        sharded)
    assert out["seg"].shape[0] == 8
    assert np.isfinite(float(losses["total_loss"]))
