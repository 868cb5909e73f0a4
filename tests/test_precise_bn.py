"""Precise-BN: population-stat re-estimation before eval.

The neck/det-head BNs run torch momentum 0.01 (reference
/root/reference/model/net/common.py:98), so on short runs their EMA running
stats sit near the (0,1) init and eval-mode forward collapses while
train-mode is fine (diagnosed on the round-3 convergence runs: train-mode
lane prob 0.69 vs eval-mode 0.002). Precise-BN recomputes population stats
over K batches right before validation; these tests pin its math.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hydranet_tpu.ops.common import TorchBatchNorm
from hydranet_tpu.parallel.train_step import (
    make_precise_bn_step, merge_precise_bn, run_precise_bn)


class TinyNet(nn.Module):
    """Two stacked BN+conv blocks, torch momentum 0.01 like the neck."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), padding="SAME", name="c1")(x)
        x = TorchBatchNorm(momentum=0.01, epsilon=1e-3, name="b1")(x, train)
        x = nn.relu(x)
        x = nn.Conv(4, (3, 3), padding="SAME", name="c2")(x)
        x = TorchBatchNorm(momentum=0.01, epsilon=1e-3, name="b2")(x, train)
        return x


def _batches(key, n, shape):
    keys = jax.random.split(key, n)
    # deliberately far from N(0,1) so stale init stats are visibly wrong
    return [3.0 + 2.0 * jax.random.normal(k, shape) for k in keys]


def test_precise_bn_matches_population_stats():
    model = TinyNet()
    key = jax.random.PRNGKey(0)
    images = _batches(key, 4, (2, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(1), images[0])
    params, bs = variables["params"], variables["batch_stats"]

    step = make_precise_bn_step(model)
    new_bs = run_precise_bn(step, params, bs, images)

    # Oracle for the FIRST BN: its input is conv c1 of the pooled batches
    # (independent of BN state), so the population stats are directly
    # computable.
    c1 = nn.Conv(8, (3, 3), padding="SAME")
    pooled = jnp.concatenate(
        [c1.apply({"params": params["c1"]}, im) for im in images], axis=0)
    want_mean = jnp.mean(pooled, axis=(0, 1, 2))
    want_var = jnp.var(pooled, axis=(0, 1, 2))
    np.testing.assert_allclose(new_bs["b1"]["bn"]["mean"], want_mean,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(new_bs["b1"]["bn"]["var"], want_var,
                               rtol=1e-4, atol=1e-5)
    # second BN's stats moved off init too
    assert float(jnp.max(jnp.abs(new_bs["b2"]["bn"]["mean"]))) > 1e-3

    # eval-mode forward with precise stats ~= train-mode forward on a fresh
    # batch from the same distribution (the whole point of the exercise);
    # with the STALE init stats it is far off.
    probe = 3.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 3))
    train_out = model.apply({"params": params, "batch_stats": bs}, probe,
                            train=True, mutable=["batch_stats"])[0]
    eval_precise = model.apply({"params": params, "batch_stats": new_bs},
                               probe, train=False)
    eval_stale = model.apply({"params": params, "batch_stats": bs}, probe,
                             train=False)
    err_precise = float(jnp.mean(jnp.abs(eval_precise - train_out)))
    err_stale = float(jnp.mean(jnp.abs(eval_stale - train_out)))
    assert err_precise < 0.1 * err_stale, (err_precise, err_stale)


def test_merge_preserves_structure_and_untouched_leaves():
    model = TinyNet()
    im = jnp.ones((2, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), im)
    params, bs = variables["params"], variables["batch_stats"]
    _, muts = model.apply({"params": params, "batch_stats": bs}, im,
                          train=True, mutable=["batch_stats", "bn_stats"])
    merged = merge_precise_bn(bs, muts["bn_stats"])
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(bs)
    # single batch: merged stats == that batch's own statistics of c1's out
    c1 = nn.Conv(8, (3, 3), padding="SAME")
    y = c1.apply({"params": params["c1"]}, im)
    np.testing.assert_allclose(merged["b1"]["bn"]["mean"],
                               jnp.mean(y, axis=(0, 1, 2)), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(merged["b1"]["bn"]["var"],
                               jnp.var(y, axis=(0, 1, 2)), rtol=1e-4,
                               atol=1e-6)
