"""Sharded train/eval steps.

One jitted XLA program per step: forward (+BN stat update) -> multitask loss
-> backward -> masked optimizer update. Data parallelism comes from sharding
annotations (batch on the "data" mesh axis, params replicated); XLA's SPMD
partitioner inserts the gradient psum over ICI — the TPU-native equivalent of
the reference's DDP allreduce (/root/reference/model/train.py:129-137,
241-267).

The `trainable_mask` input (a {0,1} pytree mirroring params) reproduces the
reference's per-head fine-tuning schedule (train.py:460-508, which swaps
optimizer param groups): masked-out parameters receive zero update AND keep
their optimizer moments frozen, exactly like a param absent from a torch
optimizer group. The mask is a traced input, so switching phase does not
recompile.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _mask_param_subtrees(new_tree: Any, old_tree: Any, params_def,
                         mask: Any) -> Any:
    """Wherever `new_tree` contains a subtree structured like the param tree
    (e.g. Adam mu/nu), revert masked-out leaves to their `old_tree` values.
    Non-param-shaped leaves (e.g. step counts) pass through unchanged."""

    def is_param_subtree(x) -> bool:
        return jax.tree_util.tree_structure(x) == params_def

    def combine(new_sub, old_sub):
        if is_param_subtree(new_sub):
            return jax.tree_util.tree_map(
                lambda n, o, m: jnp.where(jnp.asarray(m, bool), n, o),
                new_sub, old_sub, mask)
        return new_sub

    return jax.tree_util.tree_map(combine, new_tree, old_tree,
                                  is_leaf=is_param_subtree)


def all_trainable(params: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: 1.0, params)


def head_mask(params: Any, head: str) -> Any:
    """Mask selecting a single top-level module (e.g. 'laneheader') —
    equivalent of trainer.optimizer.param_groups[0]['params'] =
    hydranet.<head>.parameters() (train.py:477-508)."""
    return {k: jax.tree_util.tree_map(lambda _: 1.0 if k == head else 0.0, v)
            for k, v in params.items()}


def make_train_step(model, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True) -> Callable:
    """Build the jitted train step for `model` (HydraNet: apply /
    compute_losses / total_loss) under optimizer `tx`."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                trainable_mask: Any
                ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        params_def = jax.tree_util.tree_structure(state.params)

        def loss_fn(params):
            outputs, mutations = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"])
            losses = model.compute_losses(outputs, batch)
            total = model.total_loss(losses)
            return total, (losses, mutations["batch_stats"])

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        grads = jax.tree_util.tree_map(
            lambda g, m: g * jnp.asarray(m, g.dtype), grads, trainable_mask)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u, m: u * jnp.asarray(m, u.dtype), updates, trainable_mask)
        new_opt = _mask_param_subtrees(new_opt, state.opt_state, params_def,
                                       trainable_mask)

        params = optax.apply_updates(state.params, updates)
        losses = dict(losses)
        losses["total_loss"] = total
        return (TrainState(params=params, batch_stats=new_bs,
                           opt_state=new_opt, step=state.step + 1), losses)

    donate_args = (0,) if donate else ()
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn, in_shardings=(repl, data, repl),
                       out_shardings=(repl, repl), donate_argnums=donate_args)
    return jax.jit(step_fn, donate_argnums=donate_args)


def make_precise_bn_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Jitted forward that returns the PURE per-batch BN statistics
    (mean, E[x^2]) sown by TorchBatchNorm under the "bn_stats" collection.

    Precise-BN: the neck/det-head BNs run torch momentum 0.01
    (/root/reference/model/net/common.py:98), so their running stats need
    ~500 optimizer steps to leave their (0, 1) init. On short runs eval-mode
    activations are squashed by the stale running var at every BN and the
    stacked BiFPN cascades the error into a lane/det collapse — while
    train-mode forward is fine. Re-estimating population stats over K batches
    right before validation (the "precise BN" recipe) removes the EMA lag
    entirely; it is strictly a better estimate of the population statistics
    than any momentum schedule.
    """

    def stats_fn(params: Any, batch_stats: Any, image: jnp.ndarray):
        _, muts = model.apply(
            {"params": params, "batch_stats": batch_stats}, image,
            train=True, mutable=["batch_stats", "bn_stats"])
        # batch_stats mutation (the EMA update) is discarded on purpose —
        # only the momentum-free statistics leave the program.
        return muts["bn_stats"]

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(stats_fn, in_shardings=(repl, repl, data),
                       out_shardings=repl)
    return jax.jit(stats_fn)


def merge_precise_bn(batch_stats: Any, bn_stats_avg: Any) -> Any:
    """Overwrite the running (mean, var) leaves of `batch_stats` with
    population stats from averaged pure batch statistics.

    `bn_stats_avg` holds, at each TorchBatchNorm scope, {"mean": avg of batch
    means, "meansq": avg of batch E[x^2]}; the matching `batch_stats` scope
    holds {"bn": {"mean", "var"}}. With equal-size batches
    var = avg(meansq) - avg(mean)^2 is exactly the biased variance of the
    pooled sample, the same estimator flax's BatchNorm EMA tracks.
    """

    def rec(bs, st):
        if isinstance(st, dict) and set(st.keys()) == {"mean", "meansq"} \
                and not isinstance(st["mean"], dict):
            m = jnp.asarray(st["mean"], jnp.float32)
            var = jnp.maximum(
                jnp.asarray(st["meansq"], jnp.float32) - m * m, 0.0)
            inner = dict(bs["bn"])
            inner["mean"] = m.astype(jnp.asarray(bs["bn"]["mean"]).dtype)
            inner["var"] = var.astype(jnp.asarray(bs["bn"]["var"]).dtype)
            out = dict(bs)
            out["bn"] = inner
            return out
        if isinstance(st, dict):
            out = dict(bs)
            for k, v in st.items():
                out[k] = rec(bs[k], v)
            return out
        return bs

    try:  # FrozenDict-compatible (older flax return types)
        from flax.core import unfreeze
        batch_stats = unfreeze(batch_stats)
        bn_stats_avg = unfreeze(bn_stats_avg)
    except Exception:
        pass
    return rec(batch_stats, bn_stats_avg)


def run_precise_bn(precise_step: Callable, params: Any, batch_stats: Any,
                   images) -> Any:
    """Accumulate pure BN stats over an iterable of image batches and return
    `batch_stats` with running stats replaced by the population estimate."""
    acc = None
    count = 0
    for image in images:
        stats = precise_step(params, batch_stats, image)
        acc = stats if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, stats)
        count += 1
    if acc is None:
        return batch_stats
    avg = jax.tree_util.tree_map(lambda a: a / count, acc)
    return merge_precise_bn(batch_stats, avg)


def make_eval_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Jitted eval step: forward (running BN stats) + losses."""

    def step_fn(params: Any, batch_stats: Any, batch: Dict[str, jnp.ndarray]):
        outputs = model.apply({"params": params, "batch_stats": batch_stats},
                              batch["image"], train=False)
        losses = model.compute_losses(outputs, batch)
        losses = dict(losses)
        losses["total_loss"] = model.total_loss(losses)
        return outputs, losses

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn, in_shardings=(repl, repl, data))
    return jax.jit(step_fn)
