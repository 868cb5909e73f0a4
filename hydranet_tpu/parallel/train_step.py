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
