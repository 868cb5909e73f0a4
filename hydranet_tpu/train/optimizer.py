"""Optimizer + LR schedule (TPU-native equivalent of the reference's
torch.optim.Adam + per-iteration CosineAnnealingLR —
/root/reference/model/train.py:147-150).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_annealing_lr(base_lr: float, total_iters: int,
                        eta_min: float = 1e-8) -> optax.Schedule:
    """torch CosineAnnealingLR: lr_t = eta_min + (lr0 - eta_min) *
    (1 + cos(pi * t / T)) / 2, stepped per iteration."""

    def schedule(count):
        t = jnp.minimum(count, total_iters).astype(jnp.float32)
        return eta_min + (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * t / total_iters)) / 2.0

    return schedule


def make_optimizer(lr: float, weight_decay: float, total_iters: int,
                   eta_min: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 weight decay is added to the gradient
    BEFORE the Adam moment updates (not AdamW-style decoupled decay), betas
    (0.9, 0.999), eps 1e-8."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(
            cosine_annealing_lr(lr, total_iters, eta_min)),
    )
