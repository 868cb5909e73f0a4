"""Segmentation losses (TPU-native equivalents of
/root/reference/model/head_seg/segmentation_loss.py and loss_lovasz.py).

All fixed-shape, mask-based formulations (no boolean indexing) so they trace
into a single XLA program; numerics match the torch reference on valid inputs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray,  # [B, H, W, C]
    target: jnp.ndarray,  # [B, H, W] int
    class_weights: Sequence[float],
    ignore_index: int = 255,
    use_top_k: bool = False,
    top_k_ratio: float = 1.0,
    use_focal: bool = False,
    gamma: float = 2.0,
    alpha: float = 1.0,
) -> jnp.ndarray:
    """Weighted CE with optional top-k hard-pixel mining or focal variant —
    reference segmentation_loss.py:5-65.

    Matches torch semantics: per-pixel loss is weight[target] * NLL, pixels
    equal to ignore_index contribute 0, and the final reduction is a plain
    mean over all (b, h*w) entries (torch reduction='none' then .mean()).
    """
    b, h, w, c = logits.shape
    weights = jnp.asarray(class_weights, dtype=logits.dtype)
    target = target.astype(jnp.int32)

    if use_focal:
        # reference segmentation_loss.py:30-45 (including its eps terms)
        eps = 1e-8
        p = jax.nn.softmax(logits, axis=-1) + eps
        one_hot = jax.nn.one_hot(target, c, dtype=logits.dtype) + eps
        focal_w = jnp.power(1.0 - p, gamma)
        focal = -alpha * focal_w * jnp.log(p) * weights[None, None, None, :]
        loss = jnp.sum(one_hot * focal, axis=-1)
        loss = loss.reshape(b, -1)
        return jnp.mean(loss)

    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    loss = nll * weights[tgt] * valid.astype(logits.dtype)
    loss = loss.reshape(b, -1)

    if use_top_k:
        # penalize the top-k hardest pixels — segmentation_loss.py:59-63
        k = int(top_k_ratio * loss.shape[1])
        loss = jax.lax.top_k(loss, k)[0]
    return jnp.mean(loss)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t sorted errors —
    loss_lovasz.py:19-31."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax(
    probas: jnp.ndarray,  # [B, H, W, C] probabilities
    labels: jnp.ndarray,  # [B, H, W] int
    ignore: Optional[int] = 255,
) -> jnp.ndarray:
    """Multi-class Lovasz-Softmax (classes='present', per_image=False) —
    loss_lovasz.py:154-200, re-expressed with fixed shapes: ignored pixels are
    given error 0 / fg 0 so they sort last and contribute nothing (their
    products vanish), instead of torch's boolean filtering."""
    b, h, w, c = probas.shape
    p = probas.reshape(-1, c)
    y = labels.reshape(-1).astype(jnp.int32)
    valid = (y != ignore) if ignore is not None else jnp.ones_like(y, bool)
    validf = valid.astype(p.dtype)

    def class_loss(ci):
        fg = (y == ci).astype(p.dtype) * validf
        errors = jnp.abs(fg - p[:, ci]) * validf
        order = jnp.argsort(-errors)  # descending
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        grad = _lovasz_grad(fg_sorted)
        loss_c = jnp.dot(errors_sorted, grad)
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, present = jax.vmap(class_loss)(jnp.arange(c))
    presentf = present.astype(p.dtype)
    return jnp.sum(losses * presentf) / jnp.maximum(jnp.sum(presentf), 1.0)
