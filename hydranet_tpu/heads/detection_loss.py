"""Detection focal loss (TPU-native equivalent of
/root/reference/model/head_detect/detection_loss.py:128-267).

EfficientDet-style: IoU assignment (<0.4 negative, >=0.5 positive),
focal BCE (alpha=.25, gamma=2) normalized by positive count, smooth-L1/9 box
regression on positives. The reference loops over the batch in Python with
dynamic boolean indexing; here everything is a masked fixed-shape computation
vmapped over the batch, so it jits into the training step.

Annotations are [B, M, 5] (x1, y1, x2, y2, class) padded with -1 rows
(reference Collater, dataloader.py:587-609).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def calc_iou(anchors: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of [A, 4] (y1, x1, y2, x2) anchors vs [M, 4] (x1, y1, x2, y2)
    gt boxes — reference detection_loss.py:111-125 (including its clamping)."""
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    iw = jnp.minimum(anchors[:, None, 3], boxes[None, :, 2]) - \
         jnp.maximum(anchors[:, None, 1], boxes[None, :, 0])
    ih = jnp.minimum(anchors[:, None, 2], boxes[None, :, 3]) - \
         jnp.maximum(anchors[:, None, 0], boxes[None, :, 1])
    iw = jnp.maximum(iw, 0)
    ih = jnp.maximum(ih, 0)
    ua = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    ua = ua[:, None] + area[None, :] - iw * ih
    ua = jnp.maximum(ua, 1e-8)
    return iw * ih / ua


def focal_loss(
    classifications: jnp.ndarray,  # [B, A, C] sigmoid scores
    regressions: jnp.ndarray,      # [B, A, 4]
    anchors: jnp.ndarray,          # [1, A, 4] (y1, x1, y2, x2)
    annotations: jnp.ndarray,      # [B, M, 5], -1-padded
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (cls_loss, reg_loss), each [1] (batch-mean), matching the
    reference's output contract (detection_loss.py:267)."""
    anchor = anchors[0]
    aw = anchor[:, 3] - anchor[:, 1]
    ah = anchor[:, 2] - anchor[:, 0]
    acx = anchor[:, 1] + 0.5 * aw
    acy = anchor[:, 0] + 0.5 * ah

    def per_image(classification, regression, bbox_annotation):
        gt_valid = bbox_annotation[:, 4] != -1  # [M]
        num_gt = jnp.sum(gt_valid)
        classification = jnp.clip(classification, 1e-4, 1.0 - 1e-4)

        # --- no-annotation branch (detection_loss.py:157-186): every anchor
        # is a pure negative focal term, no positive normalization.
        bg_cls_loss = ((1.0 - alpha) * jnp.power(classification, gamma)
                       * -jnp.log(1.0 - classification))
        no_gt_cls = jnp.sum(bg_cls_loss)

        # --- standard branch -------------------------------------------------
        iou = calc_iou(anchor, bbox_annotation[:, :4])  # [A, M]
        iou = jnp.where(gt_valid[None, :], iou, -1.0)  # padded gts never match
        iou_max = jnp.max(iou, axis=1)
        iou_argmax = jnp.argmax(iou, axis=1)

        # per-anchor row pick from the tiny [M, 5] annotation table as a
        # one-hot matmul: the row gather costs ~15 ms/step at A=76k on
        # v5e (TPU gathers are row-serial). Precision.HIGHEST is required
        # for exactness: the TPU default multiplies in bf16, which would
        # round the picked coords/class ids even though only one term per
        # row is nonzero. The inner dim is tiny (M<=max_annots) so full
        # precision costs nothing.
        pick = jax.nn.one_hot(iou_argmax, bbox_annotation.shape[0],
                              dtype=jnp.float32)
        assigned = jnp.dot(pick, bbox_annotation.astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # [A, 5]
        positive = iou_max >= 0.5
        negative = iou_max < 0.4
        num_pos = jnp.sum(positive)

        # targets: -1 ignore, 0 negative, one-hot positive
        # (detection_loss.py:193-206)
        tgt_onehot = jax.nn.one_hot(
            assigned[:, 4].astype(jnp.int32), classification.shape[-1],
            dtype=classification.dtype)
        targets = jnp.where(positive[:, None], tgt_onehot, 0.0)
        care = negative[:, None] | positive[:, None]  # ~ignore band

        alpha_factor = jnp.where(targets == 1.0, alpha, 1.0 - alpha)
        focal_weight = jnp.where(targets == 1.0, 1.0 - classification,
                                 classification)
        focal_weight = alpha_factor * jnp.power(focal_weight, gamma)
        bce = -(targets * jnp.log(classification)
                + (1.0 - targets) * jnp.log(1.0 - classification))
        cls_loss = jnp.where(care, focal_weight * bce, 0.0)
        cls_loss = jnp.sum(cls_loss) / jnp.maximum(
            num_pos.astype(classification.dtype), 1.0)

        # regression targets on positives (detection_loss.py:227-259)
        gw = jnp.maximum(assigned[:, 2] - assigned[:, 0], 1.0)
        gh = jnp.maximum(assigned[:, 3] - assigned[:, 1], 1.0)
        gcx = assigned[:, 0] + 0.5 * (assigned[:, 2] - assigned[:, 0])
        gcy = assigned[:, 1] + 0.5 * (assigned[:, 3] - assigned[:, 1])
        t_dx = (gcx - acx) / aw
        t_dy = (gcy - acy) / ah
        t_dw = jnp.log(gw / aw)
        t_dh = jnp.log(gh / ah)
        reg_targets = jnp.stack([t_dy, t_dx, t_dh, t_dw], axis=1)

        diff = jnp.abs(reg_targets - regression)
        smooth = jnp.where(diff <= 1.0 / 9.0, 0.5 * 9.0 * diff * diff,
                           diff - 0.5 / 9.0)
        posf = positive.astype(classification.dtype)
        reg_loss = jnp.sum(smooth * posf[:, None]) / jnp.maximum(
            num_pos.astype(classification.dtype) * 4.0, 1e-12)
        reg_loss = jnp.where(num_pos > 0, reg_loss, 0.0)

        cls_loss = jnp.where(num_gt > 0, cls_loss, no_gt_cls)
        reg_loss = jnp.where(num_gt > 0, reg_loss, 0.0)
        return cls_loss, reg_loss

    cls_losses, reg_losses = jax.vmap(per_image)(
        classifications, regressions, annotations)
    return (jnp.mean(cls_losses, keepdims=True),
            jnp.mean(reg_losses, keepdims=True))
