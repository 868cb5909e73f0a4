"""Anchor-based detection head (TPU-native equivalent of
/root/reference/model/head_detect/detection.py).

EfficientDet-style shared towers with per-level BN
(detection.py:11-83), multiscale anchors (detection.py:86-170), and — unlike
the reference, which runs box decode + NMS on host per image
(detection_loss.py:70-108) — a fixed-shape, fully on-device post-processing
pipeline (top-k preselect -> box decode -> clip -> class-aware IoU-matrix
greedy NMS) that compiles into the same XLA program as the forward pass.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hydranet_tpu.ops.common import (BNParams, ConvParams,
                                     SeparableConvBlock, TorchBatchNorm,
                                     swish)


def generate_anchors(
    image_hw: Tuple[int, int],
    anchor_scale: float,
    pyramid_levels: Sequence[int],
    scales: Sequence[float],
    ratios: Sequence[Tuple[float, float]],
) -> np.ndarray:
    """Multiscale anchor boxes [A, 4] in (y1, x1, y2, x2) — the exact grid of
    reference detection.py:108-170 (np.meshgrid row-major walk, scales-major
    then ratios within each level). Computed once at trace time; becomes an
    XLA constant."""
    h, w = image_hw
    boxes_all = []
    for level in pyramid_levels:
        stride = 2 ** level
        if h % stride != 0 or w % stride != 0:
            raise ValueError("input size must be divided by the stride.")
        boxes_level = []
        for scale, ratio in itertools.product(scales, ratios):
            base = anchor_scale * stride * scale
            ax2 = base * ratio[0] / 2.0
            ay2 = base * ratio[1] / 2.0
            x = np.arange(stride / 2, w, stride)
            y = np.arange(stride / 2, h, stride)
            xv, yv = np.meshgrid(x, y)
            xv, yv = xv.reshape(-1), yv.reshape(-1)
            boxes = np.vstack((yv - ay2, xv - ax2, yv + ay2, xv + ax2))
            boxes_level.append(np.expand_dims(boxes.T, axis=1))
        boxes_level = np.concatenate(boxes_level, axis=1)
        boxes_all.append(boxes_level.reshape([-1, 4]))
    return np.vstack(boxes_all).astype(np.float32)


class _Tower(nn.Module):
    """Shared separable convs across levels with per-level BN, then a header
    conv — reference Regressor/Classifier (detection.py:11-83)."""

    in_channels: int
    out_per_anchor: int  # 4 for boxes, num_classes for logits
    num_anchors: int
    num_layers: int
    pyramid_levels: int
    dtype: Optional[jnp.dtype] = None
    header_bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        convs = [SeparableConvBlock(self.in_channels, norm=False,
                                    activation=False, dtype=self.dtype,
                                    name=f"conv_{i}")
                 for i in range(self.num_layers)]
        header = SeparableConvBlock(self.num_anchors * self.out_per_anchor,
                                    norm=False, activation=False,
                                    dtype=self.dtype,
                                    bias_init=self.header_bias_init,
                                    name="header")
        from hydranet_tpu.parallel.spatial import shard_spatial

        outs = []
        for lvl, feat in enumerate(feats):
            for i in range(self.num_layers):
                feat = convs[i](feat, train=train)
                feat = TorchBatchNorm(momentum=0.01, epsilon=1e-3,
                                      dtype=self.dtype,
                                      name=f"bn_{lvl}_{i}")(feat, train=train)
                feat = shard_spatial(swish(feat))
            feat = shard_spatial(header(feat, train=train))
            b = feat.shape[0]
            # NHWC is already the reference's permute(0,2,3,1) layout
            # (detection.py:37-38) — flatten directly.
            outs.append(feat.reshape(b, -1, self.out_per_anchor))
        return jnp.concatenate(outs, axis=1)


class _SepParams(nn.Module):
    """Param mirror of the towers' norm-free SeparableConvBlock: depthwise
    taps + pointwise kernel/bias under the identical variable tree."""

    features: int
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, in_ch: int):
        dw_k, _ = ConvParams(in_ch, kernel_size=3, groups=in_ch,
                             use_bias=False, name="depthwise_conv")(in_ch)
        pw_k, pw_b = ConvParams(self.features, kernel_size=1,
                                bias_init=self.bias_init,
                                name="pointwise_conv")(in_ch)
        return dw_k.reshape(9, in_ch), pw_k.reshape(in_ch, self.features), \
            pw_b


class _TowerParams(nn.Module):
    """Param mirror of _Tower for the fused Pallas kernel
    (ops/pallas_tower.py): declares the exact same variable tree (shared
    conv_{i} + header separable convs, per-level bn_{lvl}_{i}) and returns
    the kernel's arrays, with each level's inference BN folded to an
    affine (eps=1e-3, matching _Tower's TorchBatchNorm)."""

    in_channels: int
    out_per_anchor: int
    num_anchors: int
    num_layers: int
    n_levels: int
    header_bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        taps, pws, pbs = [], [], []
        for i in range(self.num_layers):
            t, p, b = _SepParams(self.in_channels,
                                 name=f"conv_{i}")(self.in_channels)
            taps.append(t)
            pws.append(p)
            pbs.append(b)
        th, ph, bh = _SepParams(self.num_anchors * self.out_per_anchor,
                                bias_init=self.header_bias_init,
                                name="header")(self.in_channels)
        bn_s, bn_t = [], []
        for lvl in range(self.n_levels):
            srow, trow = [], []
            for i in range(self.num_layers):
                scale, bias, mean, var = BNParams(
                    name=f"bn_{lvl}_{i}")(self.in_channels)
                s = scale * jax.lax.rsqrt(var + 1e-3)
                srow.append(s)
                trow.append(bias - mean * s)
            bn_s.append(jnp.stack(srow))
            bn_t.append(jnp.stack(trow))
        return {
            "taps": jnp.stack(taps), "pw": jnp.stack(pws),
            "pb": jnp.stack(pbs), "bn_scale": jnp.stack(bn_s),
            "bn_shift": jnp.stack(bn_t), "taps_h": th, "pw_h": ph,
            "pb_h": bh,
        }


class DetectionHead(nn.Module):
    """Regressor + classifier + anchors — detection.py:173-215."""

    num_classes: int
    in_channels: int
    aspect_ratios: Tuple[Tuple[float, float], ...]
    scales: Tuple[float, ...]
    box_class_repeats: int = 3
    pyramid_levels: int = 5
    anchor_scale: float = 2.0
    dtype: Optional[jnp.dtype] = None

    @property
    def num_anchors(self):
        return len(self.aspect_ratios) * len(self.scales)

    @nn.compact
    def __call__(self, image_hw: Tuple[int, int],
                 fused_feats: Sequence[jnp.ndarray], train: bool = False):
        # RetinaNet-style focal-loss prior on the classifier bias
        # (pi = 0.01): fresh models start predicting "background" so early
        # training is stable and untrained inference doesn't flood NMS. The
        # reference leaves this at torch defaults; weight import overwrites
        # it, so golden parity is unaffected.
        prior = float(-np.log((1.0 - 0.01) / 0.01))
        if not train and self._use_fused_towers(fused_feats):
            regression, classification = self._fused_towers(fused_feats,
                                                            prior)
        else:
            regression = _Tower(
                in_channels=self.in_channels, out_per_anchor=4,
                num_anchors=self.num_anchors,
                num_layers=self.box_class_repeats,
                pyramid_levels=self.pyramid_levels, dtype=self.dtype,
                name="regressor")(fused_feats, train=train)
            classification = _Tower(
                in_channels=self.in_channels,
                out_per_anchor=self.num_classes,
                num_anchors=self.num_anchors,
                num_layers=self.box_class_repeats,
                pyramid_levels=self.pyramid_levels, dtype=self.dtype,
                header_bias_init=nn.initializers.constant(prior),
                name="classifier")(fused_feats, train=train)
        classification = jax.nn.sigmoid(classification)
        anchors = jnp.asarray(generate_anchors(
            image_hw, self.anchor_scale,
            [lvl + 3 for lvl in range(self.pyramid_levels)],
            self.scales, self.aspect_ratios))[None]
        return anchors, regression, classification

    def _use_fused_towers(self, feats) -> bool:
        import os

        from hydranet_tpu.ops import pallas_tower
        from hydranet_tpu.ops import quantize as qz

        # Opt-in (HN_PALLAS_TOWER=1): both towers fused into one VMEM-
        # resident Pallas kernel per level (ops/pallas_tower.py).
        # HN_NO_PALLAS_TOWER=1 forces the XLA path even when the interpret
        # or opt-in flags are set — tests use it to compare the kernel
        # against the real XLA composition.
        if os.environ.get("HN_NO_PALLAS_TOWER", "0") == "1":
            return False
        interpret = os.environ.get("HN_PALLAS_TOWER_INTERPRET", "0") == "1"
        if not interpret and os.environ.get("HN_PALLAS_TOWER", "0") != "1":
            return False
        if not interpret and jax.default_backend() != "tpu":
            return False
        if qz.current_mode() != "off":
            # int8 PTQ rewires/calibrates the tower convs per FastConv
            # module; the fused kernel has no quantized path
            return False
        sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        # size the VMEM budget with the dtype the kernel will actually run
        # in (_fused_towers casts to self.dtype or feats dtype) — sizing
        # an f32 pipeline as bf16 would pass a level at half its true
        # footprint and fail inside pallas_call instead of falling back
        return pallas_tower.supports(
            sizes, self.in_channels, self.box_class_repeats,
            4 * self.num_anchors, self.num_classes * self.num_anchors,
            self.dtype or feats[0].dtype)

    def _fused_towers(self, feats, prior: float):
        import os

        from hydranet_tpu.ops import pallas_tower

        reg_p = _TowerParams(
            in_channels=self.in_channels, out_per_anchor=4,
            num_anchors=self.num_anchors, num_layers=self.box_class_repeats,
            n_levels=len(feats), name="regressor")()
        cls_p = _TowerParams(
            in_channels=self.in_channels, out_per_anchor=self.num_classes,
            num_anchors=self.num_anchors, num_layers=self.box_class_repeats,
            n_levels=len(feats),
            header_bias_init=nn.initializers.constant(prior),
            name="classifier")()
        dt = self.dtype or feats[0].dtype
        return pallas_tower.det_towers(
            [f.astype(dt) for f in feats], reg_p, cls_p, self.num_anchors,
            interpret=os.environ.get("HN_PALLAS_TOWER_INTERPRET",
                                     "0") == "1")


def bbox_transform(anchors: jnp.ndarray, regression: jnp.ndarray) -> jnp.ndarray:
    """Decode (dy, dx, dh, dw) vs (y1, x1, y2, x2) anchors into
    (x1, y1, x2, y2) boxes — reference detection_loss.py:7-35."""
    yca = (anchors[..., 0] + anchors[..., 2]) / 2
    xca = (anchors[..., 1] + anchors[..., 3]) / 2
    ha = anchors[..., 2] - anchors[..., 0]
    wa = anchors[..., 3] - anchors[..., 1]
    w = jnp.exp(regression[..., 3]) * wa
    h = jnp.exp(regression[..., 2]) * ha
    yc = regression[..., 0] * ha + yca
    xc = regression[..., 1] * wa + xca
    return jnp.stack([xc - w / 2., yc - h / 2., xc + w / 2., yc + h / 2.],
                     axis=-1)


def clip_boxes(boxes: jnp.ndarray, image_hw: Tuple[int, int]) -> jnp.ndarray:
    """Clamp x1,y1 >= 0 and x2 <= W-1, y2 <= H-1 — detection_loss.py:38-52."""
    h, w = image_hw
    return jnp.stack([
        jnp.maximum(boxes[..., 0], 0.0),
        jnp.maximum(boxes[..., 1], 0.0),
        jnp.minimum(boxes[..., 2], w - 1.0),
        jnp.minimum(boxes[..., 3], h - 1.0),
    ], axis=-1)


class Detections(NamedTuple):
    """Fixed-shape per-image detection results (padded; `valid` marks rows)."""

    boxes: jnp.ndarray      # [..., max_det, 4] (x1, y1, x2, y2)
    scores: jnp.ndarray     # [..., max_det]
    classes: jnp.ndarray    # [..., max_det] int32
    valid: jnp.ndarray      # [..., max_det] bool


try:  # allow the result type through jax.export serialization
    from jax import export as _jax_export

    _jax_export.register_namedtuple_serialization(
        Detections, serialized_name="hydranet_tpu.Detections")
except (ImportError, AttributeError, ValueError):
    pass


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of [K, 4] (x1, y1, x2, y2) boxes, torchvision convention
    (no +1)."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
           jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def greedy_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                    valid: jnp.ndarray, iou_threshold: float,
                    max_keep: Optional[int] = None) -> jnp.ndarray:
    """Greedy NMS over score-descending-sorted boxes: one KxK IoU matrix,
    then a Jacobi FIXPOINT instead of a sequential scan. Returns the FULL
    greedy keep mask (same order). `max_keep` is accepted for API compat
    (consumers slice the first M keeps themselves; the full mask's first M
    keeps are identical).

    Greedy keep is the unique solution of
        keep[i] = valid[i] & !any_{j<i}(over[j,i] & keep[j]);
    iterating keep <- valid & !(overᵀ @ keep) from keep0 = valid converges
    to it in as many rounds as the longest suppression CHAIN (typically
    3-8 for box NMS; the previous kept-box loop was 100 fixed sequential
    steps of vector ops — 4.6 vs 3.4 ms/batch128 measured, and this form
    is exact full greedy rather than greedy-truncated-to-M). Rounds are
    bounded by K for adversarial chains; cost stays independent of how
    many boxes pass the score threshold.

    Exactly reproduces torchvision greedy semantics while staying
    fixed-shape on device: invalid rows never suppress and are never kept.
    """
    del max_keep
    k = boxes.shape[0]
    iou = _iou_matrix(boxes)
    over = (iou > iou_threshold) & valid[None, :] & valid[:, None]
    # row i suppresses j only if j comes later (lower score).
    over = over & jnp.triu(jnp.ones((k, k), bool), 1)
    # Materialize the suppression matrix before the loop: without the
    # barrier XLA rematerializes the KxK IoU computation inside every
    # iteration (measured 110 ms vs 12 ms for the postprocess at bs128).
    over = jax.lax.optimization_barrier(over)

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(over & keep[:, None], axis=0)
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    return keep


def certified_block_topk(scores: jnp.ndarray, k: int,
                         score_threshold: float,
                         block_size: int = 512,
                         max_per_block: int = 32):
    """Exact-where-it-matters top-k over [B, A] scores at ~1/3 the cost of
    `lax.top_k` (measured 6.4 vs 17.8 ms at [128, 76725] -> 1000).

    Partition the anchor axis into `nb = ceil(A/block_size)` STRIDED blocks
    (block j holds indices with i % nb == j, so a spatially contiguous clump
    of hot anchors spreads ~1/nb per block), take a per-block top-m, and run
    the exact top-k on the nb*m union. Downstream consumers discard entries
    with score <= score_threshold, so the result is exact whenever every
    block holds <= m above-threshold entries — verified on device by a
    one-scalar certificate. The certificate is TIERED: when the cheap
    m = max_per_block tier fails (realistic trained-model score densities,
    not just pathologies — see the HN_SCORE_BIAS stress cell), a 4x-capacity
    tier runs before surrendering to the full `lax.top_k`, so the cost
    curve degrades gradually instead of cliffing onto the 17.8 ms sort.

    A final two-key sort restores `top_k`'s tie-breaking (equal scores ->
    lower anchor index first) within the selected set; the one remaining
    deviation from `lax.top_k` is which of several exactly-equal-score
    anchors straddling the k-th rank gets selected — both outcomes are valid
    greedy-NMS inputs.
    """
    b, a = scores.shape
    nb = -(-a // block_size)
    if nb * max_per_block < k or a <= 4 * k:
        # union smaller than k, or the problem is too small to bother
        return jax.lax.top_k(scores, k)

    pad = nb * block_size - a
    sp = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    blocks = sp.reshape(b, block_size, nb).transpose(0, 2, 1)  # [B, nb, bs]
    # Count in f32: downstream validity is `score.astype(f32) > threshold`,
    # and a bf16 score equal to bf16(threshold) can still be above the f32
    # threshold — counting in the score dtype could undercount those and
    # certify a selection that dropped a downstream-valid anchor.
    cnt = jnp.max(jnp.sum(blocks.astype(jnp.float32) > score_threshold,
                          axis=-1))

    def fast(m):
        def body(_):
            bv, bi = jax.lax.top_k(blocks, m)              # [B, nb, m]
            # original index of (block j, in-block slot s) is s*nb + j
            j_ids = jnp.arange(nb)[None, :, None]
            union_v = bv.reshape(b, nb * m)
            union_i = (bi * nb + j_ids).reshape(b, nb * m)
            v, j = jax.lax.top_k(union_v, k)
            i = jnp.take_along_axis(union_i, j, axis=1)
            # restore tie-break-by-ascending-index among the selected
            v, i = jax.lax.sort((-v, i), num_keys=2)
            return -v, i
        return body

    def slow(_):
        v, i = jax.lax.top_k(scores, k)
        return v, i

    m2 = min(4 * max_per_block, block_size)
    tier2 = (slow if nb * m2 < k  # tiny-A configs: tier 2 can't cover k
             else lambda _: jax.lax.cond(cnt <= m2, fast(m2), slow, None))
    return jax.lax.cond(cnt <= max_per_block, fast(max_per_block),
                        tier2, None)


def postprocess(
    anchors: jnp.ndarray,        # [1, A, 4]
    regression: jnp.ndarray,     # [B, A, 4]
    classification: jnp.ndarray, # [B, A, C] (sigmoid scores)
    image_hw: Tuple[int, int],
    score_threshold: float = 0.6,
    iou_threshold: float = 0.3,
    pre_nms_top_k: int = 1000,
    max_detections: int = 100,
    use_approx_top_k: bool = False,
) -> Detections:
    """On-device equivalent of reference postprocess (detection_loss.py:70-108):
    per-anchor max-class score -> threshold -> per-image class-aware NMS.

    The reference gathers anchors over threshold dynamically on host; here we
    take the top `pre_nms_top_k` anchors by score (with the threshold applied
    as a validity mask), run fixed-shape NMS, and emit `max_detections` padded
    rows. Identical results whenever <= pre_nms_top_k anchors pass the
    threshold (always, in practice, for sane thresholds).

    Selection runs in the scores' own dtype (monotone, so identical picks)
    and box decode happens AFTER selection on the K kept anchors — the
    all-anchor f32 casts plus full decode otherwise materialize ~0.7 GB at
    bs128 for rows that are about to be dropped.
    """
    pre_nms_top_k = min(pre_nms_top_k, anchors.shape[1])
    max_detections = min(max_detections, pre_nms_top_k)

    scores_all = jnp.max(classification, axis=-1)
    classes_all = jnp.argmax(classification, axis=-1).astype(jnp.int32)
    if use_approx_top_k:
        # TPU-optimized partial-reduce top-k (recall ~0.95). Kept as an
        # opt-in knob; the certified block top-k below is nearly as fast
        # and exact on the above-threshold set.
        top_scores_all, idx_all = jax.lax.approx_max_k(
            scores_all, pre_nms_top_k)
    else:
        # exact selection (certificate-backed block preselect, lax.top_k
        # fallback): 6.4 vs 17.8 ms at bs128 on the flagship config.
        top_scores_all, idx_all = certified_block_topk(
            scores_all, pre_nms_top_k, score_threshold)

    anchors_f = anchors[0].astype(jnp.float32)

    def per_image(regression_i, classes, top_scores, idx):
        top_boxes = clip_boxes(
            bbox_transform(anchors_f[idx],
                           regression_i[idx].astype(jnp.float32)),
            image_hw)
        top_classes = classes[idx]
        top_scores = top_scores.astype(jnp.float32)
        valid = top_scores > score_threshold

        # batched_nms class-offset trick (torchvision): shift each class into
        # a disjoint coordinate range so one NMS pass is class-aware.
        max_coord = jnp.max(jnp.where(valid[:, None], top_boxes, 0.0))
        offsets = top_classes.astype(top_boxes.dtype) * (max_coord + 1.0)
        keep = greedy_nms_mask(top_boxes + offsets[:, None], top_scores,
                               valid, iou_threshold,
                               max_keep=max_detections)

        # compact kept rows to the front, preserving score order
        order = jnp.argsort(~keep, stable=True)[:max_detections]
        return Detections(
            boxes=top_boxes[order],
            scores=top_scores[order],
            classes=top_classes[order],
            valid=keep[order],
        )

    return jax.vmap(per_image)(regression, classes_all, top_scores_all,
                               idx_all)
