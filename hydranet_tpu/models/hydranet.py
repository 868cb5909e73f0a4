"""HydraNet model assembly (TPU-native equivalent of
/root/reference/model/model.py).

Builds backbone + neck + enabled heads from the typed config, exposes a pure
`__call__(x, train)` returning the per-task output dict, and `compute_losses`
as a pure function over (outputs, gt batch) — the reference couples this to
module state and aborts the process on non-finite losses (model.py:201-264);
here non-finite detection is left to the trainer so the whole step stays
jittable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hydranet_tpu.config import Config
from hydranet_tpu.heads.detection import DetectionHead
from hydranet_tpu.heads.detection_loss import focal_loss
from hydranet_tpu.heads.lane import LaneHead
from hydranet_tpu.heads.lane_loss import lane_cls_loss, lane_reg_loss
from hydranet_tpu.heads.segmentation import SegmentHead
from hydranet_tpu.heads.segmentation_loss import (
    cross_entropy_loss, cross_entropy_loss_phase_packed,
    cross_entropy_loss_wpacked, lovasz_softmax, lovasz_softmax_binned)
from hydranet_tpu.models.bifpn import StackBiFPN
from hydranet_tpu.models.regnet import RegNetY


class HydraNet(nn.Module):
    """Shared backbone + BiFPN + up to three task heads — model.py:26-198.

    Input x is NHWC float (imagenet-normalized). Output dict mirrors the
    reference: {"seg": logits, "detection": {anchors, regression,
    classification}, "lane": {predict_cls, predict_loc}} for enabled heads.
    """

    cfg: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 seg_argmax: bool = False) -> Dict[str, Any]:
        """seg_argmax=True (inference decode only): out["seg"] is the
        int32 class-id map instead of logits — the final seg stage fuses
        conv + argmax at the low resolution and the full-resolution
        logits are never materialized (~2 ms/batch128 + 409 MB HBM)."""
        cfg = self.cfg
        bb = cfg.backbone
        backbone = RegNetY(
            bb.initial_width, bb.slope, bb.quantized_param, bb.network_depth,
            bb.bottleneck_ratio, bb.group_width, bb.stride, bb.se_ratio,
            dtype=self.dtype, remat=bb.remat)
        feats = backbone.copy(name="backbone")(x, train=train)
        # stage-boundary sharding hints (no-ops outside spatial_sharding):
        # H-shard the big levels, replicate the tiny deep ones — see
        # parallel/spatial.py
        from hydranet_tpu.parallel.spatial import shard_spatial
        feats = [shard_spatial(f) for f in feats]

        neck = StackBiFPN(
            fpn_num_filters=bb.fpn_num_filters,
            fpn_cell_repeats=bb.fpn_cell_repeats,
            conv_channel_coef=bb.conv_channel_coef,
            dtype=self.dtype, name="neck")
        fused = [shard_spatial(f) for f in neck(feats, train=train)]

        out: Dict[str, Any] = {}
        if cfg.train.train_seg:
            seg = SegmentHead(
                num_ch_enc=cfg.segment.channel_dimension_seg_encode,
                num_ch_dec=cfg.segment.channel_dimension_seg_decode,
                num_output_channels=cfg.segment.num_classes,
                dtype=self.dtype, name="segheader")
            # inputs: [backbone stage0, P3, P4, P5] — model.py:166-172
            seg_in = [feats[0], fused[0], fused[1], fused[2]]
            # train-time phase CE (segment.phase_loss): the final stage
            # emits phase logits; compute_losses consumes the exact
            # per-phase slices (key "seg_phase")
            emit_wpack = (int(cfg.segment.wpack_loss)
                          if (cfg.segment.wpack_loss and train
                              and not seg_argmax
                              and not cfg.segment.use_lovasz) else 0)
            emit_phase = bool(cfg.segment.phase_loss and train
                              and not emit_wpack
                              and not seg_argmax
                              and not cfg.segment.use_lovasz)
            key = ("seg_wpack" if emit_wpack
                   else "seg_phase" if emit_phase else "seg")
            if cfg.segment.remat and train:
                # checkpoint the WHOLE decoder: backward recomputes it from
                # the 4 (small) input features instead of storing every
                # decoder stage's activations (the largest tensors in the
                # train step) — config.segment.remat
                out[key] = nn.remat(
                    lambda mdl, f: mdl(f, emit_argmax=seg_argmax,
                                       emit_phase=emit_phase,
                                       emit_wpack=emit_wpack))(
                        seg, seg_in)
            else:
                out[key] = seg(seg_in, emit_argmax=seg_argmax,
                               emit_phase=emit_phase,
                               emit_wpack=emit_wpack)

        if cfg.train.train_detect:
            det = DetectionHead(
                num_classes=cfg.detection.num_classes,
                in_channels=cfg.detection.fpn_num_filters_detect,
                aspect_ratios=cfg.detection.aspect_ratios,
                scales=cfg.detection.scales,
                box_class_repeats=cfg.detection.box_class_repeats,
                pyramid_levels=cfg.detection.pyramid_levels,
                anchor_scale=cfg.detection.anchor_scale,
                dtype=self.dtype, name="detectheader")
            anchors, regression, classification = det(
                (x.shape[1], x.shape[2]), fused, train=train)
            out["detection"] = {"anchors": anchors, "regression": regression,
                                "classification": classification}

        if cfg.train.train_lane:
            lane = LaneHead(
                base_channel=cfg.lane.base_channel,
                num_classes=cfg.lane.num_classes,
                stride=cfg.lane.anchor_stride,
                input_width=cfg.dataloader.network_input_width,
                input_height=cfg.dataloader.network_input_height,
                interval=cfg.lane.interval,
                dtype=self.dtype, name="laneheader")
            out["lane"] = lane(fused, train=train)

        return out

    def compute_losses(self, outputs: Dict[str, Any],
                       batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Per-task losses — model.py:201-264. Pure function; jittable."""
        cfg = self.cfg
        losses: Dict[str, jnp.ndarray] = {}

        if cfg.train.train_seg:
            gt = batch["gt_seg"].astype(jnp.int32)
            if "seg_wpack" in outputs:
                # w-packed phase CE: one loss over the [B, H+1, WG, g*4*C]
                # packed layout — identical loss/grads to the full-res CE
                # with the cotangent in a 120/128-lane layout
                # (segmentation_loss.py::cross_entropy_loss_wpacked)
                losses["loss_seg"] = cross_entropy_loss_wpacked(
                    outputs["seg_wpack"], gt, cfg.segment.class_weight,
                    g=int(cfg.segment.wpack_loss),
                    use_top_k=cfg.segment.use_top_k,
                    top_k_ratio=cfg.segment.top_k_ratio,
                    use_focal=cfg.segment.use_focal)
            elif "seg_phase" in outputs:
                # packed phase CE: one loss over the [B, H+1, W+1, 4C]
                # phase-logits layout (gt rearranged once into it) —
                # identical loss/grads to the full-res CE, with no
                # full-res tensor and no per-slice transposes in the
                # backward (segmentation_loss.py)
                losses["loss_seg"] = cross_entropy_loss_phase_packed(
                    outputs["seg_phase"], gt, cfg.segment.class_weight,
                    use_top_k=cfg.segment.use_top_k,
                    top_k_ratio=cfg.segment.top_k_ratio,
                    use_focal=cfg.segment.use_focal)
            elif cfg.segment.use_lovasz:
                logits = outputs["seg"]
                if cfg.segment.lovasz_bins > 0:
                    losses["loss_seg"] = lovasz_softmax_binned(
                        jax.nn.softmax(logits, axis=-1), gt, ignore=255,
                        bins=cfg.segment.lovasz_bins)
                else:
                    losses["loss_seg"] = lovasz_softmax(
                        jax.nn.softmax(logits, axis=-1), gt, ignore=255)
            else:
                logits = outputs["seg"]
                losses["loss_seg"] = cross_entropy_loss(
                    logits, gt, cfg.segment.class_weight,
                    use_top_k=cfg.segment.use_top_k,
                    top_k_ratio=cfg.segment.top_k_ratio,
                    use_focal=cfg.segment.use_focal)

        if cfg.train.train_detect:
            det = outputs["detection"]
            cls_loss, reg_loss = focal_loss(
                det["classification"], det["regression"], det["anchors"],
                batch["gt_det"])
            losses["loss_det_cls"] = cls_loss.mean()
            losses["loss_det_reg"] = reg_loss.mean()

        if cfg.train.train_lane:
            pos, neg, pmask, pos_num = lane_cls_loss(
                batch["gt_cls"], outputs["lane"]["predict_cls"])
            loc = lane_reg_loss(
                pmask, pos_num, batch["gt_loc"], outputs["lane"]["predict_loc"],
                points_per_line=cfg.lane_points_per_line)
            losses["loss_lane_cls_pos"] = pos
            losses["loss_lane_cls_neg"] = neg
            losses["loss_lane_loc"] = loc

        return losses

    def total_loss(self, losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Weighted multitask total — reference trainer cal_total_loss
        (train.py:192-203)."""
        cfg = self.cfg
        total = jnp.asarray(0.0, dtype=jnp.float32)
        if cfg.train.train_seg:
            total = total + losses["loss_seg"] * cfg.segment.segment_weight
        if cfg.train.train_detect:
            total = total + (
                losses["loss_det_cls"] * cfg.detection.loss_cls_weight
                + losses["loss_det_reg"] * cfg.detection.loss_reg_weight
            ) * cfg.detection.detection_weight
        if cfg.train.train_lane:
            total = total + (
                losses["loss_lane_cls_pos"] * cfg.lane.loss_cls_pos_weight
                + losses["loss_lane_cls_neg"] * cfg.lane.loss_cls_neg_weight
                + losses["loss_lane_loc"] * cfg.lane.loss_loc_weight
            ) * cfg.lane.lane_weight
        return total
