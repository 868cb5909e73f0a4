"""Typed configuration schema.

Mirrors the reference's YAML layout (tag / train / dataloader / backbone /
detection / segment / lane sections — /root/reference/model/cfgs/
hydranet_joint_big_backbone.yml:1-144) so the same YAML presets load directly,
but validates into frozen dataclasses instead of being read through raw dict
key paths everywhere (reference accesses cfgs["..."]["..."] ad hoc, e.g.
model.py:34-46, train.py:35-67).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


def _filter_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass(frozen=True)
class TrainCfg:
    train_detect: bool = True
    train_seg: bool = True
    train_lane: bool = True
    batch_size_train: int = 4
    num_worker_train: int = 0
    batch_size_valid: int = 4
    num_worker_valid: int = 0
    lr: float = 1e-5
    weight_decay: float = 1e-8
    epoch: int = 30
    logs: str = "logs"
    print_interval: int = 10
    use_distribute: bool = False
    continue_train: bool = False
    weight_file: str = ""
    weight_file_lane: str = ""
    weight_file_det: str = ""
    weight_file_seg: str = ""
    fine_tuning: bool = False
    epoch_tuning: int = 1
    tuning_turn: int = 1
    # "float32" (reference-faithful default) or "bfloat16" (TPU-fast
    # compute; params/optimizer state stay f32 — the bench_train policy)
    compute_dtype: str = "float32"
    # Resume a previous run from an orbax checkpoint directory written by
    # save_checkpoint (restores params + batch_stats + optimizer state +
    # step; training continues at step//iters_per_epoch — unlike the
    # reference, which reloads weights only and restarts its LR schedule,
    # train.py:95-126).
    resume_from: str = ""
    # Precise-BN: before each validation, re-estimate BN population stats
    # over this many training batches (0 = off, use EMA running stats like
    # the reference). The neck/det-head BNs run torch momentum 0.01
    # (reference common.py:98) and need ~500 steps for the EMA to leave its
    # (0,1) init; on shorter runs eval-mode collapses while train-mode is
    # fine. Precise-BN removes the lag (see parallel/train_step.py).
    precise_bn_batches: int = 0


@dataclass(frozen=True)
class DataloaderCfg:
    data_list: str = ""
    network_input_width: int = 640
    network_input_height: int = 640
    with_aug: bool = True
    do_split: bool = False
    do_flip: bool = False
    # hydranet_tpu extension (train-time only, default off): decode JPEGs at
    # reduced resolution via libjpeg DCT scaling when the source is >=2x the
    # network input — ~3x faster decode; labels are rescaled to match.
    fast_decode: bool = False


@dataclass(frozen=True)
class BackboneCfg:
    # RegNet design-space parameters (reference: regnet.py:9-44).
    initial_width: int = 24
    slope: float = 36
    quantized_param: float = 2.5
    network_depth: int = 30
    bottleneck_ratio: int = 1
    group_width: int = 8
    stride: int = 2
    se_ratio: Optional[int] = 4
    # BiFPN neck (reference: bifpn.py:315-329).
    fpn_num_filters: int = 112
    fpn_cell_repeats: int = 3
    conv_channel_coef: Tuple[int, ...] = (64, 152, 376, 936)
    # hydranet_tpu extension: rematerialize backbone stages in backward
    # (jax.checkpoint) to trade recompute for activation memory.
    remat: bool = False

    def __post_init__(self):
        object.__setattr__(self, "conv_channel_coef", tuple(self.conv_channel_coef))


@dataclass(frozen=True)
class DetectionCfg:
    class_list: Tuple[str, ...] = ()
    num_classes: int = 9
    fpn_num_filters_detect: int = 112
    aspect_ratios_factor: Tuple[float, float] = (1.4, 0.7)
    scales_factor: Tuple[float, float, float] = (0.0, 0.333, 0.667)
    box_class_repeats: int = 3
    pyramid_levels: int = 5
    anchor_scale: float = 2.0
    max_images: int = 10000
    loss_cls_weight: float = 1.0
    loss_reg_weight: float = 50.0
    detection_weight: float = 1.0
    # Post-processing capacities (new knobs; the reference hard-codes dynamic
    # shapes on host — detection_loss.py:70-108. Fixed sizes keep NMS on-device.)
    pre_nms_top_k: int = 1000
    max_detections: int = 100
    # Validation-decode score threshold. Default 0.3 mirrors the reference's
    # val loop (train.py:318 conf_thres=0.3). COCO-convention evaluation
    # wants ~0.05: focal-loss score calibration keeps true-positive scores
    # low for many epochs, so 0.3 silently caps AR/mAP early in training.
    eval_score_threshold: float = 0.3
    # hydranet_tpu extension: jax.lax.approx_max_k for the pre-NMS top-k
    # preselection (~3.5x faster selection, ~14 ms/batch128; preselection
    # recall ~0.95 — final detections are near-identical because true
    # positives sit far above the score threshold). Default off: exact top-k
    # preserves bit-parity with the reference postprocess.
    use_approx_top_k: bool = False

    def __post_init__(self):
        object.__setattr__(self, "class_list", tuple(self.class_list))
        object.__setattr__(self, "aspect_ratios_factor", tuple(self.aspect_ratios_factor))
        object.__setattr__(self, "scales_factor", tuple(self.scales_factor))

    @property
    def aspect_ratios(self) -> Tuple[Tuple[float, float], ...]:
        # reference: model.py:79-81
        r1, r2 = self.aspect_ratios_factor
        return ((1.0, 1.0), (r1, r2), (r2, r1))

    @property
    def scales(self) -> Tuple[float, ...]:
        # reference: model.py:82
        return tuple(2.0 ** s for s in self.scales_factor)

    @property
    def num_anchors(self) -> int:
        return len(self.aspect_ratios) * len(self.scales)


@dataclass(frozen=True)
class SegmentCfg:
    class_list: Tuple[str, ...] = ()
    class_weight: Tuple[float, ...] = ()
    channel_dimension_seg_encode: Tuple[int, ...] = (24, 112, 112, 112)
    channel_dimension_seg_decode: Tuple[int, ...] = (64, 128, 256, 512)
    use_top_k: bool = True
    top_k_ratio: float = 0.3
    use_focal: bool = False
    use_lovasz: bool = False
    # hydranet_tpu extension: > 0 computes the Lovász with the sort-free
    # binned-rank formulation (heads/segmentation_loss.py::
    # lovasz_softmax_binned) — O(1/bins) from the exact loss, MXU
    # histograms instead of a row-serial multi-million-element TPU sort.
    # 0 keeps the exact sort-based form (reference parity; craters TPU
    # step time at training shapes — see the RuntimeWarning).
    lovasz_bins: int = 0
    segment_weight: float = 5.0
    # hydranet_tpu extension: rematerialize the whole seg decoder in the
    # backward pass (jax.checkpoint over the head) — the decoder's
    # full-resolution activations are the largest in the train step, and
    # recomputing them costs one extra head forward. Unlocks larger train
    # batches; see backbone.remat for the stage-level backbone analog.
    remat: bool = False
    # hydranet_tpu extension: train-time phase CE — the final seg stage
    # emits phase logits (4*C channels at half resolution) and the CE
    # consumes exact per-phase slices; identical loss/gradients (pixel
    # reductions are permutation-invariant) without ever materializing
    # the full-res C=5 logits, whose minor dim lane-pads 5 -> 128 on TPU.
    phase_loss: bool = False
    # hydranet_tpu extension: train-time W-PACKED phase CE — the final
    # stage emits [B, H+1, WG, g*4*C] w-packed phase logits (the wpack
    # trick that won the inference headline) and the CE consumes the
    # packed layout directly (heads/segmentation_loss.py::
    # cross_entropy_loss_wpacked). Value is the column-group size g
    # (0 = off; 6 fills 120/128 lanes at C=5). Identical loss/grads to
    # the full-res CE; unlike phase_loss, neither direction ever
    # materializes a 20->128 lane-padded tensor.
    wpack_loss: int = 0

    def __post_init__(self):
        object.__setattr__(self, "class_list", tuple(self.class_list))
        object.__setattr__(self, "class_weight", tuple(self.class_weight))
        object.__setattr__(self, "channel_dimension_seg_encode",
                           tuple(self.channel_dimension_seg_encode))
        object.__setattr__(self, "channel_dimension_seg_decode",
                           tuple(self.channel_dimension_seg_decode))

    @property
    def num_classes(self) -> int:
        return len(self.class_list)


@dataclass(frozen=True)
class LaneCfg:
    anchor_stride: int = 32
    interval: int = 8
    anchor_lane_num: int = 1
    interpolate: bool = True
    scale_invariance: bool = True
    base_channel: int = 448
    num_classes: int = 2
    conf_thres: float = 0.8
    nms_thres: float = 100
    loss_cls_pos_weight: float = 1.0
    loss_cls_neg_weight: float = 1.0
    loss_loc_weight: float = 1.0
    lane_weight: float = 1.0
    # On-device decode capacities (new; reference decodes per-anchor in Python).
    max_lanes: int = 16
    pre_nms_top_k: int = 64


@dataclass(frozen=True)
class Config:
    tag: str = "hydranet"
    train: TrainCfg = field(default_factory=TrainCfg)
    dataloader: DataloaderCfg = field(default_factory=DataloaderCfg)
    backbone: BackboneCfg = field(default_factory=BackboneCfg)
    detection: DetectionCfg = field(default_factory=DetectionCfg)
    segment: SegmentCfg = field(default_factory=SegmentCfg)
    lane: LaneCfg = field(default_factory=LaneCfg)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "Config":
        return Config(
            tag=d.get("tag", "hydranet"),
            train=TrainCfg(**_filter_kwargs(TrainCfg, d.get("train", {}))),
            dataloader=DataloaderCfg(**_filter_kwargs(DataloaderCfg, d.get("dataloader", {}))),
            backbone=BackboneCfg(**_filter_kwargs(BackboneCfg, d.get("backbone", {}))),
            detection=DetectionCfg(**_filter_kwargs(DetectionCfg, d.get("detection", {}))),
            segment=SegmentCfg(**_filter_kwargs(SegmentCfg, d.get("segment", {}))),
            lane=LaneCfg(**_filter_kwargs(LaneCfg, d.get("lane", {}))),
        )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    # Derived quantities used across the model (reference computes these in
    # several places — model.py:34-35, lanedetect.py:34-39).
    @property
    def input_hw(self) -> Tuple[int, int]:
        return (self.dataloader.network_input_height, self.dataloader.network_input_width)

    @property
    def lane_points_per_line(self) -> int:
        return int(self.dataloader.network_input_height // self.lane.interval)

    @property
    def lane_feat_hw(self) -> Tuple[int, int]:
        return (self.dataloader.network_input_height // self.lane.anchor_stride,
                self.dataloader.network_input_width // self.lane.anchor_stride)


def load_config(path: str) -> Config:
    with open(path) as f:
        return Config.from_dict(yaml.safe_load(f))
