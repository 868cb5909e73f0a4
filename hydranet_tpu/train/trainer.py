"""Training + validation harness (TPU-native equivalent of
/root/reference/model/train.py).

Differences from the reference, by design:
- the whole train step (forward + loss + backward + masked update) is one
  jitted XLA program; the fine-tuning schedule feeds a {0,1} mask instead of
  swapping optimizer param groups (train.py:460-508).
- validation decodes (seg argmax, det box decode+NMS, lane decode+NMS) run
  on device in fixed shapes; only compact results stream back for the
  mIoU / COCO-mAP / lane-F1 metrics (the reference runs per-anchor Python
  loops per sample — train.py:271-438).
- checkpoints carry optimizer state + step (the reference restarts its LR
  schedule on resume).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hydranet_tpu.config import Config
from hydranet_tpu.data.dataset import MultitaskDataset
from hydranet_tpu.data.loader import DataLoader
from hydranet_tpu.heads import detection as det_ops
from hydranet_tpu.heads import lane_codec as lane_ops
from hydranet_tpu.metrics.coco_eval import COCOMeanAP, gen_coco_gt
from hydranet_tpu.metrics.lane_metric import LaneMetric
from hydranet_tpu.metrics.seg_metrics import IntersectionOverUnion
from hydranet_tpu.models.hydranet import HydraNet
from hydranet_tpu.parallel.mesh import make_mesh
from hydranet_tpu.parallel.train_step import (
    TrainState, all_trainable, head_mask, make_eval_step,
    make_precise_bn_step, make_train_step, run_precise_bn)
from hydranet_tpu.train.checkpoint import (
    import_torch_weights, restore_checkpoint, save_checkpoint)
from hydranet_tpu.train.optimizer import cosine_annealing_lr, make_optimizer
from hydranet_tpu.utils.table import format_table


def coco_det_rows(dets, batch, path_to_id, net_hw) -> List[Dict]:
    """Fixed-shape Detections -> COCO result dicts for one batch.

    Prediction ids are keyed by source path via `path_to_id` (the
    gen_coco_gt id map): images with empty label files have no GT id
    (reference convention, gen_val_json.py:31-109) and contribute no
    predictions rather than shifting later images' ids. Boxes are
    rescaled network->source resolution. Shared by HydraTrainer.valid
    and scripts/ptq_study.py so the eval protocol exists once."""
    h, w = net_hw
    boxes = np.asarray(dets.boxes)
    scores = np.asarray(dets.scores)
    classes = np.asarray(dets.classes)
    valid = np.asarray(dets.valid)
    rows: List[Dict] = []
    for bi in range(boxes.shape[0]):
        shape = batch["src_image_shape"][bi]
        sx = w / float(shape["width"])
        sy = h / float(shape["height"])
        image_id = path_to_id.get(batch["src_image_path"][bi])
        if image_id is None:
            continue
        for k in np.where(valid[bi])[0]:
            x1, y1, x2, y2 = boxes[bi, k]
            rows.append(dict(
                image_id=image_id,
                category_id=int(classes[bi, k]) + 1,
                score=float(scores[bi, k]),
                bbox=[float(x1) / sx, float(y1) / sy,
                      float(x2 - x1) / sx, float(y2 - y1) / sy]))
    return rows


def lane_eval_rows(lanes, batch, cfg: Config, parse_label) -> List[Dict]:
    """Decoded device lanes -> LaneMetric {pr_result, gt_result} rows for
    one batch, points rescaled to source resolution. Shared by
    HydraTrainer.valid and scripts/ptq_study.py."""
    h, w = cfg.input_hw
    rows: List[Dict] = []
    for bi in range(len(batch["src_image_shape"])):
        shape = batch["src_image_shape"][bi]
        one = jax.tree_util.tree_map(lambda a: a[bi], lanes)
        lines = lane_ops.lanes_to_points(
            one, input_height=h,
            interval=h / cfg.lane_points_per_line,
            scale_x=shape["width"] / w,
            scale_y=shape["height"] / h)
        gt = {**parse_label(json.load(open(batch["annot_lane_path"][bi]))),
              "Shape": shape}
        rows.append(dict(pr_result={"Lines": lines, "Shape": shape},
                         gt_result=gt))
    return rows


class HydraTrainer:
    def __init__(self, cfg: Config, cfg_path: Optional[str] = None,
                 use_mesh: bool = True):
        self.cfg = cfg
        self.tag = cfg.tag
        self.print_interval = cfg.train.print_interval

        # run dir + config backup — train.py:39-47
        self.save_dir = os.path.join(
            cfg.train.logs, time.strftime("%d_%B_%Y_%H_%M_%S") + "_" + self.tag)
        os.makedirs(self.save_dir, exist_ok=True)
        if cfg_path and os.path.exists(cfg_path):
            shutil.copy(cfg_path, os.path.join(self.save_dir, "config.yml"))
        self.model_save_dir = os.path.join(self.save_dir, "model")
        os.makedirs(self.model_save_dir, exist_ok=True)

        self.train_detect = cfg.train.train_detect
        self.train_seg = cfg.train.train_seg
        self.train_lane = cfg.train.train_lane

        # data — train.py:66-84
        self.train_data = MultitaskDataset(cfg, mode="train")
        self.valid_data = MultitaskDataset(cfg, mode="val")
        # num_worker_* > 0 → persistent forked worker pool doing the full
        # per-sample pipeline + collation off the main process
        # (reference train.py:67-84 DataLoader(num_workers=...)). Under
        # multi-host DP each process loads a disjoint shard of every epoch
        # (the DistributedSampler the reference never wires up).
        self.trainloader = DataLoader(
            self.train_data, batch_size=cfg.train.batch_size_train,
            shuffle=True, num_workers=cfg.train.num_worker_train,
            shard_rank=jax.process_index(),
            shard_count=jax.process_count())
        self.validloader = DataLoader(
            self.valid_data, batch_size=cfg.train.batch_size_valid,
            shuffle=False, num_workers=cfg.train.num_worker_valid)

        # mesh + model — the DP mesh replaces DDP (train.py:129-137)
        self.mesh = make_mesh() if use_mesh else None
        dtype = (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
                 else None)
        self.model = HydraNet(cfg=cfg, dtype=dtype)
        h, w = cfg.input_hw
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(0), dummy)

        # checkpoint resume / torch import — train.py:95-126
        if cfg.train.continue_train:
            variables = import_torch_weights(
                variables,
                weight_file=cfg.train.weight_file,
                weight_file_lane=cfg.train.weight_file_lane,
                weight_file_seg=cfg.train.weight_file_seg,
                weight_file_det=cfg.train.weight_file_det)

        self.epoch = cfg.train.epoch
        self.total_iters = len(self.trainloader) * self.epoch
        self.tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                                 self.total_iters)
        self.lr_schedule = cosine_annealing_lr(cfg.train.lr, self.total_iters)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32))
        self.start_epoch = 0
        if cfg.train.resume_from:
            self.state = restore_checkpoint(
                cfg.train.resume_from, target=jax.device_get(self.state))
            self.start_epoch = (int(self.state.step)
                                // max(1, len(self.trainloader)))
            print(f"resumed from {cfg.train.resume_from} "
                  f"(step {int(self.state.step)} -> epoch {self.start_epoch})")

        self.train_step = make_train_step(self.model, self.tx, mesh=self.mesh)
        self.eval_step = make_eval_step(self.model, mesh=self.mesh)
        self.precise_bn_step = (
            make_precise_bn_step(self.model, mesh=self.mesh)
            if cfg.train.precise_bn_batches > 0 else None)
        self._mask_all = all_trainable(self.state.params)

        # metrics — train.py:172-189
        if self.train_seg:
            self.metric_evaluator_iou = IntersectionOverUnion(
                n_classes=cfg.segment.num_classes)
        if self.train_detect:
            self.root_dir = cfg.dataloader.data_list.replace("/list", "")
            try:
                gt_ann, image_ids, id_to_path = gen_coco_gt(self.root_dir)
                self.coco_eval = COCOMeanAP(
                    gt_ann, categories=list(range(1, cfg.detection.num_classes + 1)),
                    image_ids=image_ids[:cfg.detection.max_images])
                # Prediction image_ids are keyed by image PATH through this
                # map. The reference instead assigns ids by loader position
                # (train.py:343) while its GT ids skip empty-label images
                # (gen_val_json.py:31-109), so one empty-label val image
                # shifts every subsequent id and silently corrupts mAP —
                # reproduced in round 2, fixed here.
                self._det_path_to_id = {p: i for i, p in id_to_path.items()}
                # persist the GT json side-file for drop-in tooling parity
                # with reference gen_val_json.py (train.py:176-185)
                from hydranet_tpu.metrics.coco_eval import write_coco_gt_json

                write_coco_gt_json(self.root_dir,
                                   class_names=cfg.detection.class_list[1:])
            except (FileNotFoundError, OSError):
                self.coco_eval = None
                self._det_path_to_id = {}
        if self.train_lane:
            self.lane_metric = LaneMetric(method="f1_measure", iou_thresh=0.5,
                                          lane_width=30, thresh_list=[0.5])

        # device-side validation decoders
        cfg_d, cfg_l = cfg.detection, cfg.lane
        fh, fw = cfg.lane_feat_hw

        def _decode_det(anchors, regression, classification):
            return det_ops.postprocess(
                anchors, regression, classification, cfg.input_hw,
                score_threshold=cfg_d.eval_score_threshold, iou_threshold=0.3,
                pre_nms_top_k=cfg_d.pre_nms_top_k,
                max_detections=cfg_d.max_detections)

        def _decode_lane(predict_cls, predict_loc):
            def one(cls_i, loc_i):
                lanes = lane_ops.decode_lanes(
                    jax.nn.softmax(cls_i, axis=-1), loc_i,
                    feature_height=fh, feature_width=fw,
                    points_per_line=cfg.lane_points_per_line,
                    interval=h / cfg.lane_points_per_line,
                    stride=cfg_l.anchor_stride, input_width=w, input_height=h,
                    scale_invariance=cfg_l.scale_invariance,
                    exist_threshold=0.5)
                return lane_ops.lane_nms(lanes, thresh=100,
                                         top_k=cfg_l.pre_nms_top_k,
                                         max_lanes=cfg_l.max_lanes)
            return jax.vmap(one)(predict_cls, predict_loc)

        self._decode_det = jax.jit(_decode_det)
        self._decode_lane = jax.jit(_decode_lane)

    # ------------------------------------------------------------------ utils

    def _device_batch(self, batch: Dict) -> Dict[str, jnp.ndarray]:
        keys = ["image"]
        if self.train_lane:
            keys += ["gt_loc", "gt_cls"]
        if self.train_seg:
            keys += ["gt_seg"]
        if self.train_detect:
            keys += ["gt_det"]
        return {k: jnp.asarray(batch[k]) for k in keys}

    def print_loss_info(self, losses: Dict[str, Any], epoch: int,
                        batch_idx: int, total: int, mode: str = "train"):
        lr = float(self.lr_schedule(int(self.state.step)))
        print(f"{mode.upper()} Epoch [{epoch}|{self.epoch}] "
              f"Iter [{batch_idx}|{total}] Lr {lr:.5f}")
        keys = list(losses.keys())
        print(format_table(keys, [[f"{float(losses[k]):.3f}" for k in keys]]))
        print()

    def _phase_mask(self, epoch: int):
        """Fine-tuning schedule — train.py:446-508: joint for epoch_joint
        epochs then one tuning block (lane, det, seg) per turn."""
        cfg = self.cfg.train
        if not cfg.fine_tuning:
            return self._mask_all, "JOINT"
        et, tt = cfg.epoch_tuning, cfg.tuning_turn
        assert 3 * et * tt <= self.epoch
        epoch_joint = int(self.epoch / tt) - et * 3
        e = epoch % (epoch_joint + et * 3)
        if e < epoch_joint:
            return self._mask_all, "JOINT"
        if e < epoch_joint + et:
            return head_mask(self.state.params, "laneheader"), "LANE"
        if e < epoch_joint + 2 * et:
            return head_mask(self.state.params, "detectheader"), "DET"
        return head_mask(self.state.params, "segheader"), "SEG"

    # ------------------------------------------------------------------ train

    def _device_prefetch(self, loader):
        """Stage batch k+1 on device while step k runs (JAX dispatch is
        async, so device_put overlaps with the in-flight train step)."""
        it = iter(loader)
        prev = None
        for batch in it:
            staged = self._device_batch(batch)
            if prev is not None:
                yield prev
            prev = staged
        if prev is not None:
            yield prev

    def train_one_epoch(self, epoch: int):
        mask, phase = self._phase_mask(epoch)
        print(f"======= EPOCH {epoch} {phase} TRAINING =======")
        n = len(self.trainloader)
        for it, batch in enumerate(self._device_prefetch(self.trainloader)):
            self.state, losses = self.train_step(self.state, batch, mask)
            if it % self.print_interval == 0:
                # divergence guard — equivalent of the reference's
                # non-finite-loss aborts (model.py:212-258), checked at print
                # cadence so the hot loop stays sync-free.
                for k, v in losses.items():
                    if not np.isfinite(float(v)):
                        raise RuntimeError(
                            f"loss '{k}' diverged (non-finite) at epoch "
                            f"{epoch} iter {it}")
                self.print_loss_info(losses, epoch, it, n, mode="train")

    # ------------------------------------------------------------------ valid

    def _precise_bn(self):
        """Re-estimate BN population stats over K training batches and store
        them in state (precise-BN; see parallel/train_step.py). The stored
        stats are strictly better estimates than the EMA they replace, so
        subsequent training/checkpoints keep them too."""
        k = self.cfg.train.precise_bn_batches

        def images():
            for i, batch in enumerate(self.trainloader):
                if i >= k:
                    return
                yield jnp.asarray(batch["image"])

        new_bs = run_precise_bn(self.precise_bn_step, self.state.params,
                                self.state.batch_stats, images())
        self.state = self.state._replace(batch_stats=new_bs)

    def valid(self, epoch: int):
        cfg = self.cfg
        h, w = cfg.input_hw
        if self.precise_bn_step is not None:
            self._precise_bn()
        # Fresh accumulators per validation epoch. The reference never
        # resets these (train.py:174,188-189 build them once at init and
        # compute()/summary() don't clear), so its per-epoch mIoU / lane F1
        # are actually running averages over ALL validations so far —
        # later epochs are understated. Fixed here; COCO eval already
        # resets below.
        if self.train_seg:
            self.metric_evaluator_iou.reset()
        if self.train_lane:
            self.lane_metric.reset()
        detect_result: List[Dict] = []
        n = len(self.validloader)

        for it, batch in enumerate(self.validloader):
            dbatch = self._device_batch(batch)
            outputs, losses = self.eval_step(self.state.params,
                                             self.state.batch_stats, dbatch)
            self.print_loss_info(losses, epoch, it, n, mode="valid")

            if self.train_seg:
                pred = jnp.argmax(outputs["seg"], axis=-1)
                self.metric_evaluator_iou.update(pred, dbatch["gt_seg"])

            if self.train_detect:
                d = outputs["detection"]
                dets = self._decode_det(d["anchors"], d["regression"],
                                        d["classification"])
                detect_result.extend(coco_det_rows(
                    dets, batch, self._det_path_to_id, (h, w)))

            if self.train_lane:
                lanes = self._decode_lane(outputs["lane"]["predict_cls"],
                                          outputs["lane"]["predict_loc"])
                self.lane_metric(output=lane_eval_rows(
                    lanes, batch, cfg, self.valid_data.parse_own_label))

        summary: Dict[str, float] = {}
        if self.train_seg:
            print(f"====================== metric segmentation {epoch} "
                  f"======================")
            scores = self.metric_evaluator_iou.compute()
            for name, v in zip(cfg.segment.class_list, scores):
                print(f"{name}, {v:.3f}")
            miou = float(np.mean(scores))
            print(f"mIOU, {miou:.3f}")
            summary["mIoU"] = miou

        if self.train_detect and getattr(self, "coco_eval", None) is not None:
            print(f"====================== metric detection {epoch} "
                  f"======================")
            if detect_result:
                # persist predictions like the reference's
                # eval_detect/val_bbox_results.json (train.py:420-424)
                eval_dir = os.path.join(self.root_dir, "eval_detect")
                try:
                    os.makedirs(eval_dir, exist_ok=True)
                    with open(os.path.join(eval_dir,
                                           "val_bbox_results.json"), "w") as f:
                        json.dump(detect_result, f, indent=4)
                except OSError:
                    pass
                self.coco_eval.reset()
                self.coco_eval.update(detect_result)
                summary.update(self.coco_eval.summarize())

        if self.train_lane:
            print(f"====================== metric lane {epoch} "
                  f"======================")
            f1 = self.lane_metric.summary()
            print(f1)
            summary["lane_f1"] = f1

        save_checkpoint(self.model_save_dir, epoch, self.state)
        return summary

    def fit(self):
        """Full training run — train.py:441-515."""
        for epoch in range(self.start_epoch, self.epoch):
            self.train_one_epoch(epoch)
            print(f"=================== VALIDATION {epoch} ===================")
            self.valid(epoch)
        print("============== finish training ==============")


def main(cfg_path: str):
    from hydranet_tpu.config import load_config

    cfg = load_config(cfg_path)
    trainer = HydraTrainer(cfg, cfg_path)
    trainer.fit()


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1
         else "configs/hydranet_joint_big_backbone.yml")
