"""int8 PTQ accuracy + speed study (ops/quantize.py) on a trained checkpoint.

Loads a checkpoint (default: the newest epoch under the convergence run's
logs), calibrates activation scales on K training batches, then evaluates
the SAME val protocol (mIoU / COCO mAP / lane F1 — the trainer.valid
machinery) once with the float forward and once with the int8 forward, and
reports the deltas. With --bench (and a TPU backend) it also times both
forwards at the eval batch size.

Usage:
  python scripts/ptq_study.py [--ckpt DIR] [--calib-batches 8] [--bench]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/hydranet_convergence_procedural.yml")
    ap.add_argument("--data", default="artifacts/procedural_data")
    ap.add_argument("--ckpt", default="",
                    help="orbax epoch_N dir; default = newest in the "
                         "convergence logs")
    ap.add_argument("--calib-batches", type=int, default=8)
    ap.add_argument("--calib-percentile", default="100,99.5",
                    help="comma-separated percentiles across calibration "
                         "samples for the activation scale (100 = absmax); "
                         "one int8 eval row per value")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--max-val-batches", type=int, default=0,
                    help="cap val batches per eval (0 = full set); for "
                         "CPU smoke tests")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (sitecustomize force-registers "
                         "the remote-TPU platform, overriding env vars)")
    ap.add_argument("--out", default="artifacts/ptq_study.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from train_convergence import latest_checkpoint

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hydranet_tpu.config import Config, load_config
    from hydranet_tpu.metrics.coco_eval import COCOMeanAP, gen_coco_gt
    from hydranet_tpu.metrics.lane_metric import LaneMetric
    from hydranet_tpu.metrics.seg_metrics import IntersectionOverUnion
    from hydranet_tpu.ops import quantize as qz
    from hydranet_tpu.train.trainer import (HydraTrainer, coco_det_rows,
                                            lane_eval_rows)

    d = load_config(args.config).to_dict()
    d["dataloader"]["data_list"] = os.path.join(args.data, "list")
    ckpt = args.ckpt or latest_checkpoint(
        d["train"].get("logs", "artifacts/convergence_logs"))
    if ckpt:
        d["train"]["resume_from"] = ckpt
    print("checkpoint:", ckpt or "(random init — accuracy deltas are only "
                                 "meaningful with a trained model)")
    cfg = Config.from_dict(d)
    trainer = HydraTrainer(cfg)
    model = trainer.model
    params, batch_stats = trainer.state.params, trainer.state.batch_stats

    # ---- calibration: per-conv input absmax over K train batches ----
    def calib_fwd(params, batch_stats, image):
        with qz.quant_mode("calibrate"):
            _, st = model.apply(
                {"params": params, "batch_stats": batch_stats}, image,
                train=False, mutable=["act_stats"])
        return st["act_stats"]

    calib_jit = jax.jit(calib_fwd)
    batches = []
    for i, batch in enumerate(trainer.trainloader):
        if i >= args.calib_batches:
            break
        batches.append(jax.device_get(
            calib_jit(params, batch_stats, jnp.asarray(batch["image"]))))
    percentiles = [float(p) for p in args.calib_percentile.split(",")]
    accs = {p: qz.reduce_calibration(batches, p) for p in percentiles}
    n_scales = len(jax.tree_util.tree_leaves(accs[percentiles[0]]))
    print(f"calibrated {n_scales} activation scales over "
          f"{len(batches)} batches (percentiles {percentiles})")

    # ---- all forwards traced from the same function body ----
    def make_fwd(mode: str, acc=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if mode == "int8":
            variables = {**variables, "act_stats": acc}

        def fwd(image):
            with qz.quant_mode(mode if mode == "int8" else "off"):
                return model.apply(variables, image, train=False)

        return jax.jit(fwd)

    h, w = cfg.input_hw

    def evaluate(fwd, tag: str):
        iou = IntersectionOverUnion(n_classes=cfg.segment.num_classes)
        root = cfg.dataloader.data_list.replace("/list", "")
        gt_ann, image_ids, id_to_path = gen_coco_gt(root)
        coco = COCOMeanAP(gt_ann,
                          categories=list(
                              range(1, cfg.detection.num_classes + 1)),
                          image_ids=image_ids)
        path_to_id = {p: i for i, p in id_to_path.items()}
        lane_metric = LaneMetric(method="f1_measure", iou_thresh=0.5,
                                 lane_width=30, thresh_list=[0.5])
        det_result = []
        for vb, batch in enumerate(trainer.validloader):
            if args.max_val_batches and vb >= args.max_val_batches:
                break
            image = jnp.asarray(batch["image"])
            out = fwd(image)
            pred = jnp.argmax(out["seg"], axis=-1)
            iou.update(pred, jnp.asarray(batch["gt_seg"]))
            det = out["detection"]
            dets = trainer._decode_det(det["anchors"], det["regression"],
                                       det["classification"])
            # same decode/rescale/id protocol as HydraTrainer.valid
            det_result.extend(coco_det_rows(dets, batch, path_to_id,
                                            (h, w)))
            lanes = trainer._decode_lane(out["lane"]["predict_cls"],
                                         out["lane"]["predict_loc"])
            lane_metric(output=lane_eval_rows(
                lanes, batch, cfg, trainer.valid_data.parse_own_label))
        row = {"mode": tag,
               "mIoU": round(float(np.mean(iou.compute())), 4)}
        if det_result:
            coco.update(det_result)
            row["AP"] = round(coco.summarize()["AP"], 4)
        row["lane_f1"] = round(float(lane_metric.summary()), 4)
        return row

    def bench(fwd, tag: str, iters: int = 10):
        batch = next(iter(trainer.validloader))
        image = jax.device_put(jnp.asarray(batch["image"]))
        digest = jax.jit(lambda o: jnp.sum(o["seg"].astype(jnp.float32)))
        r = fwd(image); np.asarray(digest(r))
        r = fwd(image); np.asarray(digest(r))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fwd(image)
        np.asarray(digest(r))
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"[bench] {tag}: {ms:.1f} ms/batch "
              f"({image.shape[0] * 1000 / ms:.1f} img/s)")
        return ms

    runs = [("off", "float", None)]
    runs += [("int8", f"int8@p{p:g}", accs[p]) for p in percentiles]
    rows = []
    for mode, tag, acc in runs:
        fwd = make_fwd(mode, acc)
        row = evaluate(fwd, tag)
        if args.bench:
            row["fwd_ms"] = round(bench(fwd, tag), 1)
        print("RESULT:", json.dumps(row), flush=True)
        rows.append(row)

    with open(args.out, "w") as f:
        json.dump({"checkpoint": ckpt, "calib_batches": args.calib_batches,
                   "percentiles": percentiles,
                   "n_scales": n_scales, "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
