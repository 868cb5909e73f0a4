"""Isolate the tunnel-client host-memory leak seen in the 40-epoch
convergence run (main process OOM-killed at 123 GB anon RSS,
~3.2 GB/epoch ~= 80-100 MB/step at bs16 640^2).

scripts/mem_probe_trainer.py already cleared our code on CPU (live jax
arrays flat, RSS ~15 MB/epoch). This probe runs ON THE REAL CHIP and
A/B-tests the two remaining suspects, at convergence-run shapes:

  A. donated train step (what the trainer ships: donate_argnums=(0,))
  B. non-donated train step
  C. inference-style dispatch loop (control — the serving soak showed
     no drift, so this should stay flat)

Each cell runs `--steps` dispatches of the SAME compiled program on
fresh host batches and reports the RSS slope in MB/step. A slope that
appears in A but not B convicts donated-buffer retention in the axon
PJRT client; a slope in both A and B convicts per-transfer staging.

Usage: python scripts/mem_probe_hw.py [--steps 30] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def anon_rss_mb() -> float:
    with open("/proc/self/smaps_rollup") as f:
        for line in f:
            if line.startswith("Anonymous:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def slope_mb_per_step(rss_series):
    xs = np.arange(len(rss_series), dtype=np.float64)
    ys = np.asarray(rss_series, dtype=np.float64)
    return float(np.polyfit(xs, ys, 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=640)
    args = ap.parse_args()

    from hydranet_tpu.config import load_config, Config
    from hydranet_tpu.models.hydranet import HydraNet
    from hydranet_tpu.parallel.train_step import (
        TrainState, all_trainable, make_train_step)
    from hydranet_tpu.train.optimizer import make_optimizer

    d = load_config("configs/hydranet_convergence_procedural.yml").to_dict()
    d["dataloader"]["network_input_width"] = args.hw
    d["dataloader"]["network_input_height"] = args.hw
    cfg = Config.from_dict(d)
    model = HydraNet(cfg=cfg, dtype=jnp.bfloat16)
    h = w = args.hw
    rng = np.random.default_rng(0)

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3), jnp.float32))
    tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay, 1000)

    def fresh_state():
        return TrainState(params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=tx.init(variables["params"]),
                          step=jnp.zeros((), jnp.int32))

    mask = all_trainable(variables["params"])
    nA = 64  # loader Collater max_annotations default

    def host_batch():
        img = rng.standard_normal((args.batch, h, w, 3), dtype=np.float32)
        gt_det = np.full((args.batch, nA, 5), -1, np.float32)
        gt_det[:, 0] = [100, 100, 200, 200, 1]
        gt_seg = rng.integers(0, cfg.segment.num_classes,
                              (args.batch, h, w), dtype=np.int64)
        fh, fw = cfg.lane_feat_hw
        pts = cfg.lane_points_per_line
        anchors = fh * fw
        gt_cls = np.zeros((args.batch, anchors, 2), np.float32)
        gt_cls[..., 0] = 1.0
        gt_loc = np.zeros((args.batch, anchors, 2 * pts + 2), np.float32)
        return dict(image=img, gt_det=gt_det, gt_seg=gt_seg,
                    gt_cls=gt_cls, gt_loc=gt_loc)

    def run_cell(name, donate):
        state = fresh_state()
        step = make_train_step(model, tx, mesh=None, donate=donate)
        # compile + settle
        state, losses = step(state, {k: jnp.asarray(v) for k, v in
                                     host_batch().items()}, mask)
        jax.block_until_ready(losses["total_loss"])
        float(losses["total_loss"])
        rss = []
        t0 = time.time()
        for i in range(args.steps):
            dbatch = {k: jnp.asarray(v) for k, v in host_batch().items()}
            state, losses = step(state, dbatch, mask)
            if i % 5 == 4:  # trainer fetches losses at print cadence
                float(losses["total_loss"])
            rss.append(anon_rss_mb())
        float(losses["total_loss"])
        dt = (time.time() - t0) / args.steps
        print(f"[hwprobe] {name}: slope {slope_mb_per_step(rss):+.1f} MB/step"
              f" (rss {rss[0]:.0f} -> {rss[-1]:.0f} MB over {args.steps}"
              f" steps, {dt * 1e3:.0f} ms/step)", flush=True)
        del state, step
        return rss

    print(f"[hwprobe] platform={jax.devices()[0].platform} "
          f"batch={args.batch} hw={args.hw}", flush=True)
    run_cell("train donate=True ", donate=True)
    run_cell("train donate=False", donate=False)

    # control: forward-only dispatch loop (serving-like, no donation)
    from hydranet_tpu.inference import InferencePipeline

    pipe = InferencePipeline(cfg, variables, batch_size=args.batch)
    frames = rng.integers(0, 255, (args.batch, 1080, 1920, 3), np.uint8)
    pipe(frames)  # compile
    rss = []
    for i in range(args.steps):
        out = pipe(np.ascontiguousarray(frames))
        rss.append(anon_rss_mb())
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f"[hwprobe] serving control   : slope "
          f"{slope_mb_per_step(rss):+.1f} MB/step "
          f"(rss {rss[0]:.0f} -> {rss[-1]:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
