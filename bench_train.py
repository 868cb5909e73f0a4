"""Training-step benchmark (BASELINE config 5: multitask fine-tune step —
3-head loss + backward on the shared backbone).

One jitted program per step: forward (BN stat updates) + weighted multitask
loss + backward + Adam update, bf16 compute / f32 params, batch 8 at 640x640.
Prints one JSON line (supplementary to bench.py; the driver metric is the
inference pipeline).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.config import load_config
    from hydranet_tpu.models.hydranet import HydraNet
    from hydranet_tpu.parallel.train_step import (
        TrainState, all_trainable, make_train_step)
    from hydranet_tpu.train.optimizer import make_optimizer

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(os.path.join(repo,
                                   "configs/hydranet_joint_big_backbone.yml"))
    model = HydraNet(cfg=cfg, dtype=jnp.bfloat16)
    h, w = cfg.input_hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, h, w, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay, 10000)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    mask = all_trainable(state.params)

    n_anchor = (h // 32) * (w // 32)
    ppl = cfg.lane_points_per_line
    ann = -np.ones((BATCH, 32, 5), np.float32)
    ann[:, 0] = [50, 50, 200, 260, 1]
    ann[:, 1] = [300, 300, 420, 500, 4]
    gt_cls = np.zeros((BATCH, n_anchor, 2), np.float32)
    fg = rng.rand(BATCH, n_anchor) > 0.9
    gt_cls[..., 1] = fg
    gt_cls[..., 0] = ~fg
    batch = {
        "image": x,
        "gt_seg": jnp.asarray(
            rng.randint(0, cfg.segment.num_classes, (BATCH, h, w))),
        "gt_det": jnp.asarray(ann),
        "gt_cls": jnp.asarray(gt_cls),
        "gt_loc": jnp.asarray(
            (rng.randn(BATCH, n_anchor, 2 * ppl + 2)
             * (rng.rand(BATCH, n_anchor, 2 * ppl + 2) > 0.5))
            .astype(np.float32)),
    }

    step = make_train_step(model, tx, mesh=None, donate=False)

    # warmup (compile)
    state, losses = step(state, batch, mask)
    _ = float(losses["total_loss"])
    state, losses = step(state, batch, mask)
    _ = float(losses["total_loss"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, losses = step(state, batch, mask)
    _ = float(losses["total_loss"])  # sync
    dt = (time.perf_counter() - t0) / ITERS

    print(json.dumps({
        "metric": (f"train step (3-head fwd+loss+bwd+Adam, bs{BATCH}, "
                   "640x640, bf16 compute)"),
        "value": round(BATCH / dt, 2),
        "unit": "samples/sec/chip",
        "step_ms": round(dt * 1000, 1),
    }))


if __name__ == "__main__":
    main()
