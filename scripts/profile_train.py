"""Train-step stage profile (VERDICT r2 item 2): the same stage-mix table
the inference pipeline has, for the training path.

Method: nested-prefix differencing. Each row is a separate jitted program
that runs a strict prefix of the full step; consecutive differences isolate
stage costs (XLA may fuse across stage boundaries differently per program,
so the split is approximate at the few-ms level — the same caveat the
inference stage table carries):

  fwd            forward, train=True (BN stat updates included)
  +losses        + multitask losses
  +backward      + value_and_grad over all params
  full           + Adam update with fine-tune masking (the shipped step)

Head attribution: forward and forward+backward are also measured with each
head disabled (config toggles); the deltas attribute per-head cost.

Usage: python scripts/profile_train.py  [BENCH_TRAIN_BATCH=64]
"""

from __future__ import annotations

import functools
import os
import sys
import time

# persistent XLA compile cache: first compile of the big pipeline is
# minutes through the remote-TPU tunnel; later invocations (and the other
# bench/chain scripts) reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _bench_util import timed as _timed

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))


timed = functools.partial(_timed, iters=ITERS, batch=BATCH)


def build(cfg_dict):
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.config import Config
    from hydranet_tpu.models.hydranet import HydraNet
    from hydranet_tpu.parallel.train_step import (
        TrainState, all_trainable, make_train_step)
    from hydranet_tpu.train.optimizer import make_optimizer
    from bench_train import make_batch

    cfg_dict = {k: (dict(v) if isinstance(v, dict) else v)
                for k, v in cfg_dict.items()}
    if os.environ.get("HN_PHASE_LOSS", "0") == "1":
        cfg_dict["segment"]["phase_loss"] = True
    # same remat defaults as bench_train.py: bs >= 96 only compiles with
    # backbone remat + seg-decoder remat (no-remat bs128 kills the remote
    # compile helper — bench_train_sweep_r3.log)
    if os.environ.get("BENCH_TRAIN_REMAT",
                      "1" if BATCH >= 96 else "0") == "1":
        cfg_dict["backbone"]["remat"] = True
    if os.environ.get("BENCH_TRAIN_SEG_REMAT",
                      "1" if BATCH >= 96 else "0") == "1":
        cfg_dict["segment"]["remat"] = True
    cfg = Config.from_dict(cfg_dict)
    model = HydraNet(cfg=cfg, dtype=jnp.bfloat16)
    h, w = cfg.input_hw
    batch = make_batch(cfg, BATCH, h, w)
    batch = {k: v for k, v in batch.items()
             if (cfg.train.train_seg or k != "gt_seg")
             and (cfg.train.train_detect or k != "gt_det")
             and (cfg.train.train_lane or k not in ("gt_cls", "gt_loc"))}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch["image"][:1])
    tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay, 10000)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    return model, state, batch, tx


def stage_rows(model, state, batch, tx):
    import jax

    from hydranet_tpu.parallel.train_step import all_trainable, make_train_step

    def fwd(params, bs, batch):
        return model.apply({"params": params, "batch_stats": bs},
                           batch["image"], train=True,
                           mutable=["batch_stats"])

    def fwd_eval(params, bs, batch):
        # eval-mode BN (running stats, no batch reductions / stat writes):
        # the delta vs the train-mode forward prices the ~30 BN stat
        # updates (approximate — eval mode also changes fusion)
        return model.apply({"params": params, "batch_stats": bs},
                           batch["image"], train=False)

    def fwd_loss(params, bs, batch):
        outputs, mut = fwd(params, bs, batch)
        losses = model.compute_losses(outputs, batch)
        return model.total_loss(losses), mut

    def fwd_loss_bwd(params, bs, batch):
        def loss_fn(p):
            total, mut = fwd_loss(p, bs, batch)
            return total, mut
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return total, grads

    timed("  forward (eval-mode BN)", fwd_eval,
          state.params, state.batch_stats, batch)
    t_f = timed("  forward (train, BN updates)", fwd,
                state.params, state.batch_stats, batch)
    t_fl = timed("  forward + losses", fwd_loss,
                 state.params, state.batch_stats, batch)
    t_fb = timed("  forward + losses + backward", fwd_loss_bwd,
                 state.params, state.batch_stats, batch)
    # the full step must DONATE like the shipped trainer: the non-donating
    # variant holds two full states + grads simultaneously and OOMs at
    # bs128 (chain v6 step 7). Donation invalidates the input state, so
    # time a threaded chain instead of repeated same-args dispatches.
    step = make_train_step(model, tx, donate=True)
    mask = all_trainable(state.params)
    state, losses = step(state, batch, mask)  # compile
    _ = float(losses["total_loss"])
    state, losses = step(state, batch, mask)
    _ = float(losses["total_loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, losses = step(state, batch, mask)
    _ = float(losses["total_loss"])  # sync
    t_full = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{'  full step (+ masked Adam, donated)':44s} {t_full:8.2f} ms",
          flush=True)
    return t_f, t_fl, t_fb, t_full


def main():
    from hydranet_tpu.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    base = load_config(os.path.join(
        repo, "configs/hydranet_joint_big_backbone.yml")).to_dict()

    print(f"=== full 3-head model, bs{BATCH} ===")
    rows = stage_rows(*build(base))
    t_f, t_fl, t_fb, t_full = rows
    print(f"  -> losses {t_fl - t_f:.1f} ms, backward {t_fb - t_fl:.1f} ms, "
          f"optimizer+mask {t_full - t_fb:.1f} ms")

    # Head attribution runs by default: the base table above is printed
    # and flushed first, so an outer timeout can only truncate the tail.
    if "--base-only" in sys.argv:
        return
    for head, off in [("seg", "train_seg"), ("det", "train_detect"),
                      ("lane", "train_lane")]:
        d = {k: (dict(v) if isinstance(v, dict) else v)
             for k, v in base.items()}
        d["train"] = dict(base["train"])
        d["train"][off] = False
        print(f"=== without {head} head, bs{BATCH} ===")
        model, state, batch, tx = build(d)
        stage_rows(model, state, batch, tx)


if __name__ == "__main__":
    main()
