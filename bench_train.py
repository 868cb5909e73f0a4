"""Training-step benchmark (BASELINE config 5: multitask fine-tune step —
3-head loss + backward on the shared backbone).

One jitted program per step: forward (BN stat updates) + weighted multitask
loss + backward + Adam update, bf16 compute / f32 params at 640x640. Prints
one JSON line (supplementary to bench.py; the driver metric is the inference
pipeline).

Default: single run at BENCH_TRAIN_BATCH (best measured config, see README
scaling table). Sweep mode (`--sweep` or BENCH_TRAIN_SWEEP=1): batch
{8,16,32,64} x remat {off,on}; reports samples/s, step ms, peak HBM (when the
backend exposes memory_stats) and achieved model TF/s per cell.
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent XLA compile cache: first compile of the big pipeline is
# minutes through the remote-TPU tunnel; later invocations (and the other
# bench/chain scripts) reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))
# bs128 only fits (and only COMPILES: the no-remat bs>=96 programs kill
# the remote compile helper) with backbone remat + the seg-decoder
# checkpoint; measured best cell of the r3 sweep: 237.0 samples/s /
# 46.7 TF/s vs 169.2 at bs64-no-remat (artifacts/bench_train_sweep_r3.log)
REMAT = os.environ.get("BENCH_TRAIN_REMAT", "1" if BATCH >= 96 else "0") == "1"
SEG_REMAT = os.environ.get(
    "BENCH_TRAIN_SEG_REMAT", "1" if BATCH >= 96 else "0") == "1"


def make_batch(cfg, batch_size, h, w):
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch_size, h, w, 3).astype(np.float32))
    n_anchor = (h // 32) * (w // 32)
    ppl = cfg.lane_points_per_line
    ann = -np.ones((batch_size, 32, 5), np.float32)
    ann[:, 0] = [50, 50, 200, 260, 1]
    ann[:, 1] = [300, 300, 420, 500, 4]
    gt_cls = np.zeros((batch_size, n_anchor, 2), np.float32)
    fg = rng.rand(batch_size, n_anchor) > 0.9
    gt_cls[..., 1] = fg
    gt_cls[..., 0] = ~fg
    return {
        "image": x,
        "gt_seg": jnp.asarray(
            rng.randint(0, cfg.segment.num_classes, (batch_size, h, w))),
        "gt_det": jnp.asarray(ann),
        "gt_cls": jnp.asarray(gt_cls),
        "gt_loc": jnp.asarray(
            (rng.randn(batch_size, n_anchor, 2 * ppl + 2)
             * (rng.rand(batch_size, n_anchor, 2 * ppl + 2) > 0.5))
            .astype(np.float32)),
    }


def run_cell(batch_size: int, remat: bool, iters: int,
             dtype: str = "bfloat16", seg_remat: bool = False,
             phase: bool = False, wpack: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.config import load_config, Config
    from hydranet_tpu.models.hydranet import HydraNet
    from hydranet_tpu.parallel.train_step import (
        TrainState, all_trainable, make_train_step)
    from hydranet_tpu.train.optimizer import make_optimizer

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(os.path.join(repo,
                                   "configs/hydranet_joint_big_backbone.yml"))
    if remat or seg_remat or phase or wpack:
        d = cfg.to_dict()
        d["backbone"]["remat"] = remat
        d["segment"]["remat"] = seg_remat
        d["segment"]["phase_loss"] = phase
        d["segment"]["wpack_loss"] = wpack
        cfg = Config.from_dict(d)

    model = HydraNet(cfg=cfg, dtype={"bfloat16": jnp.bfloat16,
                                     "float32": jnp.float32}[dtype])
    h, w = cfg.input_hw
    batch = make_batch(cfg, batch_size, h, w)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch["image"][:1])

    tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay, 10000)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    mask = all_trainable(state.params)

    # donate=True is what the shipped trainer runs (trainer.py): the old
    # state's buffers are reused in place, which also lowers peak HBM —
    # the bench must measure the real step
    step = make_train_step(model, tx, mesh=None, donate=True)

    state, losses = step(state, batch, mask)  # compile
    _ = float(losses["total_loss"])
    state, losses = step(state, batch, mask)
    _ = float(losses["total_loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch, mask)
    _ = float(losses["total_loss"])  # sync
    dt = (time.perf_counter() - t0) / iters

    cell = {
        "batch_size": batch_size,
        "remat": remat,
        "seg_remat": seg_remat,
        "phase_loss": phase,
        "wpack_loss": wpack,
        "dtype": dtype,
        "samples_per_s": round(batch_size / dt, 2),
        "step_ms": round(dt * 1000, 1),
    }
    # model FLOPs from the compiled executable when the backend reports them
    try:
        lowered = jax.jit(
            lambda s, b, m: step(s, b, m)).lower(state, batch, mask)
        ca = lowered.compile().cost_analysis()
        fl = (ca or {}).get("flops")
        if fl:
            cell["achieved_tf_s"] = round(fl / dt / 1e12, 1)
    except Exception:
        pass
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms and "peak_bytes_in_use" in ms:
            cell["peak_hbm_gb"] = round(ms["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    return cell


def main():
    sweep = "--sweep" in sys.argv or os.environ.get("BENCH_TRAIN_SWEEP") == "1"
    phase_env = os.environ.get("HN_PHASE_LOSS", "0") == "1"
    # w-packed phase CE (segment.wpack_loss, cross_entropy_loss_wpacked):
    # the wpack layout fix applied to the TRAIN side — the phase CE's
    # [B,321,321,20] tensor still lane-pads 20->128 (the suspected reason
    # phase_loss measured e2e-negative); the packed layout is 120/128
    wpack_env = int(os.environ.get("HN_WPACK_LOSS", "0"))
    if not sweep:
        cell = run_cell(BATCH, remat=REMAT, iters=ITERS,
                        seg_remat=SEG_REMAT, phase=phase_env,
                        wpack=wpack_env)
        print(json.dumps({
            "metric": (f"train step (3-head fwd+loss+bwd+Adam, bs{BATCH}, "
                       "640x640, bf16 compute"
                       + (", remat" if REMAT else "")
                       + (", seg-remat" if SEG_REMAT else "")
                       + (", phase CE" if phase_env else "")
                       + (f", wpack CE g={wpack_env}" if wpack_env else "")
                       + ")"),
            "value": cell["samples_per_s"],
            "unit": "samples/sec/chip",
            **{k: v for k, v in cell.items() if k != "samples_per_s"},
        }))
        return

    results = []
    cells = [(bs, remat, "bfloat16", False, False) for bs in (8, 16, 32, 64)
             for remat in (False, True)]
    # one f32-compute cell at the headline batch: quantifies what the
    # trainer's compute_dtype=bfloat16 knob buys over the f32 default
    cells.append((64, False, "float32", False, False))
    # large-batch cells with the seg-decoder checkpoint (segment.remat):
    # the decoder holds the largest activations, so seg-only remat (and
    # +backbone remat at bs128) may fit batches that OOM above, at one
    # extra head-forward of recompute
    cells += [(96, False, "bfloat16", True, False),
              (128, False, "bfloat16", True, False),
              (128, True, "bfloat16", True, False)]
    # phase-CE cells (segment.phase_loss; see heads/segmentation_loss.py
    # ::cross_entropy_loss_phases): the final seg stage's full-res logits
    # + cotangent measured ~64 ms of the bs64 step (bench_backward_r3)
    # no-remat bs>=96 (and f32 bs64) programs kill the remote compile
    # helper (HTTP 500, r3 sweep), so the big phase cell pairs with full
    # remat — the only compiling bs128 config
    cells += [(64, False, "bfloat16", False, True),
              (128, True, "bfloat16", True, True)]
    for bs, remat, dtype, seg_remat, phase in cells:
        try:
            cell = run_cell(bs, remat, ITERS, dtype, seg_remat, phase)
        except Exception as e:  # OOM is a data point, not a crash
            cell = {"batch_size": bs, "remat": remat, "seg_remat": seg_remat,
                    "phase_loss": phase, "dtype": dtype,
                    "error": type(e).__name__,
                    "msg": str(e).splitlines()[0][:160]}
        results.append(cell)
        print(json.dumps(cell), flush=True)
    ok = [c for c in results if "samples_per_s" in c]
    if ok:
        best = max(ok, key=lambda c: c["samples_per_s"])
        print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
