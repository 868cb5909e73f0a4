"""Benchmark: full 3-head HydraNet inference pipeline on one TPU chip.

Protocol (BASELINE.md): warmup + timed iterations (the reference's C++ demo
uses 10 warmup + 20 timed, Demo.cpp:27-28). We run the flagship big-backbone
config end to end — on-device preprocess (resize from demo resolution +
normalize), 3-head forward in bf16, and all post-processing (box decode +
class-aware NMS, seg argmax, lane decode + lane NMS) — in ONE XLA program,
batched. Reports frames/sec/chip and p50 per-batch latency.

Prints one JSON line; vs_baseline is measured against the driver-set
north-star target of 500 frames/sec/chip (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "10"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
DEMO_HW = (1080, 1920)  # demo video resolution (reference demo.py:160)
TARGET_FPS = 500.0


def main():
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.config import load_config
    from hydranet_tpu.inference import InferencePipeline
    from hydranet_tpu.models.hydranet import HydraNet

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(os.path.join(repo,
                                   "configs/hydranet_joint_big_backbone.yml"))

    model = HydraNet(cfg=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    pipe = InferencePipeline(cfg, variables, batch_size=BATCH,
                             input_hw=DEMO_HW, compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, size=(BATCH, *DEMO_HW, 3), dtype=np.uint8)
    frames_dev = jax.device_put(jnp.asarray(frames))

    def run_once():
        res = pipe._run(pipe.variables, frames_dev)
        jax.block_until_ready(res)
        return res

    for _ in range(WARMUP):
        run_once()

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)

    times = np.asarray(times)
    fps = BATCH / np.median(times)
    p50_ms = float(np.median(times) / BATCH * 1000.0)

    print(json.dumps({
        "metric": ("frames/sec/chip, full 3-head pipeline e2e "
                   f"(1080p in, 640x640 net, bs{BATCH}, bf16, "
                   "preprocess+forward+NMS+lane decode on device); "
                   f"p50 {p50_ms:.2f} ms/frame"),
        "value": round(float(fps), 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(float(fps) / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
