"""int8 PTQ vs bf16 in LATENCY mode (VERDICT r4 item 7).

Round 3 measured int8 at the throughput point (bs128) and found nothing:
1141.7 vs 1136.5 fps — the bs128 pipeline is not MXU-bound, so halving
the MXU time buys ~0. This sweeps the small-batch latency regime
(bs 1 / 4 / 8 / 16, flagship big-backbone pipeline, 1080p frames), where
the MXU share of the wall is larger and the int8 2x-rate claim actually
gets a chance. Output feeds the decision table in docs/KNOBS.md: either
an operating point where int8 wins, or the measured record that there is
none and the knob is accuracy-neutral ballast.

Usage: python scripts/bench_int8_latency.py   (BENCH_ITERS overrides 20)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_ITERS", "20"))
BATCHES = [int(b) for b in
           os.environ.get("BENCH_BATCHES", "1,4,8,16").split(",")]
DEMO_HW = (1080, 1920)


def main():
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.config import load_config
    from hydranet_tpu.inference import InferencePipeline
    from hydranet_tpu.models.hydranet import HydraNet

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config(os.path.join(repo,
                                   "configs/hydranet_joint_big_backbone.yml"))
    model = HydraNet(cfg=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    rng = np.random.RandomState(0)
    print(f"{'bs':>4s} {'bf16 ms':>9s} {'int8 ms':>9s} {'delta':>7s}")
    for bs in BATCHES:
        frames = rng.randint(0, 255, size=(bs, *DEMO_HW, 3), dtype=np.uint8)
        frames_dev = jax.device_put(jnp.asarray(frames))
        row = {}
        for quant in ("off", "int8"):
            pipe = InferencePipeline(cfg, variables, batch_size=bs,
                                     input_hw=DEMO_HW,
                                     compute_dtype=jnp.bfloat16, quant=quant)
            if quant == "int8":
                pipe.calibrate([frames])
            digest = jax.jit(
                lambda r: jnp.sum(r["detections"].scores)
                + jnp.sum(r["lanes"].prob)
                + jnp.sum(r["seg"]).astype(jnp.float32))
            for _ in range(3):
                np.asarray(digest(pipe._run(pipe.variables, frames_dev)))
            # latency mode: sync per batch (p50 of ITERS runs)
            lat = []
            for _ in range(ITERS):
                t0 = time.perf_counter()
                np.asarray(digest(pipe._run(pipe.variables, frames_dev)))
                lat.append((time.perf_counter() - t0) * 1000)
            row[quant] = float(np.median(lat))
        d = (row["int8"] - row["off"]) / row["off"] * 100
        print(f"{bs:4d} {row['off']:9.2f} {row['int8']:9.2f} {d:+6.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
