"""Benchmark matrix over the five BASELINE.json workloads:

1. backbone + seg head only, batch 1 (+ on-device argmax decode)
2. backbone + detection head with box decode + NMS, batch 1
3. full 3-head forward with all post-processing, batch 1
4. batched multi-frame inference (bs 16 and 128) with fused preprocessing
5. multitask train step (3-head loss + backward on shared backbone)

Prints one JSON line per config. `bench.py` remains the driver's single-line
headline (config 4 at bs128); `bench_train.py` is config 5 standalone.

Timing is pipelined (K dispatches, one device sync) — see bench.py for why.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# persistent XLA compile cache: first compile of the big pipeline is
# minutes through the remote-TPU tunnel; later invocations (and the other
# bench/chain scripts) reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np

ITERS = int(os.environ.get("BENCH_ITERS", "10"))
DEMO_HW = (1080, 1920)


def _bench(run, digest, frames, batch):
    import jax

    r = run(frames)
    np.asarray(digest(r))
    r = run(frames)
    np.asarray(digest(r))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = run(frames)
    np.asarray(digest(r))
    dt = (time.perf_counter() - t0) / ITERS
    return batch / dt, dt * 1000


def main():
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.config import Config, load_config
    from hydranet_tpu.inference import InferencePipeline
    from hydranet_tpu.models.hydranet import HydraNet

    repo = os.path.dirname(os.path.abspath(__file__))
    base = load_config(os.path.join(repo,
                                    "configs/hydranet_joint_big_backbone.yml"))
    rng = np.random.RandomState(0)

    def make_pipe(detect, seg, lane, batch):
        d = base.to_dict()
        d["train"].update(dict(train_detect=detect, train_seg=seg,
                               train_lane=lane))
        cfg = Config.from_dict(d)
        model = HydraNet(cfg=cfg, dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)))
        pipe = InferencePipeline(cfg, variables, batch_size=batch,
                                 input_hw=DEMO_HW,
                                 compute_dtype=jnp.bfloat16)
        frames = jax.device_put(jnp.asarray(rng.randint(
            0, 255, size=(batch, *DEMO_HW, 3), dtype=np.uint8)))

        def digest(r):
            total = jnp.float32(0)
            if "seg" in r:
                total += jnp.sum(r["seg"]).astype(jnp.float32)
            if "detections" in r:
                total += jnp.sum(r["detections"].scores)
            if "lanes" in r:
                total += jnp.sum(r["lanes"].prob)
            return total

        return (lambda f: pipe._run(pipe.variables, f)), jax.jit(digest), frames

    jobs = [
        ("config1: seg-only e2e bs1", dict(detect=False, seg=True,
                                           lane=False), 1),
        ("config2: det-only e2e (decode+NMS) bs1", dict(detect=True,
                                                        seg=False,
                                                        lane=False), 1),
        ("config3: full 3-head e2e bs1", dict(detect=True, seg=True,
                                              lane=True), 1),
        ("config4: full 3-head e2e bs16", dict(detect=True, seg=True,
                                               lane=True), 16),
        ("config4: full 3-head e2e bs128", dict(detect=True, seg=True,
                                                lane=True), 128),
    ]
    for name, heads, batch in jobs:
        run, digest, frames = make_pipe(batch=batch, **heads)
        fps, ms = _bench(run, digest, frames, batch)
        print(json.dumps({"metric": name, "value": round(fps, 2),
                          "unit": "frames/sec/chip",
                          "batch_ms": round(ms, 2)}))

    # config 5: train step, via the standalone script (separate process so
    # its HBM is released before/after). BENCH_SKIP_TRAIN=1 skips it when
    # a chain benches the train step separately.
    if os.environ.get("BENCH_SKIP_TRAIN", "0") == "1":
        return
    out = subprocess.run([sys.executable,
                          os.path.join(repo, "bench_train.py")],
                         capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            d["metric"] = "config5: " + str(d.get("metric", ""))
            print(json.dumps(d))


if __name__ == "__main__":
    main()
