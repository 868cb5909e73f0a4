"""Sustained-serving soak: stream N batches through the pipelined serving
API (InferencePipeline.stream) and report sustained throughput + tail
latencies + host RSS drift — evidence that the serving shape holds up
beyond the short bench windows (bench.py measures 10 batches).

Usage: python scripts/soak_serving.py [N_BATCHES]
"""

import os
import resource
import sys
import time

# persistent XLA compile cache: first compile of the big pipeline is
# minutes through the remote-TPU tunnel; later invocations (and the other
# bench/chain scripts) reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
BATCH = int(os.environ.get("BENCH_BATCH", "128"))


def main():
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.config import load_config
    from hydranet_tpu.inference import InferencePipeline
    from hydranet_tpu.models.hydranet import HydraNet

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(
        repo, "configs/hydranet_joint_big_backbone.yml"))
    model = HydraNet(cfg=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    pipe = InferencePipeline(cfg, variables, batch_size=BATCH,
                             input_hw=(1080, 1920),
                             compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (BATCH, 1080, 1920, 3), np.uint8)

    # Per-batch we fetch a SCALAR digest that depends on every output
    # (forces completion) instead of materializing full results on host:
    # on this harness the remote-TPU tunnel's D2H (~210 MB of seg ids per
    # batch) would otherwise dominate and measure the network, not the
    # chip. Real hosts consume results via pipe.stream().
    import collections

    import jax

    digest = jax.jit(lambda r: jnp.sum(r["detections"].scores)
                     + jnp.sum(r["lanes"].prob)
                     + jnp.sum(r["seg"]).astype(jnp.float32))

    frames_dev = jax.device_put(jnp.asarray(frames))
    for _ in range(3):  # warmup/compile
        np.asarray(digest(pipe._run(pipe.variables, frames_dev)))

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    lat = []
    pending = collections.deque()
    t0 = time.perf_counter()
    last = t0
    n_done = 0
    for _ in range(N):
        pending.append(digest(pipe._run(pipe.variables, frames_dev)))
        if len(pending) >= 3:
            np.asarray(pending.popleft())
            now = time.perf_counter()
            lat.append(now - last)
            last = now
            n_done += 1
    while pending:
        np.asarray(pending.popleft())
        now = time.perf_counter()
        lat.append(now - last)
        last = now
        n_done += 1
    total = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    drop = 3 if len(lat) > 6 else 0  # skip pipeline fill (keep short runs)
    lat_ms = np.asarray(lat[drop:]) * 1000.0
    import json
    print(json.dumps({
        "metric": f"SOAK: sustained serving, {n_done} batches of {BATCH} "
                  "(pipelined stream, depth 3)",
        "value": round(n_done * BATCH / total, 2),
        "unit": "frames/sec/chip",
        "p50_batch_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p99_batch_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "max_batch_ms": round(float(lat_ms.max()), 1),
        "host_maxrss_delta_mb": round((rss1 - rss0) / 1024, 1),
    }))


if __name__ == "__main__":
    main()
