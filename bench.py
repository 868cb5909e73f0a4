"""Benchmark: full 3-head HydraNet inference pipeline on one TPU chip.

Protocol: warmup then timed iterations (the reference's C++ demo uses
10 warmup + 20 timed, Demo.cpp:27-28). We run the flagship big-backbone
config end to end — on-device preprocess (resize from 1080p demo resolution
+ imagenet normalize), 3-head forward in bf16, and ALL post-processing (box
decode + class-aware NMS, seg argmax, lane decode + lane NMS) — as ONE XLA
program per batch.

Timing is pipelined (K batches in flight, one device sync at the end), the
realistic serving pattern; per-batch sync would mostly measure the remote-
tunnel round trip of this harness (~29 ms), not the chip. p50 per-batch
latency is also reported from synced runs.

Prints one JSON line; vs_baseline is measured against the driver-set
north-star target of 500 frames/sec/chip (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import time

# persistent XLA compile cache: first compile of the big pipeline is
# minutes through the remote-TPU tunnel; later invocations (and the other
# bench/chain scripts) reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
DEMO_HW = (1080, 1920)  # demo video resolution (reference demo.py:160)
TARGET_FPS = 500.0


def main():
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.config import load_config
    from hydranet_tpu.inference import InferencePipeline
    from hydranet_tpu.models.hydranet import HydraNet

    repo = os.path.dirname(os.path.abspath(__file__))
    # Trained weights are the default headline when the committed compact
    # checkpoint exists (VERDICT r4 #1: the reference never serves random
    # weights — demo.py:123-131 / Demo.cpp:47 always load a trained ckpt).
    # HN_RANDOM_INIT=1 restores the old random-init behavior; HN_CONFIG /
    # HN_CKPT still override everything explicitly.
    trained_npz = os.path.join(repo, "artifacts", "trained_ckpt_r5.npz")
    use_trained_npz = (os.path.exists(trained_npz)
                       and os.path.exists(trained_npz + ".json")
                       and not os.environ.get("HN_RANDOM_INIT")
                       and not os.environ.get("HN_CONFIG")
                       and not os.environ.get("HN_CKPT"))
    npz_meta = {}
    if use_trained_npz:
        with open(trained_npz + ".json") as f:
            npz_meta = json.load(f)

    # HN_CONFIG: bench a different preset (e.g. the convergence preset, to
    # pair with a trained checkpoint; the flagship big-backbone config has
    # no trained weights — the reference publishes none).
    cfg_path = os.environ.get(
        "HN_CONFIG",
        os.path.join(repo, npz_meta["config"]) if use_trained_npz
        else os.path.join(repo, "configs/hydranet_joint_big_backbone.yml"))
    cfg = load_config(cfg_path)

    model = HydraNet(cfg=cfg, dtype=jnp.bfloat16)
    h, w = cfg.input_hw
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    # HN_CKPT: serve a trained orbax checkpoint (epoch_N dir saved by the
    # trainer) so score densities, certified-top-k fallbacks and NMS chain
    # lengths are the real trained ones (VERDICT r3 weak #6).
    ckpt = os.environ.get("HN_CKPT", "")
    weights_tag = "random-init"
    if use_trained_npz:
        from hydranet_tpu.train.checkpoint import load_compact

        variables = load_compact(trained_npz)
        m = npz_meta.get("last_valid_metrics", {})
        weights_tag = (
            f"TRAINED {os.path.basename(trained_npz)} "
            f"(epoch {npz_meta.get('epoch')}, "
            f"mIoU {m.get('mIoU', '?')}/AP {m.get('AP', '?')}"
            f"/laneF1 {m.get('lane_f1', '?')}, "
            f"config {os.path.basename(str(npz_meta.get('config')))})")
    elif ckpt and ckpt.endswith(".npz"):
        # compact commit-sized snapshot (save_compact), e.g. the
        # fine-tuned artifacts/trained_ckpt_r5ft.npz
        from hydranet_tpu.train.checkpoint import load_compact

        variables = load_compact(ckpt)
        weights_tag = "ckpt:" + os.path.basename(ckpt)
    elif ckpt:
        import orbax.checkpoint as ocp

        # target-free restore: the trainer's TrainState lands as a dict of
        # its fields; only params + batch_stats matter for serving
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
        variables = {"params": raw["params"],
                     "batch_stats": raw.get("batch_stats") or {}}
        weights_tag = "ckpt:" + os.path.basename(os.path.normpath(ckpt))

    # HN_SCORE_BIAS: override the classifier header bias (default is the
    # focal prior -4.59 => ~0 anchors cross the 0.4 threshold at random
    # init, making postprocess trivially cheap). A value like -0.35 pushes
    # a realistic few-percent of anchors over threshold so the certified
    # top-k fallback and real NMS suppression chains are exercised at the
    # headline config, which has no trained checkpoint.
    sb = os.environ.get("HN_SCORE_BIAS", "")
    if sb:
        import flax

        flat = flax.traverse_util.flatten_dict(variables["params"])
        nb = 0
        for path in list(flat):
            if "classifier" in path and path[-1] == "bias" \
                    and "header" in "/".join(str(p) for p in path):
                flat[path] = jnp.full_like(flat[path], float(sb))
                nb += 1
        assert nb > 0, "no classifier header bias found"
        variables = {**variables,
                     "params": flax.traverse_util.unflatten_dict(flat)}
        weights_tag += f"+score_bias={sb}"

    # HN_QUANT=int8: serve the PTQ-quantized pipeline (ops/quantize.py);
    # calibration runs below once the bench frames exist.
    quant = os.environ.get("HN_QUANT", "off")
    pipe = InferencePipeline(cfg, variables, batch_size=BATCH,
                             input_hw=DEMO_HW, compute_dtype=jnp.bfloat16,
                             quant=quant)

    # real demo frame when the committed fixture is present (preprocess sees
    # realistic content, not noise); random noise as fallback
    fixture = os.path.join(repo, "artifacts", "fixtures",
                           "bench_frame_1080p.jpg")
    if os.path.exists(fixture):
        import cv2

        one = cv2.cvtColor(cv2.imread(fixture), cv2.COLOR_BGR2RGB)
        if one.shape[:2] != DEMO_HW:
            one = cv2.resize(one, (DEMO_HW[1], DEMO_HW[0]))
        frames = np.broadcast_to(one, (BATCH, *one.shape)).copy()
    else:
        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, size=(BATCH, *DEMO_HW, 3),
                             dtype=np.uint8)
    frames_dev = jax.device_put(jnp.asarray(frames))

    if quant == "int8":
        pipe.calibrate([frames])  # content-realistic scales from the fixture

    # HN_DONATE=1: donate the input frames buffer. The plain loop reuses
    # one device buffer across in-flight dispatches, so the donated input
    # is threaded through as an (aliased, copy-free) output and fed back —
    # XLA may then reuse the ~0.8 GB frame buffer for intermediates
    # (cheap-lever sweep, VERDICT r4 ask #7).
    donate = bool(os.environ.get("HN_DONATE"))
    if donate:
        inner = pipe._run.__wrapped__

        step = jax.jit(lambda v, f: (inner(v, f), f), donate_argnums=(1,))

        def run_once(f):
            r, f = step(pipe.variables, f)
            return r, f
    else:
        def run_once(f):
            return pipe._run(pipe.variables, f), f

    # tiny digest forces completion of everything it depends on
    digest = jax.jit(lambda r: jnp.sum(r["detections"].scores)
                     + jnp.sum(r["lanes"].prob)
                     + jnp.sum(r["seg"]).astype(jnp.float32))

    for _ in range(WARMUP):
        r, frames_dev = run_once(frames_dev)
        np.asarray(digest(r))

    # throughput: K batches in flight, one sync
    t0 = time.perf_counter()
    r = None
    for _ in range(ITERS):
        r, frames_dev = run_once(frames_dev)
    np.asarray(digest(r))
    dt = (time.perf_counter() - t0) / ITERS
    fps = BATCH / dt

    # latency: synced per batch (includes one harness round trip)
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        r, frames_dev = run_once(frames_dev)
        np.asarray(digest(r))
        lat.append(time.perf_counter() - t0)
    p50_batch_ms = float(np.median(lat) * 1000.0)

    print(json.dumps({
        "metric": ("frames/sec/chip, full 3-head pipeline e2e "
                   f"(1080p in, {w}x{h} net, bs{BATCH}, "
                   f"{'int8-PTQ' if quant == 'int8' else 'bf16'}"
                   f"{', donated-input' if donate else ''}, "
                   f"{weights_tag}, preprocess+"
                   "forward+det NMS+seg argmax+lane decode/NMS on device); "
                   f"p50 batch latency {p50_batch_ms:.1f} ms "
                   f"({p50_batch_ms / BATCH:.2f} ms/frame)"),
        "value": round(float(fps), 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(float(fps) / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
