"""C-ABI latency sweep over batch size (VERDICT r4 ask #4: own the latency
operating point — BASELINE configs 3-4; the reference's deploy scenario IS
a per-frame latency protocol, Demo.cpp:27-28,75-88).

For bs in {1, 4, 8, 16}: export a trained-weights artifact at that batch
size (1080p camera frames in, full 3-head pipeline + postprocess), run it
through the native C ABI, and record

  - sync path p50 ms/frame (Hydranet_Detect for bs1,
    Hydranet_Detect_Batched otherwise — the batch amortizes the tunnel);
  - bs1 pipelined steady-state p50 (Hydranet_Detect_Pipelined: frame k+1
    staging overlaps frame k execute);
  - the corrected run decomposition h2d / exec / d2h (ExecuteTimed's exec
    clock is fenced by a digest fetch — transport completion events fire
    at enqueue on tunneled PJRT, which is what made r4's published
    `execute 0.05 ms` physically impossible; VERDICT r4 weak #1) plus the
    measured fence round-trip rtt that is measurement overhead, not cost.

Process structure mirrors golden_compare.py: the JAX exporter and the
C-side PJRT client run in separate processes with a settle gap so they
never contend for the relay claim.

Prints a markdown latency table and SWEEP DONE (the chain's marker).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.path.join(REPO, "artifacts", "deploy_latency_r5")
SIZES = (1, 4, 8, 16)

from golden_compare import C_ENV  # same relay recipe


def phase_a(args):
    """Export one artifact per batch size from the trained checkpoint."""
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from hydranet_tpu.config import load_config
    from hydranet_tpu.inference import InferencePipeline
    from hydranet_tpu.train.checkpoint import load_compact

    with open(args.ckpt + ".json") as f:
        meta = json.load(f)
    cfg = load_config(os.path.join(REPO, meta["config"]))
    variables = load_compact(args.ckpt)

    for bs in SIZES:
        out_dir = os.path.join(WORK, f"bs{bs}")
        if os.path.exists(os.path.join(out_dir, "artifact.json")):
            print(f"[A] bs{bs}: artifact already exported, skipping")
            continue
        pipe = InferencePipeline(
            cfg, variables, batch_size=bs, input_hw=(args.height, args.width),
            compute_dtype=jnp.bfloat16,
            det_conf_thres=0.35, lane_conf_thres=cfg.lane.conf_thres,
            lane_nms_thres=cfg.lane.nms_thres)
        t0 = time.perf_counter()
        pipe.export_artifact(out_dir)
        print(f"[A] bs{bs}: exported in {time.perf_counter() - t0:.1f}s "
              f"({args.height}x{args.width} in, net {pipe.net_hw})")
    print("[A] done")


def phase_b(args):
    """Drive the C ABI per batch size; one Init/Uinit cycle each so only
    one PJRT client is ever alive."""
    import ctypes

    import cv2

    sys.path.insert(0, os.path.join(REPO, "deploy"))
    from hn_ctypes import HN_Output, load_library

    frame = cv2.imread(args.image)
    assert frame is not None, args.image
    if frame.shape[:2] != (args.height, args.width):
        frame = cv2.resize(frame, (args.width, args.height))
    frame = np.ascontiguousarray(frame)

    lib = load_library(REPO)
    rows = []
    for bs in SIZES:
        artifact = os.path.join(WORK, f"bs{bs}")
        handle = ctypes.c_void_p()
        t0 = time.perf_counter()
        rc = lib.Hydranet_Init(ctypes.byref(handle), artifact.encode())
        assert rc == 0, f"bs{bs}: init rc={rc}"
        init_s = time.perf_counter() - t0
        assert lib.Hydranet_BatchSize(handle) == bs

        outs = (HN_Output * bs)()
        batch = np.ascontiguousarray(np.repeat(frame[None], bs, axis=0))
        bptr = batch.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        fptr = frame.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))

        # --- sync path (Detect for bs1 exercises the single-frame ABI the
        # reference demo uses; Detect_Batched otherwise + for decomposition)
        def one_sync():
            if bs == 1:
                rc = lib.Hydranet_Detect(handle, fptr, args.height,
                                         args.width, ctypes.byref(outs[0]),
                                         None)
            else:
                rc = lib.Hydranet_Detect_Batched(handle, bptr, bs,
                                                 args.height, args.width,
                                                 outs)
            assert rc == 0, f"bs{bs}: detect rc={rc}"

        for _ in range(args.warmup):
            one_sync()
        sync_ms = []
        for _ in range(args.iters):
            t = time.perf_counter()
            one_sync()
            sync_ms.append((time.perf_counter() - t) * 1e3)

        # decomposition (ExecuteTimed runs under Detect_Batched; for bs1
        # run a 1-frame batched call just to sample the fenced clocks)
        if bs == 1:
            rc = lib.Hydranet_Detect_Batched(handle, bptr, 1, args.height,
                                             args.width, outs)
            assert rc == 0
        o0 = outs[0]
        decomp = dict(h2d=o0.h2d_ms, exec=o0.exec_ms, d2h=o0.d2h_ms,
                      rtt=o0.rtt_ms)

        # --- pipelined steady state (bs1 only: the per-frame camera path)
        pipe_p50 = None
        if bs == 1:
            out = HN_Output()
            lib.Hydranet_Detect_Pipelined(handle, fptr, args.height,
                                          args.width, ctypes.byref(out),
                                          None)  # prime
            for _ in range(args.warmup):
                lib.Hydranet_Detect_Pipelined(handle, fptr, args.height,
                                              args.width, ctypes.byref(out),
                                              None)
            pipe_ms = []
            for _ in range(args.iters):
                t = time.perf_counter()
                rc = lib.Hydranet_Detect_Pipelined(
                    handle, fptr, args.height, args.width,
                    ctypes.byref(out), None)
                assert rc == 1
                pipe_ms.append((time.perf_counter() - t) * 1e3)
            lib.Hydranet_Flush(handle, ctypes.byref(out), None)
            pipe_p50 = float(np.percentile(pipe_ms, 50))

        lib.Hydranet_Uinit(handle)
        p50 = float(np.percentile(sync_ms, 50))
        rows.append(dict(bs=bs, init_s=round(init_s, 1),
                         sync_p50_batch_ms=round(p50, 2),
                         sync_p50_frame_ms=round(p50 / bs, 2),
                         pipelined_p50_frame_ms=(round(pipe_p50, 2)
                                                 if pipe_p50 else None),
                         h2d_ms=round(decomp["h2d"], 2),
                         exec_ms=round(decomp["exec"], 2),
                         d2h_ms=round(decomp["d2h"], 2),
                         fence_rtt_ms=round(decomp["rtt"], 2),
                         n_dets=outs[0].num_detections,
                         n_lanes=outs[0].num_lanes))
        print(f"[B] bs{bs}: sync p50 {p50:.1f} ms/batch "
              f"({p50 / bs:.1f} ms/frame), exec {decomp['exec']:.1f} ms, "
              f"h2d {decomp['h2d']:.1f}, d2h {decomp['d2h']:.1f}")
        time.sleep(args.settle if bs != SIZES[-1] else 0)

    with open(os.path.join(WORK, "sweep.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("[B] done")


def report():
    with open(os.path.join(WORK, "sweep.json")) as f:
        rows = json.load(f)
    print("\n| bs | sync p50 ms/frame | pipelined p50 | h2d ms | exec ms "
          "| d2h ms | fence rtt | dets | lanes |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['bs']} | {r['sync_p50_frame_ms']} | "
              f"{r['pipelined_p50_frame_ms'] or '-'} | {r['h2d_ms']} | "
              f"{r['exec_ms']} | {r['d2h_ms']} | {r['fence_rtt_ms']} | "
              f"{r['n_dets']} | {r['n_lanes']} |")
    best = min(rows, key=lambda r: r["sync_p50_frame_ms"])
    print(f"\nbest latency operating point: bs{best['bs']} at "
          f"{best['sync_p50_frame_ms']} ms/frame sync"
          + (f" ({best['pipelined_p50_frame_ms']} pipelined)"
             if best["pipelined_p50_frame_ms"] else ""))
    # sanity: the corrected exec clock must be physically plausible —
    # a full-pipeline batch cannot execute in microseconds (r4 weak #1)
    for r in rows:
        if r["exec_ms"] < 1.0:
            print(f"WARNING: bs{r['bs']} exec {r['exec_ms']} ms is "
                  "implausibly low — decomposition still broken?")
    print("SWEEP DONE")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default=os.path.join(REPO, "artifacts/trained_ckpt_r5.npz"))
    ap.add_argument("--image",
                    default=os.path.join(
                        REPO, "artifacts/fixtures/bench_frame_1080p.jpg"))
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--settle", type=int, default=95)
    ap.add_argument("--phase", choices=["a", "b"], default="")
    args = ap.parse_args()

    if args.phase == "a":
        return phase_a(args)
    if args.phase == "b":
        return phase_b(args)

    os.makedirs(WORK, exist_ok=True)
    fwd = [sys.executable, os.path.abspath(__file__),
           "--ckpt", args.ckpt, "--image", args.image,
           "--height", str(args.height), "--width", str(args.width),
           "--warmup", str(args.warmup), "--iters", str(args.iters),
           "--settle", str(args.settle)]
    rc = subprocess.run(fwd + ["--phase", "a"]).returncode
    assert rc == 0, f"phase A failed rc={rc}"
    print(f"[main] settling {args.settle}s for the relay claim to expire")
    time.sleep(args.settle)
    rc = subprocess.run(fwd + ["--phase", "b"],
                        env=dict(os.environ, **C_ENV)).returncode
    assert rc == 0, f"phase B failed rc={rc}"
    report()


if __name__ == "__main__":
    main()
