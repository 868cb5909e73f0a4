"""Trained-weights golden run through the C ABI (VERDICT r4 ask #2).

Drives the native deploy path end to end on real content and real trained
weights, then golden-compares every returned struct against the Python
pipeline on the same frame:

  phase A (subprocess, JAX/TPU): load the committed compact checkpoint,
          export the bs1 deploy artifact at the fixture resolution, run the
          Python InferencePipeline on the fixture frames, save raw outputs;
  phase B (subprocess, ctypes only — no jax import, so the relay claim of
          phase A has expired before the C-side PJRT client starts): load
          libhydranet_api.so, Hydranet_Init/Detect on the same BGR frames,
          save the returned structs + the drawn overlay;
  phase C (parent, chip-free): mirror the C-side struct conversion
          (deploy/src/model/hydranet_model.cc::Postprocess +
          LaneSegConsistencyFilter — itself the mirror of the reference's
          hydranet_model.cpp:568-607) over the Python outputs and compare.

Pass criteria (the reference's deploy story, Demo.cpp:67-134, is drawing
REAL outputs from trained weights):
  - at least one frame yields nonzero detections AND nonzero lanes
    through the C ABI;
  - the lane consistency filter is exercised on a real lane (stderr log);
  - seg masks agree (< 0.5% argmax-tie flips between the two separately
    compiled programs), detections and lanes match struct-by-struct
    within recompile tolerance.

Prints GOLDEN OK on success (the chain's completion marker).

Usage:
    python deploy/golden_compare.py \
        [--image artifacts/fixtures/demo_frame_procedural.jpg] [--image ...]
        [--ckpt artifacts/trained_ckpt_r5.npz] [--det-thres 0.35]
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
WORK = os.path.join(REPO, "artifacts", "deploy_golden_r5")

# the relay env the standalone PJRT client needs on this harness (the
# exact recipe of deploy/README.md; harmless on a real TPU host where
# PJRT_LIBRARY_PATH would point at libtpu directly)
C_ENV = {
    "AXON_POOL_SVC_OVERRIDE": "127.0.0.1",
    "TPU_WORKER_HOSTNAMES": "localhost",
    "AXON_COMPAT_VERSION": "49",
    "AXON_LOOPBACK_RELAY": "1",
    "PJRT_LIBRARY_PATH": "/opt/axon/libaxon_pjrt.so",
    "HN_PJRT_CLIENT_OPTIONS": ("remote_compile=1;local_only=0;priority=0;"
                               "topology=str:v5e:1x1x1;n_slices=1;"
                               "session_id=str:hydranet-golden-r5;"
                               "rank=4294967295"),
    "HN_DEPLOY_VERBOSE": "1",
}


# --------------------------------------------------------------- phase A
def phase_a(args):
    """JAX side: golden outputs + artifact export (runs on the chip)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from hydranet_tpu.config import load_config
    from hydranet_tpu.inference import InferencePipeline
    from hydranet_tpu.train.checkpoint import load_compact

    with open(args.ckpt + ".json") as f:
        meta = json.load(f)
    cfg = load_config(os.path.join(REPO, meta["config"]))
    variables = load_compact(args.ckpt)

    import cv2

    frames_bgr = [cv2.imread(p) for p in args.image]
    for p, f in zip(args.image, frames_bgr):
        assert f is not None, f"cannot read {p}"
    h0, w0 = frames_bgr[0].shape[:2]
    assert all(f.shape[:2] == (h0, w0) for f in frames_bgr)

    pipe = InferencePipeline(
        cfg, variables, batch_size=1, input_hw=(h0, w0),
        compute_dtype=jnp.bfloat16,
        det_conf_thres=args.det_thres, det_iou_thres=0.3,
        lane_conf_thres=cfg.lane.conf_thres,
        lane_nms_thres=cfg.lane.nms_thres)

    artifact = os.path.join(WORK, "artifact")
    pipe.export_artifact(artifact)
    print(f"[A] artifact exported to {artifact} "
          f"(ckpt epoch {meta.get('epoch')}, net {pipe.net_hw}, "
          f"frame {h0}x{w0})")

    os.makedirs(WORK, exist_ok=True)
    for i, bgr in enumerate(frames_bgr):
        rgb = bgr[..., ::-1].copy()
        out = pipe(rgb[None])
        d, l = out["detections"], out["lanes"]
        np.savez(
            os.path.join(WORK, f"golden_{i}.npz"),
            seg=np.asarray(out["seg"][0]),
            det_boxes=np.asarray(d.boxes[0], np.float32),
            det_scores=np.asarray(d.scores[0], np.float32),
            det_classes=np.asarray(d.classes[0], np.int32),
            det_valid=np.asarray(d.valid[0], bool),
            lane_prob=np.asarray(l.prob[0], np.float32),
            lane_xs=np.asarray(l.xs[0], np.float32),
            lane_mask=np.asarray(l.mask[0], bool),
            lane_start=np.asarray(l.start[0], np.int32),
            lane_end=np.asarray(l.end[0], np.int32),
            lane_valid=np.asarray(l.valid[0], bool))
        nd = int(np.sum(np.asarray(d.valid[0])))
        nl = int(np.sum(np.asarray(l.valid[0])))
        print(f"[A] frame {i}: {nd} raw detections, {nl} raw lanes "
              f"(pre consistency filter)")
    print("[A] done")


# --------------------------------------------------------------- phase B
def phase_b(args):
    """C side: ctypes driver only — MUST NOT import jax (a second live
    PJRT client would contend for the relay claim)."""
    import ctypes

    import cv2

    sys.path.insert(0, os.path.join(REPO, "deploy"))
    from hn_ctypes import HN_Output, load_library

    lib = load_library(REPO)
    handle = ctypes.c_void_p()
    artifact = os.path.join(WORK, "artifact")
    t0 = time.perf_counter()
    rc = lib.Hydranet_Init(ctypes.byref(handle), artifact.encode())
    assert rc == 0, f"Hydranet_Init failed rc={rc}"
    print(f"[B] init ok in {time.perf_counter() - t0:.1f}s")

    for i, path in enumerate(args.image):
        bgr = cv2.imread(path)
        h, w = bgr.shape[:2]
        out = HN_Output()
        visual = np.ascontiguousarray(bgr.copy())
        rc = lib.Hydranet_Detect(
            handle, bgr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            h, w, ctypes.byref(out),
            visual.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        assert rc == 0, f"Hydranet_Detect failed rc={rc}"

        seg = np.ctypeslib.as_array(
            out.seg_mask, shape=(out.seg_height, out.seg_width)).copy()
        dets = [dict(x1=out.detections[k].x1, y1=out.detections[k].y1,
                     x2=out.detections[k].x2, y2=out.detections[k].y2,
                     score=out.detections[k].score,
                     class_id=out.detections[k].class_id)
                for k in range(out.num_detections)]
        lanes = []
        for k in range(out.num_lanes):
            ln = out.lanes[k]
            lanes.append(dict(
                score=ln.score,
                points=[(ln.points[p].x, ln.points[p].y)
                        for p in range(ln.num_points)]))
        np.save(os.path.join(WORK, f"c_seg_{i}.npy"), seg)
        with open(os.path.join(WORK, f"c_out_{i}.json"), "w") as f:
            json.dump(dict(num_detections=out.num_detections,
                           num_lanes=out.num_lanes,
                           detections=dets, lanes=lanes,
                           preprocess_ms=out.preprocess_ms,
                           run_ms=out.run_ms,
                           postprocess_ms=out.postprocess_ms), f)
        overlay = os.path.join(REPO, "artifacts",
                               f"deploy_golden_overlay_r5_{i}.jpg")
        cv2.imwrite(overlay, visual)
        print(f"[B] frame {i}: {out.num_detections} detections, "
              f"{out.num_lanes} lanes (post filter), run {out.run_ms:.1f} ms"
              f" -> overlay {os.path.basename(overlay)}")
    lib.Hydranet_Uinit(handle)
    print("[B] done")


# --------------------------------------------------------------- phase C
def c_mirror_structs(g, org_hw, net_hw, lane_interval):
    """Mirror of hydranet_model.cc::Postprocess + LaneSegConsistencyFilter
    applied to the Python pipeline's raw fixed-shape outputs: what the C
    structs MUST equal if the native conversion is correct."""
    import cv2

    oh, ow = org_hw
    nh, nw = net_hw
    sx, sy = ow / nw, oh / nh

    dets = []
    for k in np.where(g["det_valid"])[0]:
        x1, y1, x2, y2 = (float(v) for v in g["det_boxes"][k])
        dets.append(dict(x1=x1 * sx, y1=y1 * sy, x2=x2 * sx, y2=y2 * sy,
                         score=float(g["det_scores"][k]),
                         class_id=int(g["det_classes"][k])))

    lanes = []
    ppl = g["lane_xs"].shape[1]
    for l in np.where(g["lane_valid"])[0]:
        if g["lane_prob"][l] < 0.01:
            continue
        pts = []
        for p in range(max(0, int(g["lane_start"][l])),
                       min(int(g["lane_end"][l]), ppl)):
            if not g["lane_mask"][l, p]:
                continue
            pts.append((float(g["lane_xs"][l, p]) * sx,
                        float((nh - 1 - p * lane_interval) * sy)))
        if len(pts) >= 2:
            lanes.append(dict(score=float(g["lane_prob"][l]), points=pts))

    # consistency filter on the PYTHON seg mask (marking class id 2)
    seg = g["seg"].astype(np.uint8)
    fy, fx = seg.shape[0] / oh, seg.shape[1] / ow
    marking = (seg == 2).astype(np.uint8) * 255
    kept = []
    for lane in lanes:
        raster = np.zeros(seg.shape, np.uint8)
        pts = lane["points"]
        for a, b in zip(pts[:-1], pts[1:]):
            cv2.line(raster, (int(a[0] * fx), int(a[1] * fy)),
                     (int(b[0] * fx), int(b[1] * fy)), 255, 5)
        lane_px = np.count_nonzero(raster)
        hit_px = np.count_nonzero(raster & marking)
        lane["overlap"] = hit_px / lane_px if lane_px else 0.0
        if lane["overlap"] > 0.01:
            kept.append(lane)
    return dets, lanes, kept


def compare(args):
    import cv2

    ok = True
    any_dets = any_lanes = 0
    c_dets = c_lanes = 0
    filter_seen = 0
    for i, path in enumerate(args.image):
        g = dict(np.load(os.path.join(WORK, f"golden_{i}.npz")))
        c_seg = np.load(os.path.join(WORK, f"c_seg_{i}.npy"))
        with open(os.path.join(WORK, f"c_out_{i}.json")) as f:
            c = json.load(f)
        bgr = cv2.imread(path)
        oh, ow = bgr.shape[:2]
        # net hw from the artifact spec (the source of truth the C side read)
        with open(os.path.join(WORK, "artifact", "artifact.json")) as f:
            spec = json.load(f)
        nh, nw = spec["net_input_hw"]
        interval = spec["lane"]["interval"]

        want_dets, pre_lanes, want_lanes = c_mirror_structs(
            g, (oh, ow), (nh, nw), interval)
        any_dets += len(want_dets)
        any_lanes += len(pre_lanes)
        c_dets += len(c["detections"])
        c_lanes += c["num_lanes"]
        filter_seen += len(pre_lanes) - len(want_lanes)

        # --- seg: argmax-tie flips only between the two compilations
        mism = float(np.mean(c_seg != g["seg"]))
        line = (f"frame {i}: seg mismatch {mism:.5f} | dets C {len(c['detections'])}"
                f" vs py {len(want_dets)} | lanes C {c['num_lanes']}"
                f" vs py {len(want_lanes)} (pre-filter {len(pre_lanes)})")
        print(line)
        if mism >= 0.005:
            print(f"  FAIL seg mismatch ratio {mism}")
            ok = False

        # --- detections: match by score+box within recompile tolerance
        unmatched = list(want_dets)
        for d in c["detections"]:
            hit = next(
                (w for w in unmatched
                 if abs(w["score"] - d["score"]) < 2e-2
                 and max(abs(w["x1"] - d["x1"]), abs(w["y1"] - d["y1"]),
                         abs(w["x2"] - d["x2"]), abs(w["y2"] - d["y2"])) < 2.0
                 and w["class_id"] == d["class_id"]), None)
            if hit is not None:
                unmatched.remove(hit)
        # a mismatch is tolerable ONLY as a threshold boundary flip: the
        # unmatched det must sit near det_thres. A confident det (score
        # well above threshold) failing to pair means the structs are
        # wrong — exactly the transposed-layout d2h bug this check caught
        # (C read x1 of slots 4k..4k+3 as the box): its 0.69-score det
        # "flipped" and the old flat miss<=2 budget waved it through.
        n_c_only = len(c["detections"]) - (len(want_dets) - len(unmatched))
        miss = max(len(unmatched), n_c_only)
        confident = [w for w in unmatched
                     if w["score"] > args.det_thres + 0.05]
        if confident or miss > 2:
            print(f"  FAIL detections: {len(unmatched)} python-only "
                  f"({len(confident)} confident), C-only {n_c_only}")
            for w in unmatched[:5]:
                print(f"    py-only {w}")
            ok = False
        elif miss:
            print(f"  note: {miss} boundary det flip(s) within tolerance "
                  "budget (all near det_thres)")

        # --- lanes: per-lane score + pointwise x tolerance. Pair lanes by
        # GEOMETRY (min mean |dx| over the shared point range), not by score
        # order: trained lane scores saturate to identical values (all
        # 1.016 on the fixture), so a score-sorted zip pairs different
        # physical lanes and reports a spurious 120 px drift.
        def mean_dx(a, b):
            n = min(len(a["points"]), len(b["points"]))
            if n == 0:
                return float("inf")
            return (sum(abs(a["points"][p][0] - b["points"][p][0])
                        for p in range(n)) / n
                    + 10.0 * abs(len(a["points"]) - len(b["points"])))

        c_l = list(c["lanes"])
        w_rest = list(want_lanes)
        pairs = []
        for cl in sorted(c_l, key=lambda x: -x["score"]):
            if not w_rest:
                break
            wl = min(w_rest, key=lambda w: mean_dx(cl, w))
            w_rest.remove(wl)
            pairs.append((cl, wl))
        if abs(len(c_l) - len(want_lanes)) > 1:
            print(f"  FAIL lane count C {len(c_l)} vs py {len(want_lanes)}")
            ok = False
        for cl, wl in pairs:
            if abs(cl["score"] - wl["score"]) > 2e-2:
                print(f"  FAIL lane score {cl['score']} vs {wl['score']}")
                ok = False
                continue
            n = min(len(cl["points"]), len(wl["points"]))
            if abs(len(cl["points"]) - len(wl["points"])) > 2:
                print(f"  FAIL lane n_points {len(cl['points'])} vs "
                      f"{len(wl['points'])}")
                ok = False
            dx = max((abs(cl["points"][p][0] - wl["points"][p][0])
                      for p in range(n)), default=0.0)
            dy = max((abs(cl["points"][p][1] - wl["points"][p][1])
                      for p in range(n)), default=0.0)
            if dx > 3.0 or dy > 1e-3:
                print(f"  FAIL lane pointwise drift dx {dx:.2f} dy {dy:.4f}")
                ok = False
            else:
                print(f"  lane score {cl['score']:.3f} overlap "
                      f"{wl.get('overlap', 0):.3f}: {n} points agree "
                      f"(max dx {dx:.2f} px)")

    # the deliverable is REAL outputs through the C ABI (VERDICT r4
    # missing #2: every surviving native run reported 0 dets, 0 lanes)
    if c_dets == 0:
        print("FAIL: the C ABI returned zero detections across all frames")
        ok = False
    if c_lanes == 0:
        print("FAIL: the C ABI returned zero lanes across all frames")
        ok = False
    if any_lanes == 0:
        print("FAIL: zero lanes reached the consistency filter")
        ok = False
    print(f"totals: C ABI {c_dets} detections / {c_lanes} lanes; python "
          f"{any_dets} detections / {any_lanes} lanes decoded, "
          f"{filter_seen} dropped by consistency filter")
    if ok:
        print("GOLDEN OK")
    else:
        print("GOLDEN FAILED")
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", action="append", default=[])
    ap.add_argument("--ckpt",
                    default=os.path.join(REPO, "artifacts/trained_ckpt_r5.npz"))
    ap.add_argument("--det-thres", type=float, default=0.35)
    ap.add_argument("--phase", choices=["a", "b"], default="")
    ap.add_argument("--compare-only", action="store_true",
                    help="re-run phase C against the saved phase A/B "
                         "outputs in the work dir (chip-free)")
    ap.add_argument("--settle", type=int, default=95,
                    help="seconds between chip-holding subprocesses "
                         "(relay claim expiry)")
    args = ap.parse_args()
    if not args.image:
        args.image = [
            os.path.join(REPO, "artifacts/fixtures/demo_frame_procedural.jpg"),
            os.path.join(REPO,
                         "artifacts/fixtures/demo_frame_procedural_b.jpg")]

    if args.phase == "a":
        return phase_a(args)
    if args.phase == "b":
        return phase_b(args)
    if args.compare_only:
        return compare(args)

    os.makedirs(WORK, exist_ok=True)
    base = [sys.executable, os.path.abspath(__file__),
            "--ckpt", args.ckpt, "--det-thres", str(args.det_thres)]
    for im in args.image:
        base += ["--image", im]

    rc = subprocess.run(base + ["--phase", "a"]).returncode
    assert rc == 0, f"phase A failed rc={rc}"
    print(f"[main] settling {args.settle}s for the relay claim to expire")
    time.sleep(args.settle)
    env = dict(os.environ, **C_ENV)
    rc = subprocess.run(base + ["--phase", "b"], env=env).returncode
    assert rc == 0, f"phase B failed rc={rc}"
    compare(args)


if __name__ == "__main__":
    main()
