"""Integration check for the native C ABI (run manually on a TPU host):

    python deploy/test_c_abi.py

Exports a small-model artifact, loads libhydranet_api.so via ctypes, runs
Hydranet_Init/Detect/Uinit on a synthetic frame, and cross-checks the
detections/lanes/seg against the JAX InferencePipeline on the same frame.
"""

from __future__ import annotations

import ctypes
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "deploy"))

from hn_ctypes import HN_Output, load_library


def main():
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.inference import InferencePipeline
    from hydranet_tpu.models.hydranet import HydraNet
    from test_hydranet import small_config

    cfg = small_config()
    model = HydraNet(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    pipe = InferencePipeline(cfg, variables, batch_size=1,
                             input_hw=(128, 128), compute_dtype=jnp.float32,
                             det_conf_thres=0.05, lane_conf_thres=0.6)
    # NOTE: with untrained weights + the focal prior bias, every anchor sits
    # at ~0.01 so a sub-0.01 threshold would compare pure tie-breaking noise
    # between two separate compilations; 0.05 keeps the check deterministic
    # (both sides must agree on "no detections" AND on the seg mask).
    artifact = "/tmp/hydra_c_abi_artifact"
    pipe.export_artifact(artifact)

    rng = np.random.RandomState(7)
    frame_bgr = rng.randint(0, 255, (128, 128, 3), np.uint8)
    frame_rgb = frame_bgr[..., ::-1].copy()

    want = pipe(frame_rgb[None])
    want_seg = np.asarray(want["seg"][0])
    w_valid = np.asarray(want["detections"].valid[0])
    w_boxes = np.asarray(want["detections"].boxes[0])[w_valid]
    w_scores = np.asarray(want["detections"].scores[0])[w_valid]

    lib = load_library(REPO)

    handle = ctypes.c_void_p()
    rc = lib.Hydranet_Init(ctypes.byref(handle), artifact.encode())
    assert rc == 0, f"init failed rc={rc}"

    out = HN_Output()
    buf = frame_bgr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    rc = lib.Hydranet_Detect(handle, buf, 128, 128, ctypes.byref(out), None)
    assert rc == 0, f"detect failed rc={rc}"

    # seg mask agrees except argmax ties: the exported module and the live
    # jit are separate compilations, so fusion/rounding can flip near-equal
    # logits on a fraction of pixels.
    seg = np.ctypeslib.as_array(out.seg_mask,
                                shape=(out.seg_height, out.seg_width)).copy()
    # (.copy(): seg_mask points into handle-owned memory that the next
    # Detect call replaces)
    assert seg.shape == want_seg.shape
    mismatch = np.mean(seg != want_seg)
    assert mismatch < 0.005, f"seg mismatch ratio {mismatch}"

    # detections match up to boundary flips at the confidence threshold
    assert abs(out.num_detections - len(w_boxes)) <= 2, (
        out.num_detections, len(w_boxes))
    got = sorted([(out.detections[i].score, out.detections[i].x1)
                  for i in range(out.num_detections)])
    wanted = sorted(zip(w_scores.tolist(), w_boxes[:, 0].tolist()))
    matched = 0
    for gs, gx in got:
        if any(abs(gs - ws) < 1e-2 and abs(gx - wx) < 1.0
               for ws, wx in wanted):
            matched += 1
    assert matched >= min(len(got), len(wanted)) - 2, (got, wanted)

    print(f"C ABI cross-check OK: {out.num_detections} detections, "
          f"{out.num_lanes} lanes, seg {out.seg_height}x{out.seg_width}, "
          f"run {out.run_ms:.1f} ms")

    # pipelined path: results must match the sync path bit-for-bit (same
    # executable, same frame), arriving with one-frame latency.
    pout = HN_Output()
    rc0 = lib.Hydranet_Detect_Pipelined(handle, buf, 128, 128,
                                        ctypes.byref(pout), None)
    assert rc0 == 0, f"first pipelined call should return 0, got {rc0}"
    rc1 = lib.Hydranet_Detect_Pipelined(handle, buf, 128, 128,
                                        ctypes.byref(pout), None)
    assert rc1 == 1, f"second pipelined call should return 1, got {rc1}"
    pseg = np.ctypeslib.as_array(pout.seg_mask,
                                 shape=(pout.seg_height, pout.seg_width)).copy()
    assert (pseg == seg).all(), "pipelined seg differs from sync seg"
    assert pout.num_detections == out.num_detections
    rcf = lib.Hydranet_Flush(handle, ctypes.byref(pout), None)
    assert rcf == 1, f"flush should return 1, got {rcf}"
    fseg = np.ctypeslib.as_array(pout.seg_mask,
                                 shape=(pout.seg_height, pout.seg_width))
    assert (fseg == seg).all(), "flushed seg differs from sync seg"
    print("pipelined C ABI OK: prime->result->flush all consistent")

    lib.Hydranet_Uinit(handle)


if __name__ == "__main__":
    main()
