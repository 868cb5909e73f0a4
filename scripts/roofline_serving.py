"""Roofline of the bs128 serving pipeline (VERDICT r3 item 1).

For every pipeline stage — preprocess, backbone, neck, det head, seg head,
lane head, det postprocess, lane decode+NMS, and the full fused program —
this measures wall time on the chip AND pulls the compiled program's FLOP
count and HBM bytes from XLA's own cost model
(`jit(fn).lower(*args).compile().cost_analysis()`), then computes each
stage's roofline bound

    t_bound = max(flops / PEAK_FLOPS, bytes / PEAK_BW)

so the binding resource (MXU vs HBM) is NAMED per stage and the gap
between measured time and the bound says where optimization effort can
still pay. Peaks are TPU v5e: 197 TF/s bf16, 819 GB/s HBM.

The reference has per-stage wall timers only
(/root/reference/deploy/src/model/hydranet_model.cpp:356-364); this adds
the FLOPs/bytes axes that decide WHY a stage costs what it costs.

Usage: python scripts/roofline_serving.py   (BENCH_BATCH overrides 128)
Output: a table on stdout (tee into artifacts/roofline_r4.log).
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timed as _timed

B = int(os.environ.get("BENCH_BATCH", "128"))
DT = jnp.bfloat16
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
PEAK_TFS = 197e12     # v5e bf16 MXU peak
PEAK_BW = 819e9       # v5e HBM bandwidth

ROWS = []


def cost(fn, *args):
    """(flops, bytes) from the compiled program's cost analysis; NaNs when
    the backend does not report them."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", float("nan"))),
                float(ca.get("bytes accessed", float("nan"))))
    except Exception as e:
        print(f"  [cost_analysis failed: {type(e).__name__}: "
              f"{str(e)[:80]}]")
        return float("nan"), float("nan")


def stage(name, fn, *args):
    ms = _timed(name, fn, *args, iters=ITERS, width=34)
    fl, by = cost(fn, *args)
    ROWS.append((name, ms, fl, by))
    return ms


def report():
    print(f"\n=== roofline table (bs{B}, bf16, v5e peaks "
          f"{PEAK_TFS / 1e12:.0f} TF/s / {PEAK_BW / 1e9:.0f} GB/s) ===")
    hdr = (f"{'stage':34s} {'ms':>8s} {'GFLOP':>9s} {'GB':>8s} "
           f"{'t_mxu':>7s} {'t_hbm':>7s} {'bound':>7s} {'x-bound':>7s} "
           f"bound-by")
    print(hdr)
    for name, ms, fl, by in ROWS:
        t_mxu = fl / PEAK_TFS * 1e3
        t_hbm = by / PEAK_BW * 1e3
        bound = max(t_mxu, t_hbm)
        which = ("MXU" if t_mxu >= t_hbm else "HBM") if bound == bound \
            else "?"
        print(f"{name:34s} {ms:8.2f} {fl / 1e9:9.1f} {by / 1e9:8.2f} "
              f"{t_mxu:7.2f} {t_hbm:7.2f} {bound:7.2f} "
              f"{ms / bound if bound else float('nan'):7.2f} {which}")
    tot_ms = sum(r[1] for r in ROWS if r[1] == r[1])
    tot_fl = sum(r[2] for r in ROWS if r[2] == r[2])
    tot_by = sum(r[3] for r in ROWS if r[3] == r[3])
    print(f"{'TOTAL':34s} {tot_ms:8.2f} {tot_fl / 1e9:9.1f} "
          f"{tot_by / 1e9:8.2f}")


def main():
    from hydranet_tpu.config import load_config
    from hydranet_tpu.models.hydranet import HydraNet
    from hydranet_tpu.models.regnet import RegNetY
    from hydranet_tpu.models.bifpn import StackBiFPN
    from hydranet_tpu.heads.detection import DetectionHead
    from hydranet_tpu.heads import detection as det_ops
    from hydranet_tpu.heads import lane_codec as lane_ops
    from hydranet_tpu.heads.lane import LaneHead
    from hydranet_tpu.heads.segmentation import SegmentHead
    from hydranet_tpu.inference import InferencePipeline, preprocess_images

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config(os.path.join(repo,
                                   "configs/hydranet_joint_big_backbone.yml"))
    bb = cfg.backbone
    rng = jax.random.PRNGKey(0)

    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (B, 1080, 1920, 3),
                                         dtype=np.uint8))
    stage("preprocess (resize+norm)",
          lambda f: preprocess_images(f, (640, 640), dtype=DT), frames)

    x = jax.random.normal(rng, (B, 640, 640, 3), jnp.float32)
    backbone = RegNetY(bb.initial_width, bb.slope, bb.quantized_param,
                       bb.network_depth, bb.bottleneck_ratio, bb.group_width,
                       bb.stride, bb.se_ratio, dtype=DT)
    bvars = jax.jit(backbone.init, static_argnames="train")(
        rng, x[:1], train=False)
    stage("backbone", lambda v, xx: backbone.apply(v, xx, train=False),
          bvars, x)
    feats = jax.jit(lambda v, xx: backbone.apply(v, xx, train=False))(
        bvars, x)

    neck = StackBiFPN(fpn_num_filters=bb.fpn_num_filters,
                      fpn_cell_repeats=bb.fpn_cell_repeats,
                      conv_channel_coef=bb.conv_channel_coef, dtype=DT)
    nvars = jax.jit(neck.init, static_argnames="train")(
        rng, [f[:1] for f in feats], train=False)
    stage("neck (stacked BiFPN)",
          lambda v, f: neck.apply(v, list(f), train=False), nvars, feats)
    fused = jax.jit(lambda v, f: neck.apply(v, list(f), train=False))(
        nvars, feats)

    det = DetectionHead(num_classes=cfg.detection.num_classes,
                        in_channels=cfg.detection.fpn_num_filters_detect,
                        aspect_ratios=cfg.detection.aspect_ratios,
                        scales=cfg.detection.scales,
                        box_class_repeats=cfg.detection.box_class_repeats,
                        pyramid_levels=cfg.detection.pyramid_levels,
                        anchor_scale=cfg.detection.anchor_scale, dtype=DT)
    dvars = det.init(rng, (640, 640), [f[:1] for f in fused], train=False)
    stage("det head fwd (towers)",
          lambda v, f: det.apply(v, (640, 640), list(f), train=False),
          dvars, fused)
    dout = jax.jit(lambda v, f: det.apply(v, (640, 640), list(f),
                                          train=False))(dvars, fused)

    seg = SegmentHead(num_ch_enc=cfg.segment.channel_dimension_seg_encode,
                      num_ch_dec=cfg.segment.channel_dimension_seg_decode,
                      num_output_channels=cfg.segment.num_classes, dtype=DT)
    seg_in = [feats[0], fused[0], fused[1], fused[2]]
    svars = seg.init(rng, [t[:1] for t in seg_in], emit_argmax=True)
    stage("seg head fwd (emit_argmax)",
          lambda v, f: seg.apply(v, list(f), emit_argmax=True), svars, seg_in)

    lane = LaneHead(base_channel=cfg.lane.base_channel,
                    num_classes=cfg.lane.num_classes,
                    stride=cfg.lane.anchor_stride,
                    input_width=640, input_height=640,
                    interval=cfg.lane.interval, dtype=DT)
    lvars = lane.init(rng, [f[:1] for f in fused], train=False)
    stage("lane head fwd",
          lambda v, f: lane.apply(v, list(f), train=False), lvars, fused)
    lout = jax.jit(lambda v, f: lane.apply(v, list(f), train=False))(
        lvars, fused)

    cfg_d, cfg_l = cfg.detection, cfg.lane
    anchors, regression, classification = dout

    def det_post(anchors, regression, classification):
        return det_ops.postprocess(
            anchors, regression, classification, (640, 640),
            score_threshold=0.4, iou_threshold=0.3,
            pre_nms_top_k=cfg_d.pre_nms_top_k,
            max_detections=cfg_d.max_detections,
            use_approx_top_k=getattr(cfg_d, "use_approx_top_k", False))

    stage("det postprocess (topk+NMS)", det_post,
          anchors, regression, classification)

    h, w = 640, 640
    fh, fw = cfg.lane_feat_hw
    ppl = cfg.lane_points_per_line

    def lane_post(cls, loc):
        def one(cls_i, loc_i):
            lanes = lane_ops.decode_lanes(
                jax.nn.softmax(cls_i.astype(jnp.float32), axis=-1),
                loc_i.astype(jnp.float32),
                feature_height=fh, feature_width=fw,
                points_per_line=ppl, interval=h / ppl,
                stride=cfg_l.anchor_stride, input_width=w, input_height=h,
                scale_invariance=cfg_l.scale_invariance,
                exist_threshold=0.9)
            return lane_ops.lane_nms(lanes, thresh=80.0,
                                     top_k=cfg_l.pre_nms_top_k,
                                     max_lanes=cfg_l.max_lanes)
        return jax.vmap(one)(cls, loc)

    stage("lane decode+NMS", lane_post,
          lout["predict_cls"], lout["predict_loc"])

    # the real fused program (what bench.py serves)
    model = HydraNet(cfg=cfg, dtype=DT)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    pipe = InferencePipeline(cfg, variables, batch_size=B,
                             input_hw=(1080, 1920), compute_dtype=DT)
    stage("FULL fused pipeline", pipe._run.__wrapped__,
          pipe.variables, frames)

    report()


if __name__ == "__main__":
    main()
