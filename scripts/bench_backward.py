"""Backward-pass drill-down (round 3: profile_train shows backward adds
+260 ms to the bs64 step vs ~155 ms expected at 2x-forward cost — this
bench attributes the excess per component).

Each component is instantiated standalone (bench_components.py pattern)
and timed twice: train-mode forward, then grad-of-sum(outputs) wrt its
params (fwd+bwd). The final rows time the seg decoder's two exact upconv
formulations in both directions — the lhs_dilation=2 "dilated" form is
the bs>=8 TRAIN path and its transposed weight-grad conv has never been
measured (NOTES.md round-3).

Usage: python scripts/bench_backward.py   [BENCH_TRAIN_BATCH=64]
"""

from __future__ import annotations

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _bench_util import timed as _timed

B = int(os.environ.get("BENCH_TRAIN_BATCH", "64"))
DT = jnp.bfloat16
ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "10"))

timed = functools.partial(_timed, iters=ITERS, width=42)


def _sum_outputs(out):
    # sum of SQUARES, not sum: a plain sum makes the cotangent a constant
    # ones tensor and XLA algebraically collapses the weight-grad convs
    # (measured: upconv dk 6.7 ms < its own fwd 13.1 ms). dy = 2*out is
    # data-dependent like a real loss cotangent.
    return sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
               for t in jax.tree_util.tree_leaves(out)
               if hasattr(t, "astype"))


def fwd_bwd_rows(name, module, variables, call, *args):
    """call(module, variables, *args) -> (outputs, mutations)."""
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def fwd(p, *a):
        out, _ = call(module, {"params": p, **rest}, *a)
        return out

    def loss(p, *a):
        out, mut = call(module, {"params": p, **rest}, *a)
        return _sum_outputs(out), mut

    timed(f"  {name} fwd (train)", fwd, params, *args)
    timed(f"  {name} fwd+bwd", jax.grad(loss, has_aux=True), params, *args)


def main():
    from hydranet_tpu.config import load_config
    from hydranet_tpu.heads.detection import DetectionHead
    from hydranet_tpu.heads.lane import LaneHead
    from hydranet_tpu.heads.segmentation import SegmentHead
    from hydranet_tpu.models.bifpn import StackBiFPN
    from hydranet_tpu.models.regnet import RegNetY

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config(os.path.join(repo,
                                   "configs/hydranet_joint_big_backbone.yml"))
    bb = cfg.backbone
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, 640, 640, 3), DT)

    print(f"=== backward drill-down, bs{B} bf16 ===", flush=True)

    backbone = RegNetY(bb.initial_width, bb.slope, bb.quantized_param,
                       bb.network_depth, bb.bottleneck_ratio, bb.group_width,
                       bb.stride, bb.se_ratio, dtype=DT)
    bvars = jax.jit(backbone.init, static_argnames="train")(
        rng, x[:1], train=True)
    fwd_bwd_rows("backbone", backbone, bvars,
                 lambda m, v, xx: m.apply(v, xx, train=True,
                                          mutable=["batch_stats"]), x)
    feats = jax.jit(lambda v, xx: backbone.apply(v, xx, train=False))(
        bvars, x)
    feats = [jax.lax.stop_gradient(f) for f in feats]

    neck = StackBiFPN(fpn_num_filters=bb.fpn_num_filters,
                      fpn_cell_repeats=bb.fpn_cell_repeats,
                      conv_channel_coef=bb.conv_channel_coef, dtype=DT)
    nvars = jax.jit(neck.init, static_argnames="train")(
        rng, [f[:1] for f in feats], train=True)
    fwd_bwd_rows("neck", neck, nvars,
                 lambda m, v, f: m.apply(v, list(f), train=True,
                                         mutable=["batch_stats"]), feats)
    fused = jax.jit(lambda v, f: neck.apply(v, list(f), train=False))(
        nvars, feats)
    fused = [jax.lax.stop_gradient(f) for f in fused]

    det = DetectionHead(num_classes=cfg.detection.num_classes,
                        in_channels=cfg.detection.fpn_num_filters_detect,
                        aspect_ratios=cfg.detection.aspect_ratios,
                        scales=cfg.detection.scales,
                        box_class_repeats=cfg.detection.box_class_repeats,
                        pyramid_levels=cfg.detection.pyramid_levels,
                        anchor_scale=cfg.detection.anchor_scale, dtype=DT)
    dvars = det.init(rng, (640, 640), [f[:1] for f in fused], train=True)
    fwd_bwd_rows("det head", det, dvars,
                 lambda m, v, f: m.apply(v, (640, 640), list(f), train=True,
                                         mutable=["batch_stats"]), fused)

    seg = SegmentHead(num_ch_enc=cfg.segment.channel_dimension_seg_encode,
                      num_ch_dec=cfg.segment.channel_dimension_seg_decode,
                      num_output_channels=cfg.segment.num_classes, dtype=DT)
    seg_in = [feats[0], fused[0], fused[1], fused[2]]
    svars = seg.init(rng, [t[:1] for t in seg_in])
    fwd_bwd_rows("seg head", seg, svars,
                 lambda m, v, f: (m.apply(v, list(f)), None), seg_in)

    lane = LaneHead(base_channel=cfg.lane.base_channel,
                    num_classes=cfg.lane.num_classes,
                    stride=cfg.lane.anchor_stride,
                    input_width=640, input_height=640,
                    interval=cfg.lane.interval, dtype=DT)
    lvars = lane.init(rng, [f[:1] for f in fused], train=True)
    fwd_bwd_rows("lane head", lane, lvars,
                 lambda m, v, f: m.apply(v, list(f), train=True,
                                         mutable=["batch_stats"]), fused)

    # seg upconv formulations, both directions (dk = weight grad only,
    # dx = input grad only — the decoder needs both every stage)
    from hydranet_tpu.ops import fused_upsample_conv as fuc
    for (hh, cin, cout, tag) in [(160, 64, 64, "mid 160^2 64->64"),
                                 (320, 64, 5, "final 320^2 64->5")]:
        xx = jax.random.uniform(rng, (B, hh, hh, cin), DT)
        kk = jax.random.uniform(rng, (3, 3, cin, cout), DT)
        for fname, form in [("dilated", fuc._dilated_form),
                            ("phase", fuc._phase_form)]:
            timed(f"  upconv {fname} {tag} fwd",
                  lambda k, xv, f=form: f(xv, k), kk, xx)
            timed(f"  upconv {fname} {tag} dk",
                  jax.grad(lambda k, xv, f=form:
                           jnp.sum(jnp.square(f(xv, k).astype(jnp.float32)))), kk, xx)
            timed(f"  upconv {fname} {tag} dx",
                  jax.grad(lambda xv, k, f=form:
                           jnp.sum(jnp.square(f(xv, k).astype(jnp.float32)))), xx, kk)


if __name__ == "__main__":
    main()
