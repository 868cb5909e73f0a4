"""Component-level timing of the pipeline at bs128 bf16 on the chip:
backbone, neck, each head forward, full forward, preprocess + postprocess.
Each component is instantiated standalone with random params (timing is
independent of weights).
"""

import functools
import os
import sys

# persistent XLA compile cache: first compile of the big pipeline is
# minutes through the remote-TPU tunnel; later invocations (and the other
# bench/chain scripts) reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from _bench_util import timed as _timed

B = int(os.environ.get("BENCH_BATCH", "128"))
DT = jnp.bfloat16
ITERS = int(os.environ.get("BENCH_ITERS", "20"))

timed = functools.partial(_timed, iters=ITERS, width=36)


def main():
    from hydranet_tpu.config import load_config
    from hydranet_tpu.models.hydranet import HydraNet
    from hydranet_tpu.models.regnet import RegNetY
    from hydranet_tpu.models.bifpn import StackBiFPN
    from hydranet_tpu.heads.detection import DetectionHead
    from hydranet_tpu.heads.lane import LaneHead

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_config(os.path.join(repo,
                                   "configs/hydranet_joint_big_backbone.yml"))
    bb = cfg.backbone
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, 640, 640, 3), jnp.float32)

    backbone = RegNetY(bb.initial_width, bb.slope, bb.quantized_param,
                       bb.network_depth, bb.bottleneck_ratio, bb.group_width,
                       bb.stride, bb.se_ratio, dtype=DT)
    bvars = jax.jit(backbone.init, static_argnames="train")(
        rng, x[:1], train=False)
    timed("backbone", lambda v, xx: backbone.apply(v, xx, train=False),
          bvars, x)
    feats = jax.jit(lambda v, xx: backbone.apply(v, xx, train=False))(bvars, x)

    neck = StackBiFPN(fpn_num_filters=bb.fpn_num_filters,
                      fpn_cell_repeats=bb.fpn_cell_repeats,
                      conv_channel_coef=bb.conv_channel_coef, dtype=DT)
    nvars = jax.jit(neck.init, static_argnames="train")(
        rng, [f[:1] for f in feats], train=False)
    timed("neck (stacked BiFPN)",
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
    timed("det head fwd",
          lambda v, f: det.apply(v, (640, 640), list(f), train=False),
          dvars, fused)

    from hydranet_tpu.heads.segmentation import SegmentHead
    seg = SegmentHead(num_ch_enc=cfg.segment.channel_dimension_seg_encode,
                      num_ch_dec=cfg.segment.channel_dimension_seg_decode,
                      num_output_channels=cfg.segment.num_classes, dtype=DT)
    seg_in = [feats[0], fused[0], fused[1], fused[2]]
    svars = seg.init(rng, [t[:1] for t in seg_in], emit_argmax=True)
    timed("seg head fwd (logits)",
          lambda v, f: seg.apply(v, list(f)), svars, seg_in)
    timed("seg head fwd (emit_argmax)",
          lambda v, f: seg.apply(v, list(f), emit_argmax=True),
          svars, seg_in)

    lane = LaneHead(base_channel=cfg.lane.base_channel,
                    num_classes=cfg.lane.num_classes,
                    stride=cfg.lane.anchor_stride,
                    input_width=640, input_height=640,
                    interval=cfg.lane.interval, dtype=DT)
    lvars = lane.init(rng, [f[:1] for f in fused], train=False)
    timed("lane head fwd",
          lambda v, f: lane.apply(v, list(f), train=False), lvars, fused)

    model = HydraNet(cfg=cfg, dtype=DT)
    mvars = jax.jit(model.init)(rng, x[:1])
    timed("FULL forward (3 heads)",
          lambda v, xx: model.apply(v, xx, train=False), mvars, x)


if __name__ == "__main__":
    main()
