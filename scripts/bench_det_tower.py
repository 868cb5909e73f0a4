"""Detection towers: XLA composition vs fused Pallas kernel (standalone).

The stage mix (NOTES.md) charges the det towers ~12.5 ms at bs128: 8
separable-conv passes x 5 levels whose intermediates all re-enter HBM
(~8 GB traffic against a ~1 ms in+out roofline). ops/pallas_tower.py runs
both towers VMEM-resident per level. This measures both paths standalone
on the flagship shapes (levels 80^2..5^2 x 112ch, A=9, K=9 classes); the
in-pipeline number comes from `HN_PALLAS_TOWER=1 python bench.py`.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timed as _timed

from hydranet_tpu.heads.detection import DetectionHead

B = int(os.environ.get("BENCH_BATCH", "128"))
C = 112
RATIOS = ((1.0, 1.0), (1.4, 0.7), (0.7, 1.4))
SCALES = (2 ** 0.0, 2 ** (1.0 / 3), 2 ** (2.0 / 3))
IMAGE_HW = (640, 640)
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
DT = jnp.bfloat16


timed = functools.partial(_timed, iters=ITERS, width=52)


def main():
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(jax.random.fold_in(rng, i),
                               (B, s, s, C), DT)
             for i, s in enumerate([80, 40, 20, 10, 5])]
    head = DetectionHead(num_classes=9, in_channels=C,
                         aspect_ratios=RATIOS, scales=SCALES,
                         box_class_repeats=3, pyramid_levels=5,
                         dtype=DT)
    os.environ["HN_NO_PALLAS_TOWER"] = "1"
    variables = head.init(jax.random.PRNGKey(1), IMAGE_HW,
                          [f[:1] for f in feats])

    def run(vs, fs):
        return head.apply(vs, IMAGE_HW, fs)

    xla_ms = timed(f"XLA towers (bs{B})", run, variables, feats)

    os.environ.pop("HN_NO_PALLAS_TOWER", None)
    os.environ["HN_PALLAS_TOWER"] = "1"
    if head._use_fused_towers(feats):
        fused_ms = timed(f"fused Pallas towers (bs{B})", run, variables,
                         feats)
        print(f"delta: {xla_ms - fused_ms:+.2f} ms "
              f"({xla_ms / max(fused_ms, 1e-9):.2f}x)")
        # numeric sanity on the real backend (bf16 tolerance)
        fast = jax.jit(run)(variables, [f[:2] for f in feats])
        os.environ["HN_NO_PALLAS_TOWER"] = "1"
        slow = jax.jit(run)(variables, [f[:2] for f in feats])
        os.environ.pop("HN_NO_PALLAS_TOWER", None)
        for name, f, s in zip(("anchors", "reg", "cls"), fast, slow):
            d = float(jnp.max(jnp.abs(f.astype(jnp.float32)
                                      - s.astype(jnp.float32))))
            print(f"max|fused - xla| {name}: {d:.3e}")
    else:
        print("fused kernel unsupported on this backend/config")


if __name__ == "__main__":
    main()
