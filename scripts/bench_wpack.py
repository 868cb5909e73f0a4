"""W-packed final-seg-stage sweep (roofline fix, see
fused_upsample_conv._wpack_argmax): shipped phase conv+argmax vs the
stride-(1,g) W-packed formulation for g in {3, 4, 6, 8}, at the hot shape
(bs128, 320^2, 64 -> 5ch -> 640^2 ids, bf16).

The roofline (artifacts/roofline_r4.log) says the stage's 15.5 ms sit
>20x above its MXU bound because the 20-lane phase logits pad to 128
lanes (~6.8 GB HBM round trip at bs128); packing g output columns into
the lane dim shrinks the physical tensor ~g-fold at (g+1)/2 x the (dark)
FLOPs. Parity is exact (tests/test_fused_ops.py::test_wpack_argmax_*).
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp
import numpy as np

from _bench_util import timed as _timed

from hydranet_tpu.ops.fused_upsample_conv import (_wpack_argmax,
                                                  upsample2x_conv3x3_argmax)

B = int(os.environ.get("BENCH_BATCH", "128"))
H = W = 320
CIN, NCLS = 64, 5
DT = jnp.bfloat16

timed = functools.partial(_timed, iters=20, width=46)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, CIN), DT)
    k = jnp.asarray(rng.randn(3, 3, CIN, NCLS) * 0.1, DT)
    bias = jnp.asarray(rng.randn(NCLS) * 0.1, DT)

    want = np.asarray(upsample2x_conv3x3_argmax(x[:2], k, bias))
    timed("shipped phase conv + argmax",
          lambda x: upsample2x_conv3x3_argmax(x, k, bias), x)
    for g in (3, 4, 6, 8):
        got = np.asarray(_wpack_argmax(x[:2], k, bias, g=g))
        agree = (want == got).mean()
        timed(f"wpack g={g} (agree {agree:.6f})",
              lambda x, g=g: _wpack_argmax(x, k, bias, g=g), x)


if __name__ == "__main__":
    main()
