"""Fused two-stage phase tail vs the shipped composition, hot shape
(bs128: x 160^2 64ch -> up3 320^2 64ch -> final 640^2 argmax ids, bf16).

Shipped (after the r4 wpack flip): dilated up3 conv (7.9 ms @ 54 TF/s,
N=64 lanes) + W-packed final conv+argmax (12.7 ms). The phase tail runs
both stages in phase space: up conv K=256/N=256, final conv K=1024/N=80
(see ops/fused_upsample_conv.upsample4x_phase_tail_argmax) — the
320^2 intermediate never materializes interleaved.
"""

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
import numpy as np

from _bench_util import timed as _timed

from hydranet_tpu.ops.fused_upsample_conv import (
    upsample2x_conv3x3_argmax, upsample2x_reflect_conv3x3,
    upsample4x_phase_tail_argmax)

B = int(os.environ.get("BENCH_BATCH", "128"))
H = W = 160
CIN = CMID = 64
NCLS = 5
DT = jnp.bfloat16

timed = functools.partial(_timed, iters=20, width=46)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, CIN), DT)
    ku = jnp.asarray(rng.randn(3, 3, CIN, CMID) * 0.1, DT)
    bu = jnp.asarray(rng.randn(CMID) * 0.1, DT)
    kf = jnp.asarray(rng.randn(3, 3, CMID, NCLS) * 0.1, DT)
    bf = jnp.asarray(rng.randn(NCLS) * 0.1, DT)

    def shipped(x):
        x2 = jax.nn.elu(upsample2x_reflect_conv3x3(x, ku, bu))
        return upsample2x_conv3x3_argmax(x2, kf, bf)

    want = np.asarray(shipped(x[:2]))
    got = np.asarray(upsample4x_phase_tail_argmax(x[:2], ku, bu, kf, bf))
    print(f"agreement vs shipped: {(want == got).mean():.6f} "
          f"(<1.0 only at bf16 accumulation-order ties)")

    timed("shipped: dilated up3 + wpack final", shipped, x)
    timed("fused phase tail",
          lambda x: upsample4x_phase_tail_argmax(x, ku, bu, kf, bf), x)


if __name__ == "__main__":
    main()
