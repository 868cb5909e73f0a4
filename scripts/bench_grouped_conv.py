"""Grouped-conv cost in the backbone (bs128 bf16): time each stage's 3x3
grouped conv (gw=8) with IN-PROGRAM repetition (chained fori_loop inside one
jit — standalone dispatches through this harness's tunnel cost ~1.5-2 ms,
swamping sub-ms ops). Compares vs the stage's 1x1 convs and a dense 3x3.

Big-backbone stages (640 input): widths [24,64,152,376,936],
depths [1,1,4,10,14], resolutions [160,80,40,20,10].
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", "128"))
DT = jnp.bfloat16
REPS = 20
GW = 8


def timed(name, op, x, flops=None):
    """op: y -> y (shape-preserving); chained REPS times inside one jit."""
    fn = jax.jit(lambda x: jax.lax.fori_loop(0, REPS, lambda i, y: op(y), x))
    digest = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    r = fn(x)
    np.asarray(digest(r))
    t0 = time.perf_counter()
    K = 5
    for _ in range(K):
        r = fn(r)
    np.asarray(digest(r))
    ms = (time.perf_counter() - t0) / (K * REPS) * 1000
    tfs = (flops / (ms / 1000)) / 1e12 if flops else float("nan")
    print(f"{name:44s} {ms:8.3f} ms   {tfs:6.1f} TF/s", flush=True)
    return ms


def main():
    rng = jax.random.PRNGKey(0)
    stages = [(160, 24, 1), (80, 64, 1), (40, 152, 4), (20, 376, 10),
              (10, 936, 14)]
    total_g, total_1x1 = 0.0, 0.0
    for hw, c, nblk in stages:
        x = jax.random.normal(rng, (B, hw, hw, c), DT) * 0.1
        kg = jax.random.normal(rng, (3, 3, GW, c), DT) * 0.05
        g = c // GW

        def gconv(y, k=kg, groups=g):
            return jax.lax.conv_general_dilated(
                y, k, (1, 1), [(1, 1), (1, 1)], feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=y.dtype)
        ms = timed(f"grouped 3x3 {hw}^2 c{c} g{g}", gconv, x,
                   flops=2 * B * hw * hw * 9 * GW * c)
        total_g += ms * nblk

        k1 = jax.random.normal(rng, (1, 1, c, c), DT) * 0.05

        def conv1(y, k=k1):
            return jax.lax.conv_general_dilated(
                y, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=y.dtype)
        ms1 = timed(f"  1x1 {hw}^2 {c}->{c}", conv1, x,
                    flops=2 * B * hw * hw * c * c)
        total_1x1 += 2 * ms1 * nblk  # two 1x1s per block (conv1, conv3)

        kd = jax.random.normal(rng, (3, 3, c, c), DT) * 0.02

        def dconv(y, k=kd):
            return jax.lax.conv_general_dilated(
                y, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=y.dtype)
        timed(f"  dense 3x3 {hw}^2 {c}->{c}", dconv, x,
              flops=2 * B * hw * hw * 9 * c * c)

    print(f"\nest. grouped total across blocks = {total_g:.1f} ms; "
          f"1x1 pairs total = {total_1x1:.1f} ms (backbone fwd ~21 ms)")


if __name__ == "__main__":
    main()
