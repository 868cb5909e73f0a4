"""Isolate where the upconv (fused upsample+conv) time goes at the hot
shape (bs128, 160^2 -> 320^2, 64->64ch, bf16) and compare XLA formulations:

 a) current phase-collapsed conv + stack/transpose interleave
 b) phase conv only, NO interleave (4 phase outputs) — isolates interleave
 c) naive nearest-up2 (repeat) -> reflect pad -> conv3x3
 d) transposed-conv formulation: lhs_dilation=2 with composed 4x4 kernel
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hydranet_tpu.ops.fused_upsample_conv import (_phase_kernels,
                                                  upsample2x_reflect_conv3x3)

B = int(os.environ.get("BENCH_BATCH", "128"))
H = W = int(os.environ.get("BENCH_HW", "160"))
CIN = int(os.environ.get("BENCH_CIN", "64"))
COUT = int(os.environ.get("BENCH_COUT", "64"))
DT = jnp.bfloat16
ITERS = 20


def timed(name, fn, *args):
    jit_fn = jax.jit(fn)
    digest = jax.jit(lambda y: sum(jnp.sum(t.astype(jnp.float32))
                                   for t in jax.tree_util.tree_leaves(y)))
    r = jit_fn(*args)
    np.asarray(digest(r))
    r = jit_fn(*args)
    np.asarray(digest(r))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = jit_fn(*args)
    np.asarray(digest(r))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:48s} {ms:8.2f} ms")
    return ms


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, W, CIN), DT)
    k = jax.random.normal(rng, (3, 3, CIN, COUT), DT) * 0.05

    timed("a) phase conv + interleave (current)",
          upsample2x_reflect_conv3x3, x, k)

    def phases_only(x, k):
        pk = _phase_kernels(k)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return jax.lax.conv_general_dilated(
            xp, pk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
    timed("b) phase conv only (no interleave)", phases_only, x, k)

    def naive(x, k):
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        up = jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            up, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
    timed("c) repeat-up2 + pad + conv3x3", naive, x, k)

    def transposed(x, k):
        # nearest-up2 = conv_transpose(x, ones 2x2, stride 2); composing with
        # the 3x3 conv gives a 4x4 kernel applied with lhs_dilation=2.
        ones = jnp.ones((2, 2, 1, 1), k.dtype)
        kk = jax.vmap(jax.vmap(
            lambda w: jax.lax.conv_general_dilated(
                jnp.pad(w[None, :, :, None], ((0, 0), (1, 1), (1, 1), (0, 0))),
                ones, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0],
            in_axes=2, out_axes=2), in_axes=3, out_axes=3)(k[::-1, ::-1])
        kk = kk[::-1, ::-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            xp, kk, (1, 1), [(0, 0), (0, 0)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return y[:, 1:1 + 2 * H, 1:1 + 2 * W]
    timed("d) lhs_dilation=2 composed 4x4 kernel", transposed, x, k)

    # numeric cross-check a vs c vs d on small shape
    xs = jax.random.normal(rng, (2, 8, 8, CIN), jnp.float32)
    ks = jax.random.normal(rng, (3, 3, CIN, COUT), jnp.float32) * 0.05
    a = upsample2x_reflect_conv3x3(xs, ks)
    c = jax.jit(naive)(xs, ks)
    d = jax.jit(transposed)(xs, ks)
    print("max|a-c|:", float(jnp.max(jnp.abs(a - c))))
    print("max|a-d|:", float(jnp.max(jnp.abs(a - d))))


if __name__ == "__main__":
    main()
