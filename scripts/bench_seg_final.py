"""Final seg stage experiments (bs128, 320^2 64ch -> 640^2 5 classes, bf16):

 a) current: dilated-conv logits @640^2, then argmax (inference composition)
 b) logits only (isolate argmax cost)
 c) phase form: 4-phase logits @320^2 (Cout=20), argmax per phase at low res,
    interleave the uint8 class map (argmax commutes with the interleave)
 d) phase-matmul form: 2x2 patches as [.., 256] @ [256, 20] matmul
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hydranet_tpu.ops.fused_upsample_conv import _composed_4tap_kernel

B = int(os.environ.get("BENCH_BATCH", "128"))
H = W = 320
CIN, NCLS = 64, 5
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
    print(f"{name:52s} {ms:8.2f} ms")
    return ms


def dilated_logits(x, k):
    pk = _composed_4tap_kernel(k)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp, pk, (1, 1), [(0, 0), (0, 0)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def phase_logits(x, k):
    """[B, H+1, W+1, 4*NCLS] phase-major logits at low res."""
    from hydranet_tpu.ops.fused_upsample_conv import _phase_kernels
    pk = _phase_kernels(k)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def phase_argmax(x, k):
    y = phase_logits(x, k)                      # [B, h+1, w+1, 20]
    b, hp, wp, _ = y.shape
    h, w = hp - 1, wp - 1
    y = y.reshape(b, hp, wp, 4, NCLS)
    cls = jnp.argmax(y, axis=-1).astype(jnp.uint8)   # [B, h+1, w+1, 4]
    c00 = cls[:, :-1, :-1, 0]
    c01 = cls[:, :-1, 1:, 1]
    c10 = cls[:, 1:, :-1, 2]
    c11 = cls[:, 1:, 1:, 3]
    out = jnp.stack([c00, c01, c10, c11], axis=-1).reshape(b, h, w, 2, 2)
    return out.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, 2 * w)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, W, CIN), DT)
    k = jax.random.normal(rng, (3, 3, CIN, NCLS), DT) * 0.05

    timed("a) dilated logits @640 + argmax",
          lambda x, k: jnp.argmax(dilated_logits(x, k), axis=-1)
          .astype(jnp.uint8), x, k)
    timed("b) dilated logits only", dilated_logits, x, k)
    timed("c) phase logits @320 + phase argmax + u8 interleave",
          phase_argmax, x, k)
    timed("c2) phase logits only", phase_logits, x, k)

    # numeric: c == a
    xs = jax.random.normal(rng, (2, 6, 6, CIN), jnp.float32)
    ks = jax.random.normal(rng, (3, 3, CIN, NCLS), jnp.float32) * 0.1
    a = np.asarray(jnp.argmax(dilated_logits(xs, ks), -1))
    c = np.asarray(jax.jit(phase_argmax)(xs, ks))
    print("argmax parity a vs c:", (a == c).mean())


if __name__ == "__main__":
    main()
