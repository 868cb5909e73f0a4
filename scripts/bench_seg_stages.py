"""Per-stage timing of the segmentation decoder on the real chip (bs from
env BENCH_BATCH, default 128, bf16). Pipelined timing: K dispatches + one
small digest fetch (block_until_ready does not block through this harness's
tunnel — see NOTES.md).

Usage: python scripts/bench_seg_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hydranet_tpu.heads.segmentation import ConvBlock, UpConvBlock, \
    _OutputConvShim, SegmentHead

B = int(os.environ.get("BENCH_BATCH", "128"))
DT = jnp.bfloat16
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def timed(name, fn, *args, flops=None):
    jit_fn = jax.jit(fn)
    digest = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    r = jit_fn(*args)
    np.asarray(digest(r))  # compile+warm
    r = jit_fn(*args)
    np.asarray(digest(r))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = jit_fn(*args)
    np.asarray(digest(r))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    tfs = (flops / (ms / 1000)) / 1e12 if flops else float("nan")
    print(f"{name:42s} {ms:8.2f} ms   {tfs:6.1f} TF/s")
    return ms


def conv_flops(hw, cin, cout, k=9):
    return 2 * B * hw * hw * k * cin * cout


def main():
    rng = jax.random.PRNGKey(0)
    # encoder features for 640x640 big-backbone config
    feats = [
        jax.random.normal(rng, (B, 160, 160, 24), DT),
        jax.random.normal(rng, (B, 80, 80, 112), DT),
        jax.random.normal(rng, (B, 40, 40, 112), DT),
        jax.random.normal(rng, (B, 20, 20, 112), DT),
    ]
    dec = (64, 128, 256, 512)

    def stage(mod, *xs):
        variables = mod.init(rng, *xs)
        return lambda *a: mod.apply(variables, *a), xs

    total = 0.0
    # i=0
    f, xs = stage(ConvBlock(512, dtype=DT), feats[3])
    total += timed("conv 20^2 112->512", f, *xs, flops=conv_flops(20, 112, 512))
    z0 = jax.random.normal(rng, (B, 20, 20, 512), DT)
    f, xs = stage(UpConvBlock(512, dtype=DT), z0, feats[2])
    total += timed("upconv 20->40 (512+skip112)->512", f, *xs,
                   flops=conv_flops(40, 512, 512, 4) + conv_flops(40, 112, 512))
    # i=1
    z1 = jax.random.normal(rng, (B, 40, 40, 512), DT)
    f, xs = stage(ConvBlock(256, dtype=DT), z1)
    total += timed("conv 40^2 512->256", f, *xs, flops=conv_flops(40, 512, 256))
    z1b = jax.random.normal(rng, (B, 40, 40, 256), DT)
    f, xs = stage(UpConvBlock(256, dtype=DT), z1b, feats[1])
    total += timed("upconv 40->80 (256+skip112)->256", f, *xs,
                   flops=conv_flops(80, 256, 256, 4) + conv_flops(80, 112, 256))
    # i=2
    z2 = jax.random.normal(rng, (B, 80, 80, 256), DT)
    f, xs = stage(ConvBlock(128, dtype=DT), z2)
    total += timed("conv 80^2 256->128", f, *xs, flops=conv_flops(80, 256, 128))
    z2b = jax.random.normal(rng, (B, 80, 80, 128), DT)
    f, xs = stage(UpConvBlock(128, dtype=DT), z2b, feats[0])
    total += timed("upconv 80->160 (128+skip24)->128", f, *xs,
                   flops=conv_flops(160, 128, 128, 4) + conv_flops(160, 24, 128))
    # i=3
    z3 = jax.random.normal(rng, (B, 160, 160, 128), DT)
    f, xs = stage(ConvBlock(64, dtype=DT), z3)
    total += timed("conv 160^2 128->64", f, *xs, flops=conv_flops(160, 128, 64))
    z3b = jax.random.normal(rng, (B, 160, 160, 64), DT)
    f, xs = stage(UpConvBlock(64, dtype=DT), z3b)
    total += timed("upconv 160->320 64->64", f, *xs,
                   flops=conv_flops(320, 64, 64, 4))
    # final
    z4 = jax.random.normal(rng, (B, 320, 320, 64), DT)
    f, xs = stage(_OutputConvShim(5, dtype=DT), z4)
    total += timed("final up 320->640 64->5", f, *xs,
                   flops=conv_flops(640, 64, 5, 4))
    print(f"{'SUM of stages':42s} {total:8.2f} ms")

    # whole head
    head = SegmentHead(num_ch_enc=(24, 112, 112, 112), num_ch_dec=dec,
                       num_output_channels=5, dtype=DT)
    variables = head.init(rng, feats)
    timed("FULL seg head", lambda *fs: head.apply(variables, list(fs)),
          *feats, flops=2 * B * 17.6e9)

    # matmul roofline with comparable FLOPs
    a = jax.random.normal(rng, (8192, 4096), DT)
    bm = jax.random.normal(rng, (4096, 8192), DT)
    timed("matmul roofline 8192x4096x8192",
          lambda a, b: jnp.dot(a, b, preferred_element_type=DT), a, bm,
          flops=2 * 8192 * 4096 * 8192)


if __name__ == "__main__":
    main()
