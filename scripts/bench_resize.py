"""Preprocess resize strategies: uint8 1080p -> normalized bf16 640x640.

Current: jax.image.resize(method='linear') (antialiased, dense taps).
Candidate: periodic 2-tap bilinear (cv2 INTER_LINEAR semantics) —
1920->640 is an exact stride-3 single-tap subsample, 1080->640 is a
27-row -> 16-row self-contained periodic blend (27/16 rational scale), so
the resize becomes reshape+slice + one [27,16] einsum.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = 20
DT = jnp.bfloat16

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def timed(name, fn, *args):
    jit_fn = jax.jit(fn)
    digest = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    r = jit_fn(*args)
    np.asarray(digest(r))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = jit_fn(*args)
    np.asarray(digest(r))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:56s} {ms:8.2f} ms", flush=True)
    return ms


def axis_blend(n_in, n_out):
    """Periodic 2-tap bilinear taps for n_in -> n_out (downscale).
    Returns (period_in, period_out, W[period_in, period_out]) or None."""
    g = math.gcd(n_in, n_out)
    pin, pout = n_in // g, n_out // g
    if pin > 64:
        return None
    w = np.zeros((pin, pout), np.float32)
    for r in range(pout):
        f = (r + 0.5) * pin / pout - 0.5
        i0 = int(np.floor(f))
        frac = f - i0
        w[i0, r] += 1.0 - frac
        if frac > 0:
            w[min(i0 + 1, pin - 1), r] += frac
    return pin, pout, w


def periodic_resize(frames, out_hw, dtype):
    b, h0, w0, c = frames.shape
    h, w = out_hw
    py_in, py_out, wy = axis_blend(h0, h)
    px_in, px_out, wx = axis_blend(w0, w)
    x = frames
    # x axis first (stride-3 single tap for 1920->640: slice, no matmul)
    if px_out == 1 and np.count_nonzero(wx) == 1:
        tap = int(np.nonzero(wx[:, 0])[0][0])
        x = x.reshape(b, h0, w // 1, px_in, c)[:, :, :, tap, :]
        x = x.astype(dtype)
    else:
        x = x.reshape(b, h0, w0 // px_in, px_in, c).astype(dtype)
        x = jnp.einsum("bhgpc,pr->bhgrc", x, jnp.asarray(wx, dtype))
        x = x.reshape(b, h0, w, c)
    # y axis
    x = x.reshape(b, h0 // py_in, py_in, w, c)
    x = jnp.einsum("bgpwc,pr->bgrwc", x, jnp.asarray(wy, dtype))
    return x.reshape(b, h, w, c)


def pre_current(frames):
    from hydranet_tpu.inference import preprocess_images
    return preprocess_images(frames, (640, 640), dtype=DT)


def pre_periodic(frames):
    x = periodic_resize(frames, (640, 640), DT)
    scale = 1.0 / (255.0 * jnp.asarray(IMAGENET_STD, DT))
    shift = jnp.asarray(IMAGENET_MEAN, DT) / jnp.asarray(IMAGENET_STD, DT)
    return x * scale - shift


def main():
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (B, 1080, 1920, 3), np.uint8))
    timed("current jax.image.resize + normalize", pre_current, frames)
    timed("periodic 2-tap resize + normalize", pre_periodic, frames)

    # numeric check vs cv2 INTER_LINEAR on a smooth frame
    import cv2
    base = rng.rand(27, 48, 3)
    frame = (cv2.resize(base, (1920, 1080),
                        interpolation=cv2.INTER_CUBIC) * 255).clip(0, 255)
    frame = frame.astype(np.uint8)
    want = cv2.resize(frame, (640, 640), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(periodic_resize(jnp.asarray(frame[None]), (640, 640),
                                     jnp.float32))[0]
    err = np.abs(got - want.astype(np.float32))
    print(f"periodic vs cv2 INTER_LINEAR: mean |err| {err.mean():.4f}  "
          f"p99 {np.percentile(err, 99):.4f}  max {err.max():.4f}")


if __name__ == "__main__":
    main()


def components():
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (B, 1080, 1920, 3), np.uint8))

    timed("convert u8->bf16 full res only", lambda f: f.astype(DT), frames)
    timed("convert + normalize full res",
          lambda f: f.astype(DT) * (1.0 / 255) - 0.45, frames)

    def xsub_u8(f):
        return f.reshape(B, 1080, 640, 3, 3)[:, :, :, 1, :]
    timed("x-subsample stride3 on uint8", xsub_u8, frames)

    def xsub_bf16(f):
        x = f.astype(DT)
        return x.reshape(B, 1080, 640, 3, 3)[:, :, :, 1, :]
    timed("convert bf16 then x-subsample", xsub_bf16, frames)

    def yblend_only(f):
        _, _, wy = axis_blend(1080, 640)
        x = f.astype(DT).reshape(B, 40, 27, 1920, 3)
        x = jnp.einsum("bgpwc,pr->bgrwc", x, jnp.asarray(wy, DT))
        return x.reshape(B, 640, 1920, 3)
    timed("y-blend einsum on full width (bf16)", yblend_only, frames)

    def y_then_x(f):
        _, _, wy = axis_blend(1080, 640)
        x = f.astype(DT).reshape(B, 40, 27, 1920, 3)
        x = jnp.einsum("bgpwc,pr->bgrwc", x, jnp.asarray(wy, DT))
        x = x.reshape(B, 640, 640, 3, 3)[:, :, :, 1, :]
        scale = 1.0 / (255.0 * jnp.asarray(IMAGENET_STD, DT))
        shift = jnp.asarray(IMAGENET_MEAN, DT) / jnp.asarray(IMAGENET_STD, DT)
        return x * scale - shift
    timed("y-blend then x-subsample + normalize", y_then_x, frames)

    def y_dot_form(f):
        _, _, wy = axis_blend(1080, 640)
        # contraction as explicit dot_general with batch dims
        x = f.astype(DT).reshape(B * 40, 27, 1920 * 3)
        w = jnp.asarray(wy.T, DT)  # [16, 27]
        y = jax.lax.dot_general(w, x, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y
    timed("y-blend as dot_general (f32 acc)", y_dot_form, frames)


if __name__ == "__main__" and os.environ.get("COMPONENTS"):
    components()
