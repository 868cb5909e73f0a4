"""Preprocess + det-postprocess timing at bs128 and variants.

Preprocess: uint8 1080p -> bf16 640^2 normalized.
Det postprocess: anchors ~76k, top-k 1000, class-aware NMS, vmapped over B.
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
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    from hydranet_tpu.inference import preprocess_images
    from hydranet_tpu.heads import detection as det_ops

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (B, 1080, 1920, 3), np.uint8))

    timed("preprocess current (bf16)",
          functools.partial(preprocess_images, target_hw=(640, 640),
                            dtype=DT), frames)

    IMAGENET_MEAN = (0.485, 0.456, 0.406)
    IMAGENET_STD = (0.229, 0.224, 0.225)

    def pre_b(images):
        b = images.shape[0]
        x = jax.image.resize(images.astype(DT), (b, 640, 640, 3),
                             method="linear")
        scale = 1.0 / (255.0 * jnp.asarray(IMAGENET_STD, DT))
        shift = jnp.asarray(IMAGENET_MEAN, DT) / jnp.asarray(IMAGENET_STD, DT)
        return x * scale - shift
    timed("preprocess b: resize-first + fused affine", pre_b, frames)

    # det postprocess at realistic sparsity (~1% anchors above threshold)
    A = 76725
    key = jax.random.PRNGKey(0)
    anchors = jax.random.uniform(key, (1, A, 4), jnp.float32) * 640
    anchors = jnp.sort(anchors, axis=-1)
    regression = jax.random.normal(key, (B, A, 4), jnp.float32) * 0.1
    logits = jax.random.normal(key, (B, A, 8), jnp.float32) * 1.2 - 4.0
    classification = jax.nn.sigmoid(logits)

    post = functools.partial(det_ops.postprocess, image_hw=(640, 640),
                             score_threshold=0.4, iou_threshold=0.3,
                             pre_nms_top_k=1000, max_detections=100)
    timed("det postprocess exact top_k", post, anchors, regression,
          classification)
    timed("det postprocess approx top_k",
          functools.partial(post, use_approx_top_k=True),
          anchors, regression, classification)


if __name__ == "__main__":
    main()
