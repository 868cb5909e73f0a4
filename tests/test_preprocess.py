"""On-device preprocessing vs the reference's host chain (demo.py:188-196):
cv2 INTER_LINEAR resize + imagenet normalize. jax.image.resize('linear') uses
the same half-pixel-center convention, so outputs agree closely."""

import cv2
import numpy as np

import jax.numpy as jnp

from hydranet_tpu.data.utility import imagenet_normalize
from hydranet_tpu.inference import preprocess_images


def test_preprocess_matches_cv2_chain():
    rng = np.random.RandomState(0)
    # smooth-ish synthetic frame: resize differences show up less on noise
    base = rng.rand(27, 48, 3)
    frame = (cv2.resize(base, (1920, 1080),
                        interpolation=cv2.INTER_CUBIC) * 255).clip(0, 255)
    frame = frame.astype(np.uint8)

    # reference chain (demo.py:191-195), already-RGB input
    want = imagenet_normalize(
        cv2.resize(frame, (640, 640), interpolation=cv2.INTER_LINEAR)
        .astype(np.float32))

    got = np.asarray(preprocess_images(jnp.asarray(frame[None]),
                                       (640, 640))[0])
    # bulk agreement (resize kernels differ only in rounding)
    assert np.percentile(np.abs(got - want), 99) < 0.05
    assert np.mean(np.abs(got - want)) < 0.01


def test_preprocess_identity_resolution():
    rng = np.random.RandomState(1)
    frame = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
    got = np.asarray(preprocess_images(jnp.asarray(frame), (64, 64)))
    want = imagenet_normalize(frame[0].astype(np.float32))
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-5)
