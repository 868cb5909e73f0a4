"""Fused resize+normalize kernel: taps, support detection, numeric parity
with cv2 INTER_LINEAR (the reference demo's host resize, demo.py:191-196),
and the pipeline fallback wiring. The kernel runs in Pallas interpret mode
on the CPU test mesh; the compiled path is covered by the TPU benches."""

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from hydranet_tpu.ops import resize as rz


def _normalize(img_f32):
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (img_f32 / 255.0 - mean) / std


def test_axis_taps_match_cv2_positions():
    # each output row's taps reproduce cv2's src coordinate convention
    for n_in, n_out in [(1080, 640), (27, 16), (720, 640), (1920, 640)]:
        w = rz._axis_taps(n_in, n_out)
        pin, pout = w.shape
        # partition of unity
        np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-6)
        # expanding one period reproduces the direct 2-tap formula
        for r in range(pout):
            f = (r + 0.5) * n_in / n_out - 0.5
            i0, frac = int(np.floor(f)), (r + 0.5) * pin / pout - 0.5
            frac -= np.floor(frac)
            nz = np.nonzero(w[:, r])[0]
            assert i0 % pin == nz[0]


def test_supports():
    assert rz.supports((1080, 1920), (640, 640))
    assert rz.supports((720, 1280), (640, 640))
    assert not rz.supports((480, 640), (640, 640))    # upscale
    assert not rz.supports((1079, 1920), (640, 640))  # huge row period
    assert rz.supports((216, 384), (128, 128))        # tiny test shape


def test_kernel_matches_cv2_interp():
    """Interpret-mode kernel vs cv2 INTER_LINEAR + normalize, exact taps."""
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (2, 216, 384, 3), np.uint8)
    got = np.asarray(rz.resize_normalize_u8(
        jnp.asarray(frames), (128, 128), out_dtype=jnp.float32,
        interpret=True))
    for i in range(2):
        want = _normalize(cv2.resize(
            frames[i], (128, 128),
            interpolation=cv2.INTER_LINEAR).astype(np.float32))
        # cv2 uses fixed-point taps (11-bit); float taps differ at rounding
        assert np.abs(got[i] - want).max() < 0.02


def test_kernel_matches_oracle_exactly():
    """Interpret-mode kernel vs the pure-XLA periodic oracle in f32."""
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.randint(0, 255, (2, 216, 384, 3), np.uint8))
    got = np.asarray(rz.resize_normalize_u8(frames, (128, 128),
                                            out_dtype=jnp.float32,
                                            interpret=True))
    want = np.asarray(rz.resize_normalize_reference(frames, (128, 128)))
    # bf16 tap matrices are exact; only accumulation order differs
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=0)


def test_preprocess_falls_back_off_tpu():
    """preprocess_images on the CPU test backend must not take the Pallas
    path (no TPU) and still produce the jax.image.resize result."""
    from hydranet_tpu.inference import preprocess_images

    rng = np.random.RandomState(2)
    frames = jnp.asarray(rng.randint(0, 255, (1, 216, 384, 3), np.uint8))
    out = np.asarray(preprocess_images(frames, (128, 128)))
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(out).all()
