"""Pallas 3x3 MXU conv kernel: numerics (interpret mode) and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.ops.pallas_conv import conv3x3_mxu, conv3x3_prepadded


def _lax(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,cout", [
    ((2, 18, 34, 128), 128),   # aligned everything
    ((1, 42, 42, 128), 64),    # odd padded width (forces wp rounding)
    ((1, 10, 18, 256), 128),
])
def test_interpret_matches_lax(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, shape[-1], cout).astype(np.float32))
    want = _lax(x, k)
    got = conv3x3_mxu(x, k, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fallback_for_unaligned_channels():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 12, 112).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 112, 64).astype(np.float32))
    got = conv3x3_mxu(x, k)  # cin=112 -> lax fallback on every backend
    np.testing.assert_allclose(np.asarray(got), np.asarray(_lax(x, k)),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_matches_lax_grads():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 10, 10, 128).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32))
    g1 = jax.grad(lambda x, k: jnp.sum(_lax(x, k) ** 2), (0, 1))(x, k)
    g2 = jax.grad(lambda x, k: jnp.sum(conv3x3_prepadded(x, k) ** 2),
                  (0, 1))(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)
