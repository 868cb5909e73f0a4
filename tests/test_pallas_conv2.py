"""Fused pad+conv+bias+act Pallas kernel v2 (interpret mode) vs the XLA
composition — all pad modes, activations, boundary blocks, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.ops.pallas_conv2 import conv3x3_pad_act, _lax_reference


@pytest.mark.parametrize("pad_mode,act", [("reflect", "elu"),
                                          ("zero", None),
                                          ("reflect", None)])
def test_fused_conv_matches_reference(pad_mode, act):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 12, 128), jnp.float32) * 0.5
    k = jax.random.normal(rng, (3, 3, 128, 64), jnp.float32) * 0.05
    b = jax.random.normal(rng, (64,), jnp.float32) * 0.1
    got = conv3x3_pad_act(x, k, b, pad_mode=pad_mode, act=act,
                          interpret=True)
    want = _lax_reference(x, k, b, pad_mode, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_gradients():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 16, 8, 128), jnp.float32) * 0.5
    k = jax.random.normal(rng, (3, 3, 128, 32), jnp.float32) * 0.05
    b = jnp.zeros((32,))

    def loss_fused(x, k, b):
        return jnp.sum(conv3x3_pad_act(x, k, b, interpret=True) ** 2)

    def loss_ref(x, k, b):
        return jnp.sum(_lax_reference(x, k, b, "reflect", "elu") ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_fallback_for_unaligned_channels():
    # cin=112 not a lane multiple -> must fall back to the XLA path
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (1, 16, 8, 112), jnp.float32)
    k = jax.random.normal(rng, (3, 3, 112, 16), jnp.float32) * 0.05
    b = jnp.zeros((16,))
    got = conv3x3_pad_act(x, k, b, interpret=True)
    want = _lax_reference(x, k, b, "reflect", "elu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
