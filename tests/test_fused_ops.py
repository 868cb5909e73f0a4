"""Fused upsample+reflect-pad+conv identity vs the naive composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.ops.common import upsample_nearest
from hydranet_tpu.ops.fused_upsample_conv import upsample2x_reflect_conv3x3


def _naive(x, kernel, bias=None):
    up = upsample_nearest(x)
    up = jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        up, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y if bias is None else y + bias


@pytest.mark.parametrize("shape,cout", [((2, 8, 8, 4), 6), ((1, 5, 7, 3), 2),
                                        ((1, 16, 16, 8), 8)])
def test_fused_matches_naive(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, shape[-1], cout).astype(np.float32))
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    want = _naive(x, k, b)
    got = upsample2x_reflect_conv3x3(x, k, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))

    g1 = jax.grad(lambda x, k: jnp.sum(_naive(x, k) ** 2), argnums=(0, 1))(x, k)
    g2 = jax.grad(lambda x, k: jnp.sum(
        upsample2x_reflect_conv3x3(x, k) ** 2), argnums=(0, 1))(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_upconv_forms_agree():
    """Both upconv formulations (dilated for B>=8, phase+interleave for
    small B) are exact vs each other and vs the naive composition."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hydranet_tpu.ops.fused_upsample_conv import (_dilated_form,
                                                      _phase_form,
                                                      upsample2x_reflect_conv3x3)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (9, 6, 5, 16), jnp.float32)
    k = jax.random.normal(rng, (3, 3, 16, 8), jnp.float32) * 0.1
    a = np.asarray(_dilated_form(x, k))
    b = np.asarray(_phase_form(x, k))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # dispatcher picks dilated at B=9 and phase at B=2; both match
    np.testing.assert_allclose(np.asarray(upsample2x_reflect_conv3x3(x, k)),
                               a, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(upsample2x_reflect_conv3x3(x[:2], k)), a[:2],
        rtol=1e-5, atol=1e-5)


def test_zsplit_train_form_gradients():
    """The tiny-Cout z-split branch (B>=8, cout<=8) must match the naive
    composition in value AND gradients (it is the train-path final stage)."""
    import jax

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 6, 7, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 16, 5).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(5).astype(np.float32))

    def loss(fn):
        return lambda x, k: jnp.sum(fn(x, k, b) ** 2)

    want = _naive(x, k, b)
    got = upsample2x_reflect_conv3x3(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    gx_w, gk_w = jax.grad(loss(_naive), argnums=(0, 1))(x, k)
    gx_g, gk_g = jax.grad(loss(upsample2x_reflect_conv3x3),
                          argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_w),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_g), np.asarray(gk_w),
                               rtol=1e-3, atol=1e-3)


def test_pallas_seg_final_matches_zsplit():
    """The VMEM-resident z-split kernel (interpret mode) is bit-identical
    to the XLA z-split phase logits."""
    from hydranet_tpu.ops.fused_upsample_conv import _phase_logits_zsplit
    from hydranet_tpu.ops.pallas_seg_final import phase_logits_pallas

    rng = np.random.RandomState(9)
    for h, w in [(20, 16), (12, 24)]:
        x = jnp.asarray(rng.randn(2, h, w, 64).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 64, 5).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(5).astype(np.float32) * 0.1)
        want = np.asarray(_phase_logits_zsplit(x, k, b))
        for halo in ("element", "dma"):
            for unroll in (False, True):
                got = np.asarray(phase_logits_pallas(
                    x, k, b, interpret=True, halo=halo, unroll=unroll))
                np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                           err_msg=f"{halo} unroll={unroll}")


def test_wpack_argmax_matches_reference():
    """The W-packed strided-conv argmax (final-stage lane-padding fix) is an
    exact reformulation: stride-(1,g) conv with the phase kernels embedded
    at per-group column offsets (zero taps elsewhere) computes the same
    products, so the class ids match the full-res composition exactly."""
    from hydranet_tpu.ops.fused_upsample_conv import (
        _wpack_argmax, upsample2x_reflect_conv3x3)

    rng = np.random.RandomState(3)
    for (h, w, cin, cout, g) in [(10, 12, 6, 4, 3), (9, 11, 5, 3, 4),
                                 (16, 20, 8, 5, 6), (20, 20, 16, 5, 7)]:
        x = jnp.asarray(rng.randn(9, h, w, cin).astype(np.float32))
        k = jnp.asarray(0.3 * rng.randn(3, 3, cin, cout).astype(np.float32))
        b = jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))
        ref = np.argmax(np.asarray(upsample2x_reflect_conv3x3(x, k, b)), -1)
        got = np.asarray(_wpack_argmax(x, k, b, g=g))
        assert got.shape == (9, 2 * h, 2 * w)
        np.testing.assert_array_equal(got, ref, err_msg=f"g={g}")


def test_phase_tail_argmax_matches_reference():
    """The fused two-stage phase tail (up conv + ELU + final conv + argmax
    computed entirely in phase space) returns exactly the ids of the
    composed reference path, including every border row/col (the edge
    taps collapse onto the same clamped rows — see _phase2_kernel)."""
    from hydranet_tpu.ops.fused_upsample_conv import (
        upsample2x_reflect_conv3x3, upsample4x_phase_tail_argmax)

    rng = np.random.RandomState(7)
    for (h, w, cin, cmid, cout) in [(10, 12, 6, 8, 4), (9, 11, 5, 7, 3),
                                    (16, 20, 8, 16, 5), (3, 3, 4, 4, 5)]:
        x = jnp.asarray(rng.randn(5, h, w, cin).astype(np.float32))
        ku = jnp.asarray(0.3 * rng.randn(3, 3, cin, cmid).astype(np.float32))
        bu = jnp.asarray(0.1 * rng.randn(cmid).astype(np.float32))
        kf = jnp.asarray(0.3 * rng.randn(3, 3, cmid, cout).astype(np.float32))
        bf = jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))
        x2 = jax.nn.elu(upsample2x_reflect_conv3x3(x, ku, bu))
        ref = np.argmax(np.asarray(upsample2x_reflect_conv3x3(x2, kf, bf)),
                        -1)
        got = np.asarray(upsample4x_phase_tail_argmax(x, ku, bu, kf, bf))
        assert got.shape == (5, 4 * h, 4 * w)
        np.testing.assert_array_equal(got, ref)


def test_segment_head_phase_tail_knob(monkeypatch):
    """Phase tail (default ON at batch >= 8): same param tree, same class
    ids as the modular HN_SEG_PHASE_TAIL=0 path."""
    from hydranet_tpu.heads.segmentation import SegmentHead

    rng = np.random.RandomState(1)
    enc, dec = (24, 16, 16, 16), (8, 12, 16, 24)
    feats = [jnp.asarray(rng.randn(8, s, s, c).astype(np.float32))
             for s, c in zip((32, 16, 8, 4), enc)]
    seg = SegmentHead(num_ch_enc=enc, num_ch_dec=dec, num_output_channels=5)
    monkeypatch.setenv("HN_SEG_PHASE_TAIL", "0")
    v = seg.init(jax.random.PRNGKey(0), feats, emit_argmax=True)
    ref = np.asarray(seg.apply(v, feats, emit_argmax=True))
    monkeypatch.setenv("HN_SEG_PHASE_TAIL", "1")
    v2 = seg.init(jax.random.PRNGKey(0), feats, emit_argmax=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    got = np.asarray(seg.apply(v, feats, emit_argmax=True))
    np.testing.assert_array_equal(got, ref)
