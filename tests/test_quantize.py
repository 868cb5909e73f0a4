"""Serving-path int8 PTQ (ops/quantize.py): op-level numerics, calibration
plumbing, and end-to-end pipeline agreement with the float path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.inference import InferencePipeline
from hydranet_tpu.models.hydranet import HydraNet
from hydranet_tpu.ops import quantize as qz
from tests.test_hydranet import small_config


def test_int8_conv_matches_float():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    k = jnp.asarray(0.1 * rng.randn(3, 3, 32, 24).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = qz.int8_conv(x, k, jnp.max(jnp.abs(x)), (1, 1), [(1, 1), (1, 1)],
                       jnp.float32)
    # int8 symmetric quantization: worst-case relative error per product is
    # ~1/127; conv sums average it out. Check tight agreement in aggregate.
    err = np.abs(np.asarray(got - want))
    ref = np.abs(np.asarray(want)).mean()
    assert err.mean() < 0.02 * ref
    assert np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(want).ravel())[0, 1] > 0.999


@pytest.mark.parametrize("batch", [2, 8])  # phase form vs dilated form
def test_int8_upconv_matches_float(batch):
    from hydranet_tpu.ops.fused_upsample_conv import (
        upsample2x_reflect_conv3x3, upsample2x_reflect_conv3x3_int8)

    rng = np.random.RandomState(batch)
    x = jnp.asarray(rng.randn(batch, 10, 12, 32).astype(np.float32))
    k = jnp.asarray(0.1 * rng.randn(3, 3, 32, 24).astype(np.float32))
    want = upsample2x_reflect_conv3x3(x, k)
    got = upsample2x_reflect_conv3x3_int8(x, k, jnp.max(jnp.abs(x)),
                                          jnp.float32)
    assert got.shape == want.shape
    err = np.abs(np.asarray(got - want))
    ref = np.abs(np.asarray(want)).mean()
    assert err.mean() < 0.02 * ref
    assert np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(want).ravel())[0, 1] > 0.999


def test_per_sample_absmax_and_percentile_reduction():
    """calibrate() sows per-sample absmax vectors; reduce_calibration at
    percentile 100 reproduces the exact absmax (the old scalar semantics),
    lower percentiles clip toward the bulk of the sample distribution."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 8, 8, 16).astype(np.float32))
    per = np.asarray(qz.per_sample_absmax(x))
    assert per.shape == (4,)
    np.testing.assert_allclose(
        per, np.abs(np.asarray(x)).max(axis=(1, 2, 3)), rtol=1e-6)

    # two "batches" of sown stats for one conv, one with a spike sample
    b1 = {"conv": {"absmax": np.array([1.0, 2.0, 3.0], np.float32)}}
    b2 = {"conv": {"absmax": np.array([2.5, 50.0, 1.5], np.float32)}}
    exact = qz.reduce_calibration([b1, b2], 100.0)
    assert np.asarray(exact["conv"]["absmax"]).shape == ()
    assert float(exact["conv"]["absmax"]) == 50.0
    clipped = qz.reduce_calibration([b1, b2], 80.0)
    assert 3.0 <= float(clipped["conv"]["absmax"]) < 50.0
    # scalar leaves (older collections) still reduce
    legacy = qz.reduce_calibration(
        [{"c": {"absmax": np.float32(1.0)}},
         {"c": {"absmax": np.float32(4.0)}}], 100.0)
    assert float(legacy["c"]["absmax"]) == 4.0


def test_eligibility_rules():
    assert qz.conv_eligible(("backbone", "s1", "conv"), 64, 1)
    assert not qz.conv_eligible(("x", "conv"), 64, 64)        # depthwise
    assert not qz.conv_eligible(("stem", "conv"), 3, 1)       # tiny cin
    assert not qz.conv_eligible(("regressor", "header", "pw"), 64, 1)
    assert not qz.conv_eligible(("lane", "cls_conv2"), 448, 1)


@pytest.fixture(scope="module")
def float_and_int8_pipes():
    cfg = small_config()
    model = HydraNet(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)))
    fp = InferencePipeline(cfg, variables, batch_size=2,
                           input_hw=(128, 128), compute_dtype=jnp.float32)
    rng = np.random.RandomState(7)
    calib = [rng.randint(0, 255, (2, 128, 128, 3), np.uint8)
             for _ in range(2)]
    act_stats = fp.calibrate(calib)
    qp = InferencePipeline(cfg, fp.variables, batch_size=2,
                           input_hw=(128, 128), compute_dtype=jnp.float32,
                           quant="int8")
    return fp, qp, act_stats


def test_calibration_covers_eligible_convs(float_and_int8_pipes):
    _, _, act_stats = float_and_int8_pipes
    leaves = jax.tree_util.tree_leaves(act_stats)
    assert len(leaves) >= 10  # backbone + neck + heads all contribute
    for v in leaves:
        assert np.isfinite(v) and v > 0


def test_int8_pipeline_agrees_with_float(float_and_int8_pipes):
    fp, qp, _ = float_and_int8_pipes
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (2, 128, 128, 3), np.uint8)
    want, got = fp(frames), qp(frames)
    # seg: class-id agreement on the vast majority of pixels
    agree = (np.asarray(want["seg"]) == np.asarray(got["seg"])).mean()
    assert agree > 0.9, agree
    # lane existence logits route through quantized towers: finite output
    assert np.isfinite(np.asarray(got["lanes"].xs)).all()
    # detections remain finite and within the frame
    boxes = np.asarray(got["detections"].boxes)
    assert np.isfinite(boxes).all()


def test_mesh_sharded_int8_inference(float_and_int8_pipes):
    """The quantized pipeline partitions over the 8-device mesh: act_stats
    replicate with the weights and the s8xs8->s32 convs shard on batch."""
    from hydranet_tpu.parallel.mesh import make_mesh

    fp, qp, _ = float_and_int8_pipes
    mesh = make_mesh()
    p8 = InferencePipeline(fp.cfg, qp.variables, batch_size=8,
                           input_hw=(128, 128), compute_dtype=jnp.float32,
                           mesh=mesh, quant="int8")
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 255, (8, 128, 128, 3), np.uint8)
    sharded = p8(frames)
    want = qp(frames[:2])
    np.testing.assert_array_equal(np.asarray(sharded["seg"][:2]),
                                  np.asarray(want["seg"]))


def test_int8_export_reload_roundtrip(tmp_path, float_and_int8_pipes):
    """The quantized pipeline exports to StableHLO (int8 convs inline) and
    reloads bit-identically — the C++ PJRT deploy path consumes the same
    artifact format."""
    import os

    from hydranet_tpu.inference import load_stablehlo

    _, qp, _ = float_and_int8_pipes
    path = os.path.join(str(tmp_path), "pipe_int8.stablehlo")
    qp.export_stablehlo(path)
    call = load_stablehlo(path)
    rng = np.random.RandomState(11)
    frames = jnp.asarray(rng.randint(0, 255, (2, 128, 128, 3), np.uint8))
    want = qp(frames)
    got = call(qp.variables, frames)
    np.testing.assert_array_equal(np.asarray(got["seg"]),
                                  np.asarray(want["seg"]))


def test_int8_without_calibration_raises():
    cfg = small_config()
    model = HydraNet(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)))
    qp = InferencePipeline(cfg, variables, batch_size=1,
                           input_hw=(128, 128), compute_dtype=jnp.float32,
                           quant="int8")
    with pytest.raises(RuntimeError, match="calibrat"):
        qp(np.zeros((1, 128, 128, 3), np.uint8))
