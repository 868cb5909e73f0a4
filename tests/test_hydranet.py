"""Full HydraNet assembly: shapes, jit, losses, gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.config import Config
from hydranet_tpu.models.hydranet import HydraNet


def small_config(**over) -> Config:
    d = {
        "tag": "test",
        "train": {"train_detect": True, "train_seg": True, "train_lane": True},
        "dataloader": {"network_input_width": 128,
                       "network_input_height": 128},
        "backbone": {"initial_width": 24, "slope": 36, "quantized_param": 2.5,
                     "network_depth": 8, "bottleneck_ratio": 1,
                     "group_width": 8, "stride": 2, "se_ratio": 4,
                     "fpn_num_filters": 16, "fpn_cell_repeats": 2,
                     # depth-8 RegNet stages: (24, 64, 152, 376) widths
                     "conv_channel_coef": [64, 152, 376]},
        "detection": {"num_classes": 4, "fpn_num_filters_detect": 16,
                      "box_class_repeats": 2, "pyramid_levels": 5,
                      "anchor_scale": 2.0, "pre_nms_top_k": 256,
                      "max_detections": 32,
                      "class_list": ["bg", "a", "b", "c", "d"]},
        "segment": {"class_list": ["bg", "road", "mark"],
                    "class_weight": [0.1, 1.0, 5.0],
                    "channel_dimension_seg_encode": [24, 16, 16, 16],
                    "channel_dimension_seg_decode": [8, 12, 16, 24],
                    "use_top_k": True, "top_k_ratio": 0.3},
        "lane": {"anchor_stride": 32, "interval": 8, "base_channel": 64,
                 "num_classes": 2},
    }
    d.update(over)
    return Config.from_dict(d)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = small_config()
    model = HydraNet(cfg=cfg)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return cfg, model, variables


def test_forward_shapes(model_and_vars):
    cfg, model, variables = model_and_vars
    x = jnp.asarray(np.random.randn(2, 128, 128, 3).astype(np.float32))
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)

    assert out["seg"].shape == (2, 128, 128, 3)
    a = out["detection"]["anchors"].shape[1]
    # anchors: (16^2 + 8^2 + 4^2 + 2^2 + 1^2) * 9
    assert a == (256 + 64 + 16 + 4 + 1) * 9
    assert out["detection"]["regression"].shape == (2, a, 4)
    assert out["detection"]["classification"].shape == (2, a, 4)
    n = (128 // 32) ** 2
    ppl = 128 // 8
    assert out["lane"]["predict_cls"].shape == (2, n, 2)
    assert out["lane"]["predict_loc"].shape == (2, n, 2 * ppl + 2)


def test_losses_and_grads(model_and_vars):
    cfg, model, variables = model_and_vars
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32))
    n = (128 // 32) ** 2
    ppl = 128 // 8
    batch = {
        "gt_seg": jnp.asarray(rng.randint(0, 3, (2, 128, 128))),
        "gt_det": jnp.asarray(np.array([
            [[10, 10, 50, 60, 1], [70, 70, 100, 110, 2]],
            [[-1, -1, -1, -1, -1], [-1, -1, -1, -1, -1]],
        ], dtype=np.float32)),
        "gt_cls": jnp.asarray(
            np.eye(2)[rng.randint(0, 2, (2, n))].astype(np.float32)),
        "gt_loc": jnp.asarray(
            rng.randn(2, n, 2 * ppl + 2).astype(np.float32)),
    }

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def loss_fn(params):
        out = model.apply({"params": params, **rest}, x, train=False)
        losses = model.compute_losses(out, batch)
        return model.total_loss(losses), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # at least one nonzero gradient per top module
    for mod in ["backbone", "neck", "segheader", "detectheader", "laneheader"]:
        leaves = jax.tree_util.tree_leaves(grads[mod])
        assert any(np.any(np.asarray(g) != 0) for g in leaves), mod


def test_remat_exactness(model_and_vars):
    """backbone.remat + segment.remat change activation memory only: the
    train-mode loss and every gradient must match the non-remat model
    (same params), and the variable trees must stay identical."""
    cfg, model, variables = model_and_vars
    cfg_r = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, remat=True),
        segment=dataclasses.replace(cfg.segment, remat=True))
    model_r = HydraNet(cfg=cfg_r)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32))
    n = (128 // 32) ** 2
    ppl = 128 // 8
    batch = {
        "gt_seg": jnp.asarray(rng.randint(0, 3, (2, 128, 128))),
        "gt_det": jnp.asarray(np.array([
            [[10, 10, 50, 60, 1], [70, 70, 100, 110, 2]],
            [[-1, -1, -1, -1, -1], [-1, -1, -1, -1, -1]],
        ], dtype=np.float32)),
        "gt_cls": jnp.asarray(
            np.eye(2)[rng.randint(0, 2, (2, n))].astype(np.float32)),
        "gt_loc": jnp.asarray(
            rng.randn(2, n, 2 * ppl + 2).astype(np.float32)),
    }

    # identical init structure (remat must not rename/move variables)
    vars_r = model_r.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 128, 128, 3), jnp.float32))
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vars_r))

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def make_loss(m):
        def loss_fn(p):
            out, _ = m.apply({"params": p, **rest}, x, train=True,
                             mutable=["batch_stats"])
            losses = m.compute_losses(out, batch)
            return m.total_loss(losses)
        return loss_fn

    t0, g0 = jax.jit(jax.value_and_grad(make_loss(model)))(params)
    t1, g1 = jax.jit(jax.value_and_grad(make_loss(model_r)))(params)
    np.testing.assert_allclose(float(t1), float(t0), rtol=1e-6)
    for (k0, a), (k1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert k0 == k1
        # recompute changes fusion/reassociation -> f32 LSB noise; a logic
        # bug (wrong cotangent) would differ by orders of magnitude
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k0))
