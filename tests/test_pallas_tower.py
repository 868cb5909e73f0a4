"""Fused detection-tower kernel (ops/pallas_tower.py): variable-tree
equivalence between the XLA and kernel paths, numeric parity over all five
levels (interpret mode on the CPU test backend), and the gate fences."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydranet_tpu.heads.detection import DetectionHead


C = 16
RATIOS = ((1.0, 1.0), (1.4, 0.7))
SCALES = (1.0, 1.26)
IMAGE_HW = (128, 128)


def _feats(rng, b=2):
    return [jax.random.normal(jax.random.fold_in(rng, i),
                              (b, s, s, C), jnp.float32)
            for i, s in enumerate([16, 8, 4, 2, 1])]


def _head():
    return DetectionHead(num_classes=5, in_channels=C,
                         aspect_ratios=RATIOS, scales=SCALES,
                         box_class_repeats=2, pyramid_levels=5)


def _randomize(variables, rng):
    """Give every param/stat a nontrivial value so BN folding and biases
    are actually exercised (init leaves biases at 0 and BN at identity)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        key = jax.random.fold_in(rng, i)
        noise = 0.3 * jax.random.normal(key, leaf.shape, leaf.dtype)
        name = jax.tree_util.keystr(path)
        if name.endswith("'var']"):
            out.append(jnp.abs(leaf + noise) + 0.05)
        else:
            out.append(leaf + noise)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture
def interp_env():
    os.environ["HN_PALLAS_TOWER_INTERPRET"] = "1"
    yield
    os.environ.pop("HN_PALLAS_TOWER_INTERPRET", None)


def test_variable_trees_identical(interp_env):
    rng = jax.random.PRNGKey(0)
    feats = _feats(rng)
    head = _head()

    v_fast = head.init(rng, IMAGE_HW, feats)         # kernel path (interpret)
    os.environ["HN_NO_PALLAS_TOWER"] = "1"
    try:
        v_slow = head.init(rng, IMAGE_HW, feats)     # XLA path
    finally:
        os.environ.pop("HN_NO_PALLAS_TOWER", None)

    flat_f = jax.tree_util.tree_flatten_with_path(v_fast)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(v_slow)[0]
    paths_f = [jax.tree_util.keystr(p) for p, _ in flat_f]
    paths_s = [jax.tree_util.keystr(p) for p, _ in flat_s]
    assert paths_f == paths_s
    for (pf, lf), (_, ls) in zip(flat_f, flat_s):
        assert lf.shape == ls.shape, jax.tree_util.keystr(pf)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls), rtol=0,
                                   atol=0, err_msg=jax.tree_util.keystr(pf))


def test_fused_towers_match_xla(interp_env):
    """Kernel towers == XLA towers on all five levels (f32, same
    variables, randomized BN stats/biases). Covers the row-chunked
    pointwise path (16x16) and the ragged-width per-row path (2x2, 1x1)."""
    rng = jax.random.PRNGKey(1)
    feats = _feats(rng)
    head = _head()
    variables = _randomize(head.init(rng, IMAGE_HW, feats),
                           jax.random.PRNGKey(7))

    fast = head.apply(variables, IMAGE_HW, feats)
    os.environ["HN_NO_PALLAS_TOWER"] = "1"
    try:
        slow = head.apply(variables, IMAGE_HW, feats)
    finally:
        os.environ.pop("HN_NO_PALLAS_TOWER", None)

    for name, f, s in zip(("anchors", "regression", "classification"),
                          fast, slow):
        assert f.shape == s.shape, name
        np.testing.assert_allclose(np.asarray(f), np.asarray(s),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_training_path_unchanged(interp_env):
    """train=True must never take the kernel path (batch-stat updates and
    autodiff stay in XLA)."""
    rng = jax.random.PRNGKey(2)
    feats = _feats(rng)
    head = _head()
    variables = head.init(rng, IMAGE_HW, feats)
    out, mut = head.apply(variables, IMAGE_HW, feats, train=True,
                          mutable=["batch_stats"])
    assert len(out) == 3
    assert "batch_stats" in mut


def test_quant_mode_fences_kernel(interp_env):
    """int8 PTQ calibrates/rewires per FastConv module — the fused kernel
    must stand down whenever a quant mode is active."""
    from hydranet_tpu.ops import quantize as qz

    head = _head()
    feats = _feats(jax.random.PRNGKey(3))
    assert head._use_fused_towers(feats)
    with qz.quant_mode("calibrate"):
        assert not head._use_fused_towers(feats)
    with qz.quant_mode("int8"):
        assert not head._use_fused_towers(feats)


def test_tower_plus_neck_kernels_full_model():
    """The chain benches HN_PALLAS_TOWER=1 HN_PALLAS_NECK=1 together
    (adjacent kernels: the neck's outputs feed the towers). Full-model
    eval forward with BOTH kernels (interpret) must match the pure XLA
    composition on the same variables."""
    from tests.test_hydranet import small_config
    from hydranet_tpu.models.hydranet import HydraNet

    cfg = small_config()
    model = HydraNet(cfg=cfg)
    x = jnp.asarray(np.random.RandomState(5)
                    .randn(2, 128, 128, 3).astype(np.float32))
    for k in ("HN_PALLAS_TOWER_INTERPRET", "HN_PALLAS_NECK_INTERPRET"):
        os.environ[k] = "1"
    try:
        variables = model.init(jax.random.PRNGKey(3), x[:1])
        fast = model.apply(variables, x, train=False)
        os.environ["HN_NO_PALLAS_TOWER"] = "1"
        os.environ["HN_NO_PALLAS_NECK"] = "1"
        try:
            slow = model.apply(variables, x, train=False)
        finally:
            os.environ.pop("HN_NO_PALLAS_TOWER", None)
            os.environ.pop("HN_NO_PALLAS_NECK", None)
    finally:
        for k in ("HN_PALLAS_TOWER_INTERPRET", "HN_PALLAS_NECK_INTERPRET"):
            os.environ.pop(k, None)

    np.testing.assert_allclose(np.asarray(fast["seg"]),
                               np.asarray(slow["seg"]), rtol=2e-4, atol=2e-4)
    for name in ("regression", "classification"):
        np.testing.assert_allclose(np.asarray(fast["detection"][name]),
                                   np.asarray(slow["detection"][name]),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
    for name in ("predict_cls", "predict_loc"):
        np.testing.assert_allclose(np.asarray(fast["lane"][name]),
                                   np.asarray(slow["lane"][name]),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
