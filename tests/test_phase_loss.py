"""Train-time phase CE (segment.phase_loss): the final seg stage emits
phase logits and the CE consumes exact per-phase slices. Pixel reductions
(mean, top-k threshold counts, focal) are permutation-invariant, so the
loss and every gradient must match the full-resolution formulation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydranet_tpu.heads.segmentation_loss import (
    cross_entropy_loss, cross_entropy_loss_phase_packed,
    cross_entropy_loss_phases)
from hydranet_tpu.models.hydranet import HydraNet
from hydranet_tpu.ops.fused_upsample_conv import (
    phase_slices, upsample2x_conv3x3_phase_logits,
    upsample2x_reflect_conv3x3)
from test_hydranet import small_config


def _interleave_pairs(z, gt, cout):
    return [(lg, gt[:, di::2, dj::2]) for (di, dj), lg
            in phase_slices(z, cout)]


@pytest.mark.parametrize("variant", ["plain", "topk", "focal", "ignore"])
def test_phase_ce_matches_full(variant):
    rng = np.random.RandomState(0)
    b, h, w, cin, cout = 3, 10, 12, 6, 4
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(0.3 * rng.randn(3, 3, cin, cout).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))
    gt = rng.randint(0, cout, (b, 2 * h, 2 * w))
    if variant == "ignore":
        gt[rng.rand(*gt.shape) < 0.2] = 255
    gt = jnp.asarray(gt)
    weights = [0.2, 1.0, 2.5, 0.7]
    kw = dict(use_top_k=variant == "topk", top_k_ratio=0.3,
              use_focal=variant == "focal")

    def full(k, x, bias):
        logits = upsample2x_reflect_conv3x3(x, k, bias)
        return cross_entropy_loss(logits, gt, weights, **kw)

    def phased(k, x, bias):
        z = upsample2x_conv3x3_phase_logits(x, k, bias)
        return cross_entropy_loss_phases(_interleave_pairs(z, gt, cout),
                                         weights, **kw)

    def packed(k, x, bias):
        z = upsample2x_conv3x3_phase_logits(x, k, bias)
        return cross_entropy_loss_phase_packed(z, gt, weights, **kw)

    lf, gf = jax.value_and_grad(full, argnums=(0, 1, 2))(k, x, bias)
    lp, gp = jax.value_and_grad(phased, argnums=(0, 1, 2))(k, x, bias)
    lq, gq = jax.value_and_grad(packed, argnums=(0, 1, 2))(k, x, bias)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lp),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lq),
                               rtol=1e-5, atol=1e-6)
    for a, b_, c_ in zip(gf, gp, gq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c_),
                                   rtol=1e-4, atol=1e-5)


def test_phase_ce_matches_full_dilated_batch():
    """bs >= 8 picks the dilated full-res formulation — the phase loss must
    still match (both are exact rewrites of the same function)."""
    rng = np.random.RandomState(1)
    b, h, w, cin, cout = 8, 6, 7, 5, 3
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(0.3 * rng.randn(3, 3, cin, cout).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, cout, (b, 2 * h, 2 * w)))
    weights = [0.2, 1.0, 2.5]

    lf = cross_entropy_loss(upsample2x_reflect_conv3x3(x, k, bias), gt,
                            weights, use_top_k=True, top_k_ratio=0.4)
    z = upsample2x_conv3x3_phase_logits(x, k, bias)
    lp = cross_entropy_loss_phases(_interleave_pairs(z, gt, cout), weights,
                                   use_top_k=True, top_k_ratio=0.4)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lp),
                               rtol=1e-5, atol=1e-6)


def test_model_phase_loss_exactness():
    """HydraNet with segment.phase_loss=True: identical variable tree, and
    train-mode loss + grads match the full-logits model (f32, CPU)."""
    cfg = small_config()
    cfg_p = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, phase_loss=True))
    model = HydraNet(cfg=cfg)
    model_p = HydraNet(cfg=cfg_p)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    vp = model_p.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vp))

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

    def make_loss(m):
        def loss_fn(p):
            out, _ = m.apply({"params": p, **rest}, x, train=True,
                             mutable=["batch_stats"])
            losses = m.compute_losses(out, batch)
            return m.total_loss(losses)
        return loss_fn

    lf, gf = jax.value_and_grad(make_loss(model))(params)
    lp, gp = jax.value_and_grad(make_loss(model_p))(params)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lp),
                               rtol=1e-5, atol=1e-6)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_p = jax.tree_util.tree_leaves(gp)
    for (path, a), b_ in zip(flat_f, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_model_phase_loss_with_remat():
    """phase_loss composes with segment.remat (the remat wrapper forwards
    emit_phase) — loss finite and phase output shape right."""
    cfg = small_config()
    cfg_pr = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, phase_loss=True,
                                         remat=True))
    model = HydraNet(cfg=cfg_pr)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "seg_phase" in out and "seg" not in out
    assert out["seg_phase"].shape == (2, 65, 65, 4 * 3)
    # eval forward still returns full-res logits under key "seg"
    out_eval = model.apply(variables, x, train=False)
    assert out_eval["seg"].shape == (2, 128, 128, 3)


@pytest.mark.slow
def test_trainer_epoch_with_phase_loss(tmp_path):
    """HydraTrainer end-to-end with segment.phase_loss: the train step
    consumes the phase output while validation still decodes full-res
    logits and computes mIoU."""
    from hydranet_tpu.config import Config
    from hydranet_tpu.train.trainer import HydraTrainer
    from tests.synth_data import make_dataset

    root = make_dataset(str(tmp_path / "data"), n_train=4, n_valid=2)
    d = small_config().to_dict()
    d["dataloader"]["data_list"] = f"{root}/list"
    d["dataloader"]["with_aug"] = False
    d["segment"]["phase_loss"] = True
    d["train"].update(dict(epoch=1, batch_size_train=2, batch_size_valid=2,
                           lr=1e-4, fine_tuning=False,
                           logs=str(tmp_path / "logs")))
    trainer = HydraTrainer(Config.from_dict(d), use_mesh=False)
    trainer.train_one_epoch(0)
    summary = trainer.valid(0)
    assert "mIoU" in summary and np.isfinite(summary["mIoU"])


@pytest.mark.parametrize("g", [3, 6])
@pytest.mark.parametrize("variant", ["plain", "topk", "focal", "ignore"])
def test_wpacked_ce_matches_full(variant, g):
    """W-packed phase CE == full-resolution CE (values AND grads), incl.
    ragged packed-tail columns (W+1 not divisible by g)."""
    from hydranet_tpu.heads.segmentation_loss import (
        cross_entropy_loss_wpacked)
    from hydranet_tpu.ops.fused_upsample_conv import (
        upsample2x_conv3x3_wpack_logits)

    rng = np.random.RandomState(4)
    b, h, w, cin, cout = 3, 9, 13, 6, 4  # W+1 = 14: ragged at g=3 and 6
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(0.3 * rng.randn(3, 3, cin, cout).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))
    gt = rng.randint(0, cout, (b, 2 * h, 2 * w))
    if variant == "ignore":
        gt[rng.rand(*gt.shape) < 0.2] = 255
    gt = jnp.asarray(gt)
    weights = [0.2, 1.0, 2.5, 0.7]
    kw = dict(use_top_k=variant == "topk", top_k_ratio=0.3,
              use_focal=variant == "focal")

    def full(k, x, bias):
        logits = upsample2x_reflect_conv3x3(x, k, bias)
        return cross_entropy_loss(logits, gt, weights, **kw)

    def wpacked(k, x, bias):
        yw, _ = upsample2x_conv3x3_wpack_logits(x, k, bias, g)
        return cross_entropy_loss_wpacked(yw, gt, weights, g, **kw)

    lf, gf = jax.value_and_grad(full, argnums=(0, 1, 2))(k, x, bias)
    lw, gw = jax.value_and_grad(wpacked, argnums=(0, 1, 2))(k, x, bias)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lw),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(gf, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_model_wpack_loss_exactness():
    """HydraNet with segment.wpack_loss=6: identical variable tree, and
    train-mode loss + grads match the full-logits model (f32, CPU)."""
    # top-k off for the grad comparison: the k-th-pixel threshold is a
    # DISCRETE boundary, and the stride-g conv's different (equally valid)
    # f32 accumulation order can flip which pixel sits at it — re-routing
    # a unit of gradient. The standalone test above covers top-k parity;
    # here we want a continuous loss so grads compare elementwise.
    cfg = small_config()
    cfg = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, use_top_k=False))
    cfg_w = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, wpack_loss=6))
    model = HydraNet(cfg=cfg)
    model_w = HydraNet(cfg=cfg_w)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    vw = model_w.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vw))

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

    def make_loss(m):
        def loss_fn(p):
            out, _ = m.apply({"params": p, **rest}, x, train=True,
                             mutable=["batch_stats"])
            losses = m.compute_losses(out, batch)
            return m.total_loss(losses)
        return loss_fn

    lf, gf = jax.value_and_grad(make_loss(model))(params)
    lw, gw = jax.value_and_grad(make_loss(model_w))(params)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lw),
                               rtol=1e-5, atol=1e-6)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_w = jax.tree_util.tree_leaves(gw)
    for (path, a), b_ in zip(flat_f, flat_w):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_model_wpack_loss_with_remat():
    """wpack_loss composes with segment.remat; eval forward unaffected."""
    cfg = small_config()
    cfg_wr = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, wpack_loss=6,
                                         remat=True))
    model = HydraNet(cfg=cfg_wr)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "seg_wpack" in out and "seg" not in out
    wg = -(-(64 + 1) // 6)
    assert out["seg_wpack"].shape == (2, 65, wg, 6 * 4 * 3)
    out_eval = model.apply(variables, x, train=False)
    assert out_eval["seg"].shape == (2, 128, 128, 3)
