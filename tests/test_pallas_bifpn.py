"""Fused BiFPN cell kernel: variable-tree equivalence between the XLA and
kernel paths, and numeric parity of whole stacks (interpret mode on the
CPU test backend)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydranet_tpu.models.bifpn import StackBiFPN


CHANS = (8, 12, 16)
C = 16


def _backbone_feats(rng):
    return [jax.random.normal(jax.random.fold_in(rng, i), s, jnp.float32)
            for i, s in enumerate([(2, 16, 16, CHANS[0]),
                                   (2, 8, 8, CHANS[1]),
                                   (2, 4, 4, CHANS[2])])]


def _stack(repeats=2):
    return StackBiFPN(fpn_num_filters=C, fpn_cell_repeats=repeats,
                      conv_channel_coef=CHANS)


@pytest.fixture
def interp_env():
    os.environ["HN_PALLAS_NECK_INTERPRET"] = "1"
    yield
    os.environ.pop("HN_PALLAS_NECK_INTERPRET", None)


def test_variable_trees_identical(interp_env):
    """init through the kernel path (param mirrors) and through the XLA
    path must produce the same tree: same paths, shapes, and values."""
    rng = jax.random.PRNGKey(0)
    feats = _backbone_feats(rng)
    stack = _stack()

    v_fast = stack.init(rng, feats)                  # kernel path (interpret)
    os.environ["HN_NO_PALLAS_NECK"] = "1"
    try:
        v_slow = stack.init(rng, feats)              # XLA path
    finally:
        os.environ.pop("HN_NO_PALLAS_NECK", None)

    flat_f = jax.tree_util.tree_flatten_with_path(v_fast)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(v_slow)[0]
    paths_f = [jax.tree_util.keystr(p) for p, _ in flat_f]
    paths_s = [jax.tree_util.keystr(p) for p, _ in flat_s]
    assert paths_f == paths_s
    for (pf, lf), (_, ls) in zip(flat_f, flat_s):
        assert lf.shape == ls.shape, jax.tree_util.keystr(pf)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls), rtol=0,
                                   atol=0, err_msg=jax.tree_util.keystr(pf))


@pytest.mark.parametrize("repeats", [1, 2])
def test_fused_stack_matches_xla(interp_env, repeats):
    """Kernel stack output == XLA stack output (f32, same variables).
    Covers the first_time cell (down-channels + p4b/p5b laterals) and a
    repeat cell chained in the same kernel call."""
    rng = jax.random.PRNGKey(1)
    feats = _backbone_feats(rng)
    stack = _stack(repeats)
    variables = stack.init(rng, feats)

    fast = stack.apply(variables, feats)
    os.environ["HN_NO_PALLAS_NECK"] = "1"
    try:
        slow = stack.apply(variables, feats)
    finally:
        os.environ.pop("HN_NO_PALLAS_NECK", None)

    assert len(fast) == len(slow) == 5
    for i, (f, s) in enumerate(zip(fast, slow)):
        assert f.shape == s.shape, i
        np.testing.assert_allclose(np.asarray(f), np.asarray(s),
                                   rtol=2e-4, atol=2e-4, err_msg=f"level {i}")


def test_training_path_unchanged(interp_env):
    """train=True must never take the kernel path (batch-stat updates and
    autodiff stay in XLA)."""
    rng = jax.random.PRNGKey(2)
    feats = _backbone_feats(rng)
    stack = _stack(1)
    variables = stack.init(rng, feats)
    out, mut = stack.apply(variables, feats, train=True,
                           mutable=["batch_stats"])
    assert len(out) == 5
    assert "batch_stats" in mut
