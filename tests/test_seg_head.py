"""Segmentation head + losses: golden parity vs reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import tests.ref_compat as rc
from hydranet_tpu.heads.segmentation import SegmentHead
from hydranet_tpu.heads.segmentation_loss import cross_entropy_loss, lovasz_softmax
from hydranet_tpu.utils.torch_import import import_state_dict


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def test_seg_head_parity():
    rc.install()
    from head_seg.segmentation import SegmentHeader as RefSeg

    num_ch_enc = [8, 16, 16, 16]
    num_ch_dec = [8, 12, 16, 24]
    ref = RefSeg(num_ch_enc=num_ch_enc, num_ch_dec=num_ch_dec,
                 num_output_channels=5).eval()

    feats = [np.random.randn(1, c, s, s).astype(np.float32)
             for c, s in zip(num_ch_enc, [32, 16, 8, 4])]
    with torch.no_grad():
        want = ref([torch.from_numpy(f) for f in feats]).numpy()

    model = SegmentHead(num_ch_enc=tuple(num_ch_enc),
                        num_ch_dec=tuple(num_ch_dec), num_output_channels=5)
    inputs = [jnp.asarray(_nhwc(f)) for f in feats]
    variables = model.init(jax.random.PRNGKey(0), inputs)
    variables = import_state_dict(variables, ref.state_dict())
    got = model.apply(variables, inputs)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("use_top_k,use_focal", [(False, False), (True, False),
                                                 (False, True)])
def test_cross_entropy_loss_parity(use_top_k, use_focal):
    rc.install()

    b, c, h, w = 2, 5, 16, 16
    logits = np.random.randn(b, c, h, w).astype(np.float32)
    target = np.random.randint(0, c, size=(b, h, w))
    weights = np.array([0.1, 0.5, 1.0, 5.0, 5.0], dtype=np.float32)

    # Reference CrossEntropyLoss hard-codes .cuda() on the focal path
    # (segmentation_loss.py:35); replicate its math directly in torch.
    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(target).long()
    wt = torch.from_numpy(weights)
    if use_focal:
        eps = 1e-8
        p = F.softmax(lt, dim=1) + eps
        one_hot = torch.zeros_like(lt).scatter_(1, tt.unsqueeze(1), 1.0) + eps
        fw = torch.pow(1.0 - p, 2.0)
        ws = wt.unsqueeze(0).unsqueeze(-1).unsqueeze(-1)
        focal = -1.0 * fw * torch.log(p) * ws
        want = torch.sum(one_hot * focal, dim=1).view(b, -1).mean().item()
    else:
        loss = F.cross_entropy(lt, tt, ignore_index=255, reduction="none",
                               weight=wt).view(b, -1)
        if use_top_k:
            k = int(0.3 * loss.shape[1])
            loss, _ = torch.sort(loss, dim=1, descending=True)
            loss = loss[:, :k]
        want = loss.mean().item()

    got = cross_entropy_loss(
        jnp.asarray(_nhwc(logits)), jnp.asarray(target), weights,
        use_top_k=use_top_k, top_k_ratio=0.3, use_focal=use_focal)
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-5)


def test_lovasz_softmax_parity():
    rc.install()
    from head_seg.loss_lovasz import lovasz_softmax as ref_lovasz

    b, c, h, w = 2, 5, 16, 16
    logits = np.random.randn(b, c, h, w).astype(np.float32)
    target = np.random.randint(0, c, size=(b, h, w))
    target[0, :4, :4] = 255  # exercise the ignore path

    lt = torch.from_numpy(logits)
    want = ref_lovasz(F.softmax(lt, dim=1), torch.from_numpy(target).long(),
                      ignore=255).item()
    probs = jax.nn.softmax(jnp.asarray(_nhwc(logits)), axis=-1)
    got = lovasz_softmax(probs, jnp.asarray(target), ignore=255)
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("per_image", [True, False])
@pytest.mark.parametrize("ignore", [None, 255])
def test_lovasz_hinge_parity(per_image, ignore):
    rc.install()
    from head_seg.loss_lovasz import lovasz_hinge as ref_hinge

    b, h, w = 3, 12, 16
    rng = np.random.RandomState(7)
    logits = rng.randn(b, h, w).astype(np.float32) * 2.0
    labels = rng.randint(0, 2, size=(b, h, w))
    if ignore is not None:
        labels[1, :5, :5] = ignore
    want = ref_hinge(torch.from_numpy(logits), torch.from_numpy(labels),
                     per_image=per_image, ignore=ignore).item()
    from hydranet_tpu.heads.segmentation_loss import lovasz_hinge

    got = lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels),
                       per_image=per_image, ignore=ignore)
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-5)


def test_binary_xloss_parity():
    rc.install()
    from head_seg.loss_lovasz import binary_xloss as ref_xloss

    b, h, w = 2, 10, 14
    rng = np.random.RandomState(11)
    logits = rng.randn(b, h, w).astype(np.float32) * 3.0
    labels = rng.randint(0, 2, size=(b, h, w))
    labels[0, :3, :] = 255
    want = ref_xloss(torch.from_numpy(logits), torch.from_numpy(labels),
                     ignore=255).item()
    from hydranet_tpu.heads.segmentation_loss import binary_xloss

    got = binary_xloss(jnp.asarray(logits), jnp.asarray(labels), ignore=255)
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-5)


def test_emit_argmax_matches_logits_argmax():
    """Inference decode mode (conv+argmax fused at low res, int8 interleave)
    vs argmax of the logits path — identical class maps away from exact
    score ties."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hydranet_tpu.heads.segmentation import SegmentHead

    rng = jax.random.PRNGKey(3)
    head = SegmentHead(num_ch_enc=(8, 16, 16, 16), num_ch_dec=(4, 6, 8, 12),
                       num_output_channels=3)
    feats = [jax.random.normal(jax.random.fold_in(rng, i), s)
             for i, s in enumerate([(2, 32, 32, 8), (2, 16, 16, 16),
                                    (2, 8, 8, 16), (2, 4, 4, 16)])]
    variables = head.init(rng, feats)

    logits = head.apply(variables, feats)
    a_ref = np.asarray(jnp.argmax(logits, axis=-1))
    a_fused = np.asarray(head.apply(variables, feats, emit_argmax=True))
    assert a_fused.shape == a_ref.shape
    assert a_fused.dtype == np.int32
    # mask near-ties (phase kernels pre-sum taps in a different order)
    top2 = np.sort(np.asarray(logits), axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    decided = margin > 1e-4
    assert np.all(a_fused[decided] == a_ref[decided])
    assert decided.mean() > 0.99


def test_lovasz_binned_exact_on_grid():
    """When every error sits exactly on a distinct bin's grid point, the
    binned form IS the exact Lovász (tied errors contribute identically
    under any permutation), so the two must agree to float tolerance."""
    from hydranet_tpu.heads.segmentation_loss import lovasz_softmax_binned

    bins = 256
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 8, 8, 3
    target = rng.randint(0, c, size=(b, h, w))
    # p[.., ci] drawn from bin centers k/bins + 0.5/bins so err = |fg - p|
    # lands strictly inside one bucket per distinct value
    grid = (rng.randint(0, bins, size=(b, h, w, c)) + 0.5) / bins
    probas = jnp.asarray(grid.astype(np.float32))
    exact = lovasz_softmax(probas, jnp.asarray(target), ignore=255)
    binned = lovasz_softmax_binned(probas, jnp.asarray(target), ignore=255,
                                   bins=bins)
    np.testing.assert_allclose(float(binned), float(exact),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("with_ignore", [False, True])
def test_lovasz_binned_converges(with_ignore):
    """O(1/bins) error vs the exact sort-based loss; monotone improvement
    with more bins on random inputs (incl. ignore pixels + absent class)."""
    from hydranet_tpu.heads.segmentation_loss import lovasz_softmax_binned

    rng = np.random.RandomState(7)
    b, h, w, c = 2, 16, 16, 5
    logits = rng.randn(b, h, w, c).astype(np.float32)
    target = rng.randint(0, c - 1, size=(b, h, w))  # class c-1 absent
    if with_ignore:
        target[0, :6, :6] = 255
    probas = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    exact = float(lovasz_softmax(probas, jnp.asarray(target), ignore=255))

    errs = {}
    for bins in (64, 1024, 4096):
        got = float(lovasz_softmax_binned(probas, jnp.asarray(target),
                                          ignore=255, bins=bins))
        errs[bins] = abs(got - exact)
        # total variation of the Jaccard curve is <= 2
        assert errs[bins] <= 4.0 / bins + 1e-5, (bins, got, exact)
    assert errs[4096] <= errs[64] + 1e-6


def test_lovasz_binned_gradient_matches_exact():
    """The binned gradient converges to the exact Lovász gradient (cosine
    similarity) — bucket weights approximate the per-rank Jaccard diffs."""
    from hydranet_tpu.heads.segmentation_loss import lovasz_softmax_binned

    rng = np.random.RandomState(3)
    b, h, w, c = 1, 12, 12, 4
    logits = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    target = jnp.asarray(rng.randint(0, c, size=(b, h, w)))

    def exact_fn(lg):
        return lovasz_softmax(jax.nn.softmax(lg, axis=-1), target,
                              ignore=255)

    def binned_fn(lg):
        return lovasz_softmax_binned(jax.nn.softmax(lg, axis=-1), target,
                                     ignore=255, bins=4096)

    g_exact = np.asarray(jax.grad(exact_fn)(logits)).ravel()
    g_binned = np.asarray(jax.grad(binned_fn)(logits)).ravel()
    assert np.all(np.isfinite(g_binned))
    assert np.linalg.norm(g_exact) > 0
    cos = (g_exact @ g_binned /
           (np.linalg.norm(g_exact) * np.linalg.norm(g_binned)))
    assert cos > 0.98, cos


def test_lovasz_binned_jits_fixed_shape():
    """The binned form traces into one fixed-shape XLA program (no sort,
    no data-dependent shapes) and is usable under jit + grad."""
    from hydranet_tpu.heads.segmentation_loss import lovasz_softmax_binned

    rng = np.random.RandomState(5)
    probas = jax.nn.softmax(
        jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32)), axis=-1)
    target = jnp.asarray(rng.randint(0, 3, size=(2, 8, 8)))
    fn = jax.jit(lambda p: lovasz_softmax_binned(p, target, bins=256))
    v1 = float(fn(probas))
    v2 = float(fn(probas))
    assert np.isfinite(v1) and v1 == v2
