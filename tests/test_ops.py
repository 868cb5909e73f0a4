"""Op-level numerical parity against torch (reference net/common.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hydranet_tpu.ops import common as ops


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def test_swish_matches_torch():
    x = np.random.randn(2, 8, 8, 4).astype(np.float32)
    got = np.asarray(ops.swish(jnp.asarray(x)))
    want = (torch.from_numpy(x) * torch.sigmoid(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kernel,stride", [(1, 1), (3, 1), (3, 2)])
def test_same_pad_conv_matches_torch(kernel, stride):
    # reference common.py:35-73: k==1 -> no pad, else pad 1 each side
    x = np.random.randn(2, 3, 16, 16).astype(np.float32)
    w = np.random.randn(5, 3, kernel, kernel).astype(np.float32)
    b = np.random.randn(5).astype(np.float32)

    pad = 0 if kernel == 1 else 1
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), stride=stride, padding=pad).numpy()

    mod = ops.SamePadConv(features=5, kernel_size=kernel, stride=stride)
    params = {"params": {"conv": {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": jnp.asarray(b),
    }}}
    got = mod.apply(params, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-4)


def test_grouped_conv_matches_torch():
    x = np.random.randn(1, 8, 10, 10).astype(np.float32)
    w = np.random.randn(8, 2, 3, 3).astype(np.float32)  # groups=4
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), None,
                    stride=2, padding=1, groups=4).numpy()
    mod = ops.SamePadConv(features=8, kernel_size=3, stride=2, groups=4,
                          use_bias=False)
    params = {"params": {"conv": {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}}}
    got = mod.apply(params, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-4)


def test_max_pool_same_matches_torch():
    # reference common.py:117-152: F.pad [0,1,0,1] (zeros) + MaxPool2d(3, 2)
    x = np.random.randn(2, 4, 16, 16).astype(np.float32)
    xt = F.pad(torch.from_numpy(x), [0, 1, 0, 1])
    want = F.max_pool2d(xt, kernel_size=3, stride=2).numpy()
    got = ops.max_pool_same(jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), atol=0)


def test_max_pool_torch_matches_torch():
    # lane head fusion maxpool: nn.MaxPool2d(3, 2, padding=1) (-inf padding)
    x = np.random.randn(2, 4, 20, 20).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x), 3, 2, padding=1).numpy()
    got = ops.max_pool_torch(jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), atol=0)


def test_upsample_nearest_matches_torch():
    x = np.random.randn(2, 4, 5, 7).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="nearest").numpy()
    got = ops.upsample_nearest(jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), atol=0)


@pytest.mark.parametrize("train", [False, True])
def test_batchnorm_matches_torch(train):
    x = np.random.randn(4, 6, 6, 8).astype(np.float32)
    bn_t = torch.nn.BatchNorm2d(8, momentum=0.01, eps=1e-3)
    with torch.no_grad():
        bn_t.weight.copy_(torch.randn(8))
        bn_t.bias.copy_(torch.randn(8))
        bn_t.running_mean.copy_(torch.randn(8))
        bn_t.running_var.copy_(torch.rand(8) + 0.5)
    bn_t.train(train)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = _nhwc(bn_t(xt).detach().numpy())

    mod = ops.TorchBatchNorm(momentum=0.01, epsilon=1e-3)
    variables = {
        "params": {"bn": {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
                          "bias": jnp.asarray(bn_t.bias.detach().numpy())}},
        "batch_stats": {"bn": {
            "mean": jnp.asarray(bn_t.running_mean.detach().numpy()),
            "var": jnp.asarray(bn_t.running_var.detach().numpy())}},
    }
    got, _ = mod.apply(variables, jnp.asarray(x), train=train,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_separable_conv_block_parity():
    """Full SeparableConvBlock vs the reference torch module with identical
    weights (common.py:76-114)."""
    import tests.ref_compat as rc

    rc.install()
    from net.common import SeparableConvBlock as RefSep

    ref = RefSep(6, 10, norm=True, activation=True).eval()
    x = np.random.randn(2, 6, 12, 12).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(ref(torch.from_numpy(x)).numpy())

    mod = ops.SeparableConvBlock(features=10, norm=True, activation=True)
    sd = ref.state_dict()
    variables = {
        "params": {
            "depthwise_conv": {"conv": {"kernel": jnp.asarray(np.transpose(
                sd["depthwise_conv.conv.weight"].numpy(), (2, 3, 1, 0)))}},
            "pointwise_conv": {"conv": {
                "kernel": jnp.asarray(np.transpose(
                    sd["pointwise_conv.conv.weight"].numpy(), (2, 3, 1, 0))),
                "bias": jnp.asarray(sd["pointwise_conv.conv.bias"].numpy())}},
            "norm": {"bn": {"scale": jnp.asarray(sd["bn.weight"].numpy()),
                            "bias": jnp.asarray(sd["bn.bias"].numpy())}},
        },
        "batch_stats": {"norm": {"bn": {
            "mean": jnp.asarray(sd["bn.running_mean"].numpy()),
            "var": jnp.asarray(sd["bn.running_var"].numpy())}}},
    }
    got = mod.apply(variables, jnp.asarray(_nhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_topk_sum_bitsearch_exact():
    """Sort-free top-k sum == lax.top_k sum (values and gradients away
    from ties), incl. degenerate rows (all-equal, all-zero, k=1, k=N)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hydranet_tpu.heads.segmentation_loss import _topk_sum_bitsearch

    rng = np.random.RandomState(0)
    for b, n, k in [(3, 1000, 300), (2, 4096, 1), (2, 512, 512),
                    (1, 777, 333)]:
        x = jnp.asarray(np.abs(rng.randn(b, n)).astype(np.float32))
        want = jnp.sum(jax.lax.top_k(x, k)[0], axis=1)
        got = _topk_sum_bitsearch(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6)

    # ties: rows with repeated values still sum exactly
    x = jnp.asarray(np.repeat(rng.rand(2, 50).astype(np.float32), 10,
                              axis=1))
    k = 123
    want = jnp.sum(jax.lax.top_k(x, k)[0], axis=1)
    np.testing.assert_allclose(np.asarray(_topk_sum_bitsearch(x, k)),
                               np.asarray(want), rtol=2e-6)

    # all-zero rows
    z = jnp.zeros((2, 100), jnp.float32)
    np.testing.assert_allclose(np.asarray(_topk_sum_bitsearch(z, 30)), 0.0)

    # gradient: mean of top-k via bitsearch vs via top_k (no ties)
    x = jnp.asarray(np.abs(rng.randn(2, 500)).astype(np.float32) + 0.01)
    k = 100
    g1 = jax.grad(lambda v: jnp.mean(_topk_sum_bitsearch(v, k) / k))(x)
    g2 = jax.grad(lambda v: jnp.mean(jax.lax.top_k(v, k)[0]))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-7)
