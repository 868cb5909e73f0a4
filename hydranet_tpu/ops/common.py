"""NN primitive ops (TPU-native equivalents of /root/reference/model/net/common.py).

Everything operates on NHWC tensors (TPU's preferred conv layout; the reference
is NCHW torch). Numerical semantics are kept bit-compatible with the reference
so golden-parity tests against the torch implementation pass:

- "static same padding" conv: k==1 -> no pad, else pad 1 on every side
  (common.py:60, the reference hard-codes this instead of true SAME).
- "static same padding" max pool (3x3/s2): zero-pad (left=0, right=1, top=0,
  bottom=1) then VALID pool — the zeros participate in the max, matching
  torch F.pad + MaxPool2d (common.py:138-152).
- BatchNorm: torch momentum m means running <- (1-m)*running + m*batch, i.e.
  flax momentum = 1 - torch momentum. The backbone uses torch defaults
  (m=0.1, eps=1e-5, anynet.py:13) while neck/heads use m=0.01, eps=1e-3
  (common.py:98).
- swish = x * sigmoid(x) (common.py:30-32). The reference's
  MemoryEfficientSwish is an autograd-memory trick only; XLA rematerialization
  makes it moot on TPU, and the VJP is identical.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) — reference common.py:30-32."""
    return x * jax.nn.sigmoid(x)


def conv_kaiming_init(dtype=jnp.float32):
    """Kaiming-style fan_out normal init matching anynet.py:124-128:
    std = sqrt(2 / (kh * kw * out_channels)). Kernel layout HWIO."""

    def init(key, shape, dtype=dtype):
        kh, kw, _, out_ch = shape
        std = math.sqrt(2.0 / (kh * kw * out_ch))
        return std * jax.random.normal(key, shape, dtype)

    return init


class TorchBatchNorm(nn.Module):
    """BatchNorm over NHWC with torch-style momentum semantics.

    torch: running = (1 - m) * running + m * batch  (m = `momentum` here)
    flax:  running = d * running + (1 - d) * batch  (d = flax momentum)
    so we pass d = 1 - m. Normalization uses biased batch variance in train
    mode, matching torch. (torch updates running_var with the unbiased
    estimate; we follow flax's biased update — running-stat drift only, the
    normalized outputs are identical given identical running stats.)
    """

    momentum: float = 0.1  # torch-style
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )
        y = bn(x)
        if train and self.is_mutable_collection("bn_stats"):
            # Precise-BN support: expose the PURE batch statistics (f32,
            # momentum-free) so population stats can be re-estimated over K
            # batches before eval — see parallel/train_step.py
            # precise_bn_stats. Needed because torch momentum 0.01 (neck /
            # det head) takes ~500 optimizer steps to converge; short runs
            # evaluate with running stats still near their init otherwise.
            xf = jnp.asarray(x, jnp.float32)
            axes = tuple(range(x.ndim - 1))
            keep = lambda _, v: v  # noqa: E731 — overwrite, don't append
            self.sow("bn_stats", "mean", jnp.mean(xf, axis=axes),
                     reduce_fn=keep, init_fn=tuple)
            self.sow("bn_stats", "meansq", jnp.mean(jnp.square(xf), axis=axes),
                     reduce_fn=keep, init_fn=tuple)
        return y


class SamePadConv(nn.Module):
    """Conv2d with the reference's "static same padding" (common.py:35-73):
    kernel 1 -> no padding; otherwise pad 1 on all four sides. Supports
    grouped (depthwise) convolution via `groups`.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        from hydranet_tpu.ops.fast_conv import FastConv

        pad = 0 if self.kernel_size == 1 else 1
        conv = FastConv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=conv_kaiming_init(),
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )
        return conv(x)


class SeparableConvBlock(nn.Module):
    """Depthwise 3x3 (no bias) + pointwise 1x1 (bias), optional BN
    (m=0.01/eps=1e-3) + swish — reference common.py:76-114."""

    features: int
    norm: bool = True
    activation: bool = False
    dtype: Optional[jnp.dtype] = None
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = SamePadConv(features=in_ch, kernel_size=3, stride=1, groups=in_ch,
                        use_bias=False, dtype=self.dtype, name="depthwise_conv")(x)
        x = SamePadConv(features=self.features, kernel_size=1, stride=1,
                        use_bias=True, dtype=self.dtype,
                        bias_init=self.bias_init, name="pointwise_conv")(x)
        if self.norm:
            x = TorchBatchNorm(momentum=0.01, epsilon=1e-3, dtype=self.dtype,
                               name="norm")(x, train=train)
        if self.activation:
            x = swish(x)
        return x


class ConvParams(nn.Module):
    """Param mirror of SamePadConv->FastConv: declares kernel/bias under
    <name>/conv/* with identical shapes and inits, computing nothing. Lets
    fused Pallas kernels (ops/pallas_bifpn.py, ops/pallas_tower.py) read the
    same checkpoint tree the XLA path trains (init trees of both paths are
    asserted identical in their tests)."""

    features: int
    kernel_size: int = 3
    groups: int = 1
    use_bias: bool = True
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, in_ch: int):
        class _Leaf(nn.Module):
            features: int
            shape: Tuple[int, ...]
            use_bias: bool
            bias_init: Any

            @nn.compact
            def __call__(self):
                k = self.param("kernel", conv_kaiming_init(), self.shape)
                b = self.param("bias", self.bias_init,
                               (self.features,)) if self.use_bias else None
                return k, b

        ks = self.kernel_size
        return _Leaf(self.features,
                     (ks, ks, in_ch // self.groups, self.features),
                     self.use_bias, self.bias_init, name="conv")()


class BNParams(nn.Module):
    """Param mirror of TorchBatchNorm (<name>/bn/{scale,bias} params +
    batch_stats {mean,var})."""

    @nn.compact
    def __call__(self, c: int):
        class _Leaf(nn.Module):
            c: int

            @nn.compact
            def __call__(self):
                scale = self.param("scale", nn.initializers.ones, (self.c,))
                bias = self.param("bias", nn.initializers.zeros, (self.c,))
                mean = self.variable(
                    "batch_stats", "mean",
                    lambda: jnp.zeros((self.c,), jnp.float32)).value
                var = self.variable(
                    "batch_stats", "var",
                    lambda: jnp.ones((self.c,), jnp.float32)).value
                return scale, bias, mean, var

        return _Leaf(c, name="bn")()


def max_pool_same(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2dStaticSamePadding(3, 2): zero-pad (l=0, r=1, t=0, b=1) then
    3x3/s2 VALID pool — reference common.py:117-152. Zero padding (not -inf)
    participates in the max, matching torch F.pad + MaxPool2d."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding="VALID")


def max_pool_torch(x: jnp.ndarray, kernel: int = 3, stride: int = 2,
                   padding: int = 1) -> jnp.ndarray:
    """torch nn.MaxPool2d(kernel, stride, padding): implicit -inf padding
    (used by the lane head's fusion maxpool — lanedetect.py:41)."""
    return nn.max_pool(
        x,
        window_shape=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour x`factor` upsample (reference F.interpolate
    mode='nearest', segmentation.py:10-13). For integer factors this is an
    exact repeat, which XLA lowers to a cheap broadcast-reshape."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x
