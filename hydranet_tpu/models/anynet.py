"""AnyNetX backbone family (TPU-native equivalent of
/root/reference/model/net/anynet.py — "Designing Network Design Spaces", FAIR).

Stem (3->32, s2) + N stages of residual X-blocks:
1x1 conv -> 3x3 grouped conv (stride) -> optional SE -> 1x1 conv, with a
1x1-strided BN shortcut when shape changes (anynet.py:23-76). Returns the
per-stage feature list (anynet.py:136-145). NHWC throughout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hydranet_tpu.ops.common import TorchBatchNorm, conv_kaiming_init


def _conv(features, kernel, stride=1, groups=1, use_bias=False, dtype=None, name=None):
    from hydranet_tpu.ops.fast_conv import FastConv

    pad = (kernel - 1) // 2
    return FastConv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=conv_kaiming_init(),
        dtype=dtype,
        name=name,
    )


class Stem(nn.Module):
    """3x3/s2 conv + BN + ReLU — anynet.py:8-20."""

    out_channels: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(self.out_channels, 3, stride=2, dtype=self.dtype, name="conv")(x)
        x = TorchBatchNorm(dtype=self.dtype, name="bn")(x, train=train)
        return nn.relu(x)


class XBlock(nn.Module):
    """Residual X-block with optional SE — anynet.py:23-76.

    Note: the reference computes the SE bottleneck width from *in_channels*
    (anynet.py:41), not the intermediate width — reproduced here.
    """

    out_channels: int
    bottleneck_ratio: int
    group_width: int
    stride: int
    se_ratio: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        inter = self.out_channels // self.bottleneck_ratio
        groups = inter // self.group_width

        h = _conv(inter, 1, dtype=self.dtype, name="conv1")(x)
        h = TorchBatchNorm(dtype=self.dtype, name="bn1")(h, train=train)
        h = nn.relu(h)

        h = _conv(inter, 3, stride=self.stride, groups=groups, dtype=self.dtype,
                  name="conv2")(h)
        h = TorchBatchNorm(dtype=self.dtype, name="bn2")(h, train=train)
        h = nn.relu(h)

        if self.se_ratio is not None:
            se_channels = in_channels // self.se_ratio
            s = jnp.mean(h, axis=(1, 2), keepdims=True)
            s = _conv(se_channels, 1, use_bias=True, dtype=self.dtype, name="se_fc1")(s)
            s = nn.relu(s)
            s = _conv(inter, 1, use_bias=True, dtype=self.dtype, name="se_fc2")(s)
            s = jax.nn.sigmoid(s)
            h = h * s

        h = _conv(self.out_channels, 1, dtype=self.dtype, name="conv3")(h)
        h = TorchBatchNorm(dtype=self.dtype, name="bn3")(h, train=train)

        if self.stride != 1 or in_channels != self.out_channels:
            sc = _conv(self.out_channels, 1, stride=self.stride, dtype=self.dtype,
                       name="shortcut_conv")(x)
            sc = TorchBatchNorm(dtype=self.dtype, name="shortcut_bn")(sc, train=train)
        else:
            sc = x
        return nn.relu(h + sc)


class Stage(nn.Module):
    """A stack of XBlocks; first block carries the stride — anynet.py:79-90."""

    num_blocks: int
    out_channels: int
    bottleneck_ratio: int
    group_width: int
    stride: int
    se_ratio: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = XBlock(
                out_channels=self.out_channels,
                bottleneck_ratio=self.bottleneck_ratio,
                group_width=self.group_width,
                stride=self.stride if i == 0 else 1,
                se_ratio=self.se_ratio,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train=train)
        return x


class AnyNetXe(nn.Module):
    """Stem + stages, returning the per-stage feature list — anynet.py:93-145.

    Enforces the Xe design-space constraints at construction time
    (anynet.py:148-170): uniform bottleneck ratio / group width,
    non-decreasing widths, non-decreasing depths (except final stage).
    """

    ls_num_blocks: Tuple[int, ...]
    ls_block_width: Tuple[int, ...]
    ls_bottleneck_ratio: Tuple[int, ...]
    ls_group_width: Tuple[int, ...]
    stride: int = 2
    se_ratio: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    # rematerialize each stage in the backward pass (jax.checkpoint): trades
    # recompute FLOPs for activation HBM — enables larger training batches.
    remat: bool = False

    def __post_init__(self):
        for f in ("ls_num_blocks", "ls_block_width", "ls_bottleneck_ratio",
                  "ls_group_width"):
            object.__setattr__(self, f, tuple(getattr(self, f)))
        for bw, b, g in zip(self.ls_block_width, self.ls_bottleneck_ratio,
                            self.ls_group_width):
            assert bw % (b * g) == 0
        assert len(set(self.ls_bottleneck_ratio)) == 1  # Xb
        assert len(set(self.ls_group_width)) == 1  # Xc
        assert all(i <= j for i, j in
                   zip(self.ls_block_width, self.ls_block_width[1:]))  # Xd
        if len(self.ls_num_blocks) > 2:  # Xe
            assert all(i <= j for i, j in
                       zip(self.ls_num_blocks[:-2], self.ls_num_blocks[1:-1]))
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Stem(out_channels=32, dtype=self.dtype, name="stem")(x, train=train)
        feats = []
        for i, (nb, bw, br, gw) in enumerate(zip(
                self.ls_num_blocks, self.ls_block_width,
                self.ls_bottleneck_ratio, self.ls_group_width)):
            stage = Stage(
                num_blocks=int(nb),
                out_channels=int(bw),
                bottleneck_ratio=int(br),
                group_width=int(gw),
                stride=self.stride,
                se_ratio=self.se_ratio,
                dtype=self.dtype,
                name=f"stage_{i}",
            )
            if self.remat:
                # lifted remat over a (module, x) function; `train` stays a
                # static Python value via the closure.
                x = nn.remat(lambda mdl, y: mdl(y, train=train))(stage, x)
            else:
                x = stage(x, train=train)
            feats.append(x)
        return feats
