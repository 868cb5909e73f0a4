"""BiFPN neck (TPU-native equivalent of /root/reference/model/net/bifpn.py).

Bidirectional FPN with fast-normalized attention fusion weights
(relu(w) / (sum + eps), bifpn.py:156-233). The first cell down-channels the
backbone features and synthesizes P6/P7: when the backbone has a real
stride-64 stage (len(conv_channels) == 4, big preset) P6 comes from
down-channelling it (bifpn.py:78-82,158-165); otherwise P6 = maxpool(conv(P5))
(bifpn.py:71-75). NHWC throughout.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from hydranet_tpu.ops.common import (
    SamePadConv,
    SeparableConvBlock,
    TorchBatchNorm,
    max_pool_same,
    swish,
    upsample_nearest,
)


class _DownChannel(nn.Module):
    """1x1 same-pad conv + BN(m=0.01, eps=1e-3) — bifpn.py:58-69."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SamePadConv(features=self.features, kernel_size=1, dtype=self.dtype,
                        name="conv")(x)
        return TorchBatchNorm(momentum=0.01, epsilon=1e-3, dtype=self.dtype,
                              name="bn")(x, train=train)


def _fuse(weights, parts, epsilon):
    """Fast-normalized attention fusion: relu(w)/(sum+eps) — bifpn.py:179-180."""
    w = nn.relu(weights)
    w = w / (jnp.sum(w) + epsilon)
    out = w[0] * parts[0]
    for i in range(1, len(parts)):
        out = out + w[i] * parts[i]
    return out


class BiFPN(nn.Module):
    """One BiFPN cell — bifpn.py:6-233 (fast-attention path)."""

    num_channels: int
    conv_channels: Tuple[int, ...] = ()
    first_time: bool = False
    epsilon: float = 1e-4
    attention: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        nc = self.num_channels
        dt = self.dtype
        conv6_up = SeparableConvBlock(nc, dtype=dt, name="conv6_up")
        conv5_up = SeparableConvBlock(nc, dtype=dt, name="conv5_up")
        conv4_up = SeparableConvBlock(nc, dtype=dt, name="conv4_up")
        conv3_up = SeparableConvBlock(nc, dtype=dt, name="conv3_up")
        conv4_down = SeparableConvBlock(nc, dtype=dt, name="conv4_down")
        conv5_down = SeparableConvBlock(nc, dtype=dt, name="conv5_down")
        conv6_down = SeparableConvBlock(nc, dtype=dt, name="conv6_down")
        conv7_down = SeparableConvBlock(nc, dtype=dt, name="conv7_down")

        if self.first_time:
            if len(self.conv_channels) == 3:
                # 4-stage backbone: synthesize P6 from P5 — bifpn.py:158-161.
                p3, p4, p5 = inputs[-3:]
                p6_in = _DownChannel(nc, dtype=dt, name="p5_to_p6")(p5, train=train)
                p6_in = max_pool_same(p6_in)
            else:
                # 5-stage backbone: down-channel the real coarse stage —
                # bifpn.py:162-165.
                p3, p4, p5, p6_raw = inputs[-4:]
                p6_in = _DownChannel(nc, dtype=dt, name="p6_down_channel")(
                    p6_raw, train=train)
            p7_in = max_pool_same(p6_in)  # p6_to_p7 — bifpn.py:84-86
            p3_in = _DownChannel(nc, dtype=dt, name="p3_down_channel")(p3, train=train)
            p4_in = _DownChannel(nc, dtype=dt, name="p4_down_channel")(p4, train=train)
            p5_in = _DownChannel(nc, dtype=dt, name="p5_down_channel")(p5, train=train)
        else:
            p3_in, p4_in, p5_in, p6_in, p7_in = inputs

        ones = nn.initializers.ones

        if self.attention:
            p6_w1 = self.param("p6_w1", ones, (2,), jnp.float32)
            p5_w1 = self.param("p5_w1", ones, (2,), jnp.float32)
            p4_w1 = self.param("p4_w1", ones, (2,), jnp.float32)
            p3_w1 = self.param("p3_w1", ones, (2,), jnp.float32)
            p4_w2 = self.param("p4_w2", ones, (3,), jnp.float32)
            p5_w2 = self.param("p5_w2", ones, (3,), jnp.float32)
            p6_w2 = self.param("p6_w2", ones, (3,), jnp.float32)
            p7_w2 = self.param("p7_w2", ones, (2,), jnp.float32)

            fuse = lambda w, parts: _fuse(w, parts, self.epsilon)
        else:
            fuse = lambda w, parts: sum(parts[1:], parts[0])
            p6_w1 = p5_w1 = p4_w1 = p3_w1 = p4_w2 = p5_w2 = p6_w2 = p7_w2 = None

        # Top-down pathway — bifpn.py:177-200.
        p6_up = conv6_up(swish(fuse(p6_w1, [p6_in, upsample_nearest(p7_in)])),
                         train=train)
        p5_up = conv5_up(swish(fuse(p5_w1, [p5_in, upsample_nearest(p6_up)])),
                         train=train)
        p4_up = conv4_up(swish(fuse(p4_w1, [p4_in, upsample_nearest(p5_up)])),
                         train=train)
        p3_out = conv3_up(swish(fuse(p3_w1, [p3_in, upsample_nearest(p4_up)])),
                          train=train)

        if self.first_time:
            # Fresh down-channel branches for the bottom-up pathway —
            # bifpn.py:202-204.
            p4_in = _DownChannel(nc, dtype=dt, name="p4_down_channel_2")(p4, train=train)
            p5_in = _DownChannel(nc, dtype=dt, name="p5_down_channel_2")(p5, train=train)

        # Bottom-up pathway — bifpn.py:206-231.
        p4_out = conv4_down(
            swish(fuse(p4_w2, [p4_in, p4_up, max_pool_same(p3_out)])), train=train)
        p5_out = conv5_down(
            swish(fuse(p5_w2, [p5_in, p5_up, max_pool_same(p4_out)])), train=train)
        p6_out = conv6_down(
            swish(fuse(p6_w2, [p6_in, p6_up, max_pool_same(p5_out)])), train=train)
        p7_out = conv7_down(
            swish(fuse(p7_w2, [p7_in, max_pool_same(p6_out)])), train=train)

        return p3_out, p4_out, p5_out, p6_out, p7_out


class StackBiFPN(nn.Module):
    """`fpn_cell_repeats` chained BiFPN cells, first with first_time=True —
    bifpn.py:315-329."""

    fpn_num_filters: int
    fpn_cell_repeats: int
    conv_channel_coef: Tuple[int, ...]
    attention: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False):
        for i in range(self.fpn_cell_repeats):
            features = BiFPN(
                num_channels=self.fpn_num_filters,
                conv_channels=tuple(self.conv_channel_coef),
                first_time=(i == 0),
                attention=self.attention,
                dtype=self.dtype,
                name=f"cell_{i}",
            )(features, train=train)
        return features
