"""BiFPN neck (TPU-native equivalent of /root/reference/model/net/bifpn.py).

Bidirectional FPN with fast-normalized attention fusion weights
(relu(w) / (sum + eps), bifpn.py:156-233). The first cell down-channels the
backbone features and synthesizes P6/P7: when the backbone has a real
stride-64 stage (len(conv_channels) == 4, big preset) P6 comes from
down-channelling it (bifpn.py:78-82,158-165); otherwise P6 = maxpool(conv(P5))
(bifpn.py:71-75). NHWC throughout.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hydranet_tpu.ops.common import (
    BNParams as _BNParams,
    ConvParams as _ConvParams,
    SamePadConv,
    SeparableConvBlock,
    TorchBatchNorm,
    max_pool_same,
    swish,
    upsample_nearest,
)


class _SepConvParams(nn.Module):
    """Param mirror of SeparableConvBlock; returns the node's arrays for
    the fused kernel (depthwise taps, BN-folded pointwise kernel+bias)."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        dw_k, _ = _ConvParams(in_ch, kernel_size=3, groups=in_ch,
                              use_bias=False, name="depthwise_conv")(in_ch)
        pw_k, pw_b = _ConvParams(self.features, kernel_size=1,
                                 name="pointwise_conv")(in_ch)
        scale, bias, mean, var = _BNParams(name="norm")(self.features)
        # fold BN (inference affine, eps=1e-3 — TorchBatchNorm in
        # SeparableConvBlock) into the pointwise kernel/bias
        s = scale * jax.lax.rsqrt(var + 1e-3)
        taps = dw_k.reshape(9, in_ch)                      # [ky*kx, C]
        pw = pw_k.reshape(in_ch, self.features) * s[None, :]
        pb = (pw_b - mean) * s + bias                      # f32
        return taps, pw, pb


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
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False,
                 mode: str = "full"):
        """mode="full": compute the cell. mode="params": run only the
        first_time down-channels (real compute) and return the cell's
        inputs + node/fusion parameters for the fused Pallas kernel
        (ops/pallas_bifpn.py) — same variable tree either way."""
        nc = self.num_channels
        dt = self.dtype

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

        if mode == "params":
            names = ("conv6_up", "conv5_up", "conv4_up", "conv3_up",
                     "conv4_down", "conv5_down", "conv6_down", "conv7_down")
            node_params = [_SepConvParams(nc, name=n)(nc) for n in names]
            raw = (p6_w1, p5_w1, p4_w1, p3_w1, p4_w2, p5_w2, p6_w2, p7_w2)
            rows = []
            for w in raw:
                if w is None:          # attention=False: plain sum
                    rows.append(jnp.ones((3,), jnp.float32))
                    continue
                r = nn.relu(w)
                r = r / (jnp.sum(r) + self.epsilon)
                rows.append(jnp.pad(r, (0, 3 - r.shape[0])))
            fweights = jnp.stack(rows)                     # [8, 3] f32
            if self.first_time:
                p4b = _DownChannel(nc, dtype=dt,
                                   name="p4_down_channel_2")(p4, train=train)
                p5b = _DownChannel(nc, dtype=dt,
                                   name="p5_down_channel_2")(p5, train=train)
            else:
                p4b, p5b = p4_in, p5_in
            return ((p3_in, p4_in, p5_in, p6_in, p7_in), (p4b, p5b),
                    node_params, fweights)

        conv6_up = SeparableConvBlock(nc, dtype=dt, name="conv6_up")
        conv5_up = SeparableConvBlock(nc, dtype=dt, name="conv5_up")
        conv4_up = SeparableConvBlock(nc, dtype=dt, name="conv4_up")
        conv3_up = SeparableConvBlock(nc, dtype=dt, name="conv3_up")
        conv4_down = SeparableConvBlock(nc, dtype=dt, name="conv4_down")
        conv5_down = SeparableConvBlock(nc, dtype=dt, name="conv5_down")
        conv6_down = SeparableConvBlock(nc, dtype=dt, name="conv6_down")
        conv7_down = SeparableConvBlock(nc, dtype=dt, name="conv7_down")

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
        cells = [BiFPN(
            num_channels=self.fpn_num_filters,
            conv_channels=tuple(self.conv_channel_coef),
            first_time=(i == 0),
            attention=self.attention,
            dtype=self.dtype,
            name=f"cell_{i}",
        ) for i in range(self.fpn_cell_repeats)]

        if not train and self._use_fused_kernel(features):
            return self._fused(cells, features)

        for cell in cells:
            features = cell(features, train=train)
        return features

    def _use_fused_kernel(self, features) -> bool:
        from hydranet_tpu.ops import pallas_bifpn

        # Opt-in (HN_PALLAS_NECK=1): the kernel beats the XLA composition
        # per-cell (3.6-4.3 vs 5.9 ms/cell marginal at bs128) but loses it
        # back at the pallas operand boundary (full stack composed:
        # 17.7 vs 16.7 ms) — the same fusion-barrier economics as
        # pallas_conv v1/v2. Kept for smaller-C configs and as the base
        # for an in-kernel down-channel variant.
        # HN_NO_PALLAS_NECK=1 forces the XLA path even when the interpret
        # or opt-in flags are set — tests use it to compare the kernel
        # against the real XLA reference.
        if os.environ.get("HN_NO_PALLAS_NECK", "0") == "1":
            return False
        interpret = os.environ.get("HN_PALLAS_NECK_INTERPRET", "0") == "1"
        if not interpret and os.environ.get("HN_PALLAS_NECK", "0") != "1":
            return False
        if not interpret and jax.default_backend() != "tpu":
            return False
        # level sizes: P3 = first fused level; derive from the finest input
        p3 = features[-3] if len(self.conv_channel_coef) == 3 else features[-4]
        h, w = p3.shape[1], p3.shape[2]
        sizes = tuple((h >> i, w >> i) for i in range(5))
        if any(s == 0 or (h >> i) << i != h or (w >> i) << i != w
               for i, (s, _) in enumerate(sizes)):
            return False
        return pallas_bifpn.supports(sizes, self.fpn_num_filters,
                                     self.fpn_cell_repeats, jnp.bfloat16
                                     if self.dtype is None else self.dtype)

    def _fused(self, cells, features):
        """Inference path: the first cell's down-channel 1x1s run in XLA
        (mode='params' computes them), every cell BODY runs inside ONE
        Pallas kernel with all five levels VMEM-resident
        (ops/pallas_bifpn.py)."""
        from hydranet_tpu.ops import pallas_bifpn

        ins = features
        all_nodes, all_fw = [], []
        levels = p4b = p5b = None
        for i, cell in enumerate(cells):
            lv, (b4, b5), node_params, fw = cell(ins, train=False,
                                                 mode="params")
            if i == 0:
                levels, p4b, p5b = lv, b4, b5
            all_nodes.append(node_params)
            all_fw.append(fw)
            ins = lv  # repeat cells see 5-level inputs (shapes only matter)

        dt = levels[0].dtype
        taps = jnp.stack([jnp.stack([n[0] for n in nodes])
                          for nodes in all_nodes]).astype(dt)
        pws = jnp.stack([jnp.stack([n[1] for n in nodes])
                         for nodes in all_nodes]).astype(dt)
        pbs = jnp.stack([jnp.stack([n[2] for n in nodes])
                         for nodes in all_nodes]).astype(jnp.float32)
        fws = jnp.stack(all_fw).astype(jnp.float32)
        sizes = tuple((x.shape[1], x.shape[2]) for x in levels)
        out = pallas_bifpn.bifpn_cells(
            [x.astype(dt) for x in levels], p4b.astype(dt), p5b.astype(dt),
            taps, pws, pbs, fws, sizes,
            interpret=os.environ.get("HN_PALLAS_NECK_INTERPRET", "0") == "1")
        return tuple(out)
