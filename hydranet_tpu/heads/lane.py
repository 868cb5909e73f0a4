"""Anchor-row lane detection head (TPU-native equivalent of
/root/reference/model/head_lane/lanedetect.py).

Fuses 4 FPN levels to one stride-16 or stride-32 grid by maxpool/upsample +
concat (lanedetect.py:66-84), then two 1x1-conv towers producing per-anchor
class logits [B, H*W, 2] and location regression
[B, H*W, 2*(points_per_line+1)] (down offsets+count, up offsets+count)
(lanedetect.py:85-96). NHWC.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from hydranet_tpu.ops.common import TorchBatchNorm, max_pool_torch, upsample_nearest


class LaneHead(nn.Module):
    base_channel: int
    num_classes: int
    stride: int
    input_width: int
    input_height: int
    interval: int
    dtype: Optional[jnp.dtype] = None

    @property
    def points_per_line(self) -> int:
        return int(self.input_height / self.interval)

    def _tower(self, x, out_channels: int, prefix: str, train: bool):
        """1x1 conv (no bias) + BN + ReLU + 1x1 conv — lanedetect.py:45-64.
        Flat names (e.g. cls_conv1/cls_bn/cls_conv2) keep checkpoint import
        1:1 with the reference's nn.Sequential indices (0=conv, 1=bn, 3=conv).
        """
        from hydranet_tpu.ops.fast_conv import FastConv

        h = FastConv(self.base_channel, (1, 1), use_bias=False,
                     dtype=self.dtype, name=f"{prefix}_conv1")(x)
        h = TorchBatchNorm(dtype=self.dtype, name=f"{prefix}_bn")(h, train=train)
        h = nn.relu(h)
        return FastConv(out_channels, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"{prefix}_conv2")(h)

    @nn.compact
    def __call__(self, fused_feats: Sequence[jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        # Multi-scale fusion — lanedetect.py:66-84. fused_feats strides are
        # (8, 16, 32, 64, 128); only the first four are used.
        if self.stride == 16:
            fused = jnp.concatenate([
                max_pool_torch(fused_feats[0]),
                upsample_nearest(fused_feats[2], 2),
                fused_feats[1],
                upsample_nearest(fused_feats[3], 4),
            ], axis=-1)
        elif self.stride == 32:
            fused = jnp.concatenate([
                max_pool_torch(max_pool_torch(fused_feats[0])),
                max_pool_torch(fused_feats[1]),
                fused_feats[2],
                upsample_nearest(fused_feats[3], 2),
            ], axis=-1)
        else:
            raise ValueError(f"unsupported lane stride {self.stride}")
        from hydranet_tpu.parallel.spatial import shard_spatial
        fused = shard_spatial(fused)

        pts = self.points_per_line + 1
        cls = self._tower(fused, self.num_classes, "cls", train)
        up = self._tower(fused, pts, "up", train)
        down = self._tower(fused, pts, "down", train)

        b = fused.shape[0]
        predict_cls = cls.reshape(b, -1, self.num_classes)
        # NHWC already matches the reference's permute(0,2,3,1); concat the
        # down tower first, then up (lanedetect.py:89-92).
        predict_loc = jnp.concatenate([down, up], axis=-1).reshape(b, -1, 2 * pts)
        return {"predict_cls": predict_cls, "predict_loc": predict_loc}
