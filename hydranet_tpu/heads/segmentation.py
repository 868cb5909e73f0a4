"""Semantic segmentation head (TPU-native equivalent of
/root/reference/model/head_seg/segmentation.py).

monodepth2-style decoder: 5 up-stages of (ConvBlock -> x2 nearest upsample ->
skip concat -> ConvBlock), final reflection-padded 3x3 conv producing logits at
full input resolution (segmentation.py:51-105). Inputs are
[backbone_stage0, P3, P4, P5] (model.py:166-172). NHWC.

Module names mirror the reference's flat nn.ModuleList indices
(decoder_0..decoder_8) so checkpoint import is 1:1.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hydranet_tpu.ops.common import upsample_nearest


class Conv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 valid conv — segmentation.py:32-48."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU — segmentation.py:16-29."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, dtype=self.dtype, name="conv")(x))


class SegmentHead(nn.Module):
    """Decoder over encoder features — segmentation.py:51-105."""

    num_ch_enc: Tuple[int, ...]
    num_ch_dec: Tuple[int, ...]
    num_output_channels: int
    use_skips: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray]):
        n = len(self.num_ch_enc)
        x = input_features[-1]
        for i in range(n):
            # decoder indices follow the reference ModuleList layout built
            # from i = n-1 .. 0 (segmentation.py:66-82): stage i uses modules
            # 2*i and 2*i+1 in forward order.
            dec_i = n - 1 - i  # the reference's reversed construction index
            ch = self.num_ch_dec[dec_i]
            x = ConvBlock(ch, dtype=self.dtype, name=f"decoder_{2 * i}")(x)
            parts = [upsample_nearest(x)]
            if self.use_skips and i < n - 1:
                parts.append(input_features[n - 2 - i])
            x = jnp.concatenate(parts, axis=-1)
            x = ConvBlock(ch, dtype=self.dtype, name=f"decoder_{2 * i + 1}")(x)
        out = Conv3x3(self.num_output_channels, dtype=self.dtype,
                      name=f"decoder_{2 * n}")(upsample_nearest(x))
        return out

    @staticmethod
    def decode(logits: jnp.ndarray) -> jnp.ndarray:
        """argmax over classes — segmentation.py:109 (on-device; the
        colorize/overlay visualization lives in hydranet_tpu.inference)."""
        return jnp.argmax(logits, axis=-1)
