"""Thin conv module calling lax.conv_general_dilated directly with an
explicit `preferred_element_type`.

flax's nn.Conv does not set preferred_element_type; on this TPU backend the
resulting convolutions run ~1.7x slower than the same conv with the
accumulation type pinned to the compute dtype (measured: 10 vs 17 TF/s for a
bf16 3x3 256->128 @80^2). Param structure ("kernel" HWIO, "bias") matches
nn.Conv exactly, so checkpoint import and all parity tests are unaffected.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


class FastConv(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    def _pad_for_mxu_kernel(self, x):
        """Returns the pre-padded input when this conv maps onto the Pallas
        3x3 MXU kernel, else None."""
        if (self.kernel_size != (3, 3) or tuple(self.strides) != (1, 1)
                or self.feature_group_count != 1):
            return None
        pad = self.padding
        if pad == "VALID":
            return x
        if pad == "SAME" or (not isinstance(pad, str)
                             and tuple(map(tuple, pad)) == ((1, 1), (1, 1))):
            return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return None

    @nn.compact
    def __call__(self, x):
        from hydranet_tpu.ops.pallas_conv import conv3x3_prepadded, tpu_backend

        kh, kw = self.kernel_size
        in_features = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_features, self.features))
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)

        # The standalone Pallas kernel beats XLA's conv lowering (~73 vs
        # ~41 TF/s, see ops/pallas_conv.py), but inside the fully fused
        # pipeline it acts as a fusion barrier and costs more than it saves
        # (measured 501 vs 591 fps e2e) — so it is opt-in per conv.
        import os

        # Serving-path int8 PTQ (ops/quantize.py). Trace-time mode switch:
        # 'calibrate' sows the input absmax; 'int8' replaces the conv with
        # s8 x s8 -> s32 + fused dequant, using the calibrated scale.
        from hydranet_tpu.ops import quantize as qz

        qmode = qz.current_mode()
        if qmode != "off" and qz.conv_eligible(self.path, in_features,
                                               self.feature_group_count):
            if qmode == "calibrate":
                if self.is_mutable_collection("act_stats"):
                    # per-SAMPLE absmax [B]: lets calibrate() take a
                    # percentile across samples (quantize.py)
                    self.sow("act_stats", "absmax",
                             qz.per_sample_absmax(x),
                             reduce_fn=jnp.maximum,
                             init_fn=lambda: jnp.zeros((), jnp.float32))
            elif self.has_variable("act_stats", "absmax"):
                absmax = self.get_variable("act_stats", "absmax")
                y = qz.int8_conv(x, kernel, absmax, self.strides,
                                 self.padding, dtype)
                if self.use_bias:
                    bias = self.param("bias", self.bias_init,
                                      (self.features,))
                    y = y + bias.astype(dtype)
                return y

        use_mxu = (tpu_backend()
                   and os.environ.get("HN_USE_PALLAS_CONV", "0") == "1")
        xp = self._pad_for_mxu_kernel(x) if use_mxu else None
        if xp is not None:
            y = conv3x3_prepadded(xp, kernel.astype(dtype))
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(dtype),
                window_strides=self.strides,
                padding=self.padding,
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(dtype)
        return y
