"""Semantic segmentation head (TPU-native equivalent of
/root/reference/model/head_seg/segmentation.py).

monodepth2-style decoder: 5 up-stages of (ConvBlock -> x2 nearest upsample ->
skip concat -> ConvBlock), final reflection-padded 3x3 conv producing logits
at full input resolution (segmentation.py:51-105). Inputs are
[backbone_stage0, P3, P4, P5] (model.py:166-172). NHWC.

TPU-first execution: the reference composition materializes a 2x nearest-
upsampled tensor + a reflection-padded copy before every second conv — at
640^2 that is ~1.7 GB of HBM traffic per batch-16 step and dominated the
whole head on v5e. Here every `upsample -> [concat skip] -> reflect conv`
stage is computed EXACTLY (see ops/fused_upsample_conv.py for the identity)
as a phase-collapsed 2x2 conv at the low resolution plus a plain reflect conv
of the skip branch, summed: 4/9 of the upsample-branch MACs and no upsampled
intermediates.

Module/param names mirror the reference's flat nn.ModuleList indices
(decoder_0..decoder_8, each with conv/conv/{kernel,bias}) so checkpoint
import is 1:1.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hydranet_tpu.ops.fused_upsample_conv import upsample2x_reflect_conv3x3


class Conv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 valid conv — segmentation.py:32-48."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from hydranet_tpu.ops.fast_conv import FastConv

        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return FastConv(self.features, (3, 3), padding="VALID",
                        dtype=self.dtype, name="conv")(x)


class _PadActConv(nn.Module):
    """reflect-pad + 3x3 conv + bias + ELU as ONE Pallas kernel (in-kernel
    halo, fused epilogue — ops/pallas_conv2.py). Param names match nn.Conv
    ('kernel'/'bias') so checkpoint import is unchanged. Falls back to the
    XLA composition off-TPU or for non-tiling shapes."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from hydranet_tpu.ops.pallas_conv2 import conv3x3_pad_act

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x.dtype
        return conv3x3_pad_act(x.astype(dtype), kernel.astype(dtype),
                               bias.astype(dtype), pad_mode="reflect",
                               act="elu")


class _PadActConvShim(nn.Module):
    """Name-compat wrapper: params at <name>/conv/conv/* like the reference
    ConvBlock -> Conv3x3 -> nn.Conv nesting."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return _PadActConv(self.features, dtype=self.dtype, name="conv")(x)


def _use_pallas_seg() -> bool:
    # Opt-in: the fused kernel beats XLA on every ConvBlock STANDALONE
    # (e.g. 40^2 512->256: 4.1 vs 5.3 ms at bs128) but the pallas_call is a
    # fusion barrier in the composed decoder — full head measures 57.7 ms
    # with it vs 51.6 ms pure-XLA. Same conclusion as ops/pallas_conv.py v1.
    import os

    return os.environ.get("HN_PALLAS_SEG", "0") == "1"


class ConvBlock(nn.Module):
    """Conv3x3 + ELU — segmentation.py:16-29."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if _use_pallas_seg():
            return _PadActConvShim(self.features, dtype=self.dtype,
                                   name="conv")(x)
        return nn.elu(Conv3x3(self.features, dtype=self.dtype, name="conv")(x))


class _FusedUpConv3x3(nn.Module):
    """conv3x3(reflect_pad(concat(up2(x_low), skip))) computed without the
    upsampled intermediate. Param names match nn.Conv ('kernel'/'bias') so
    this leaf is import-compatible with the reference Conv3x3's conv."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_low, skip=None, params_only: bool = False):
        from hydranet_tpu.ops import quantize as qz
        from hydranet_tpu.ops.fused_upsample_conv import (
            upsample2x_reflect_conv3x3_int8)

        c_up = x_low.shape[-1]
        c_in = c_up + (skip.shape[-1] if skip is not None else 0)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x_low.dtype
        k = kernel.astype(dtype)
        if params_only:
            # fused phase-tail path (SegmentHead): the caller consumes the
            # stage's params directly; identical variable tree either way
            return k, bias.astype(dtype)
        x_low = x_low.astype(dtype)

        # Serving-path int8 PTQ (ops/quantize.py): the upsample and skip
        # branches carry separate calibrated scales ('absmax' /
        # 'absmax_skip'). Quantization happens on the COLLAPSED kernels
        # inside the int8 variant — see upsample2x_reflect_conv3x3_int8.
        qmode = qz.current_mode()
        quantized = (qmode != "off"
                     and qz.conv_eligible(self.path, c_up, 1))
        if quantized and qmode == "calibrate":
            if self.is_mutable_collection("act_stats"):
                zero = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
                self.sow("act_stats", "absmax",
                         qz.per_sample_absmax(x_low),
                         reduce_fn=jnp.maximum, init_fn=zero)
                if skip is not None:
                    self.sow("act_stats", "absmax_skip",
                             qz.per_sample_absmax(skip),
                             reduce_fn=jnp.maximum, init_fn=zero)
        elif quantized and qmode == "int8" \
                and self.has_variable("act_stats", "absmax"):
            out = upsample2x_reflect_conv3x3_int8(
                x_low, k[:, :, :c_up],
                self.get_variable("act_stats", "absmax"), dtype)
            if skip is not None:
                sp = jnp.pad(skip.astype(dtype),
                             ((0, 0), (1, 1), (1, 1), (0, 0)),
                             mode="reflect")
                out = out + qz.int8_conv(
                    sp, k[:, :, c_up:],
                    self.get_variable("act_stats", "absmax_skip"),
                    (1, 1), "VALID", dtype)
            return out + bias.astype(dtype)

        out = upsample2x_reflect_conv3x3(x_low, k[:, :, :c_up])
        if skip is not None:
            sp = jnp.pad(skip.astype(dtype),
                         ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            out = out + jax.lax.conv_general_dilated(
                sp, k[:, :, c_up:], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dtype)
        return out + bias.astype(dtype)


class _Conv3x3Shim(nn.Module):
    """Name-compat wrapper so fused stage params live at <name>/conv/conv/*
    like the reference ConvBlock -> Conv3x3 -> nn.Conv nesting."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_low, skip=None, params_only: bool = False):
        return _FusedUpConv3x3(self.features, dtype=self.dtype,
                               name="conv")(x_low, skip,
                                            params_only=params_only)


class _OutputConvShim(nn.Module):
    """Name-compat wrapper: final fused conv params at <name>/conv/* like the
    reference's bare Conv3x3 (decoder.8.conv.weight). With
    `emit_argmax=True` (inference decode) the stage computes
    argmax(logits) directly at the low resolution and interleaves class
    ids — the 2x-res logits never exist (ops/fused_upsample_conv.py)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_low, emit_argmax: bool = False,
                 emit_phase: bool = False, emit_wpack: int = 0,
                 params_only: bool = False):
        if params_only:
            return _FusedUpConv3x3(self.features, dtype=self.dtype,
                                   name="conv")(x_low, params_only=True)
        if not (emit_argmax or emit_phase or emit_wpack):
            return _FusedUpConv3x3(self.features, dtype=self.dtype,
                                   name="conv")(x_low)
        from hydranet_tpu.ops.fused_upsample_conv import (
            upsample2x_conv3x3_argmax, upsample2x_conv3x3_phase_logits,
            upsample2x_conv3x3_wpack_logits)

        if emit_wpack:
            # train-time w-packed phase logits (segment.wpack_loss): the
            # loss consumes the packed layout directly — see
            # cross_entropy_loss_wpacked
            fn = (lambda x, k, b:
                  upsample2x_conv3x3_wpack_logits(x, k, b, emit_wpack)[0])
        else:
            fn = (upsample2x_conv3x3_phase_logits if emit_phase
                  else upsample2x_conv3x3_argmax)

        # identical param tree (<name>/conv/kernel, bias) as the logits path
        class _Leaf(nn.Module):
            features: int
            dtype: Optional[jnp.dtype] = None

            @nn.compact
            def __call__(self, x):
                kernel = self.param("kernel",
                                    nn.initializers.lecun_normal(),
                                    (3, 3, x.shape[-1], self.features))
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                dtype = self.dtype or x.dtype
                return fn(x.astype(dtype), kernel.astype(dtype),
                          bias.astype(dtype))

        return _Leaf(self.features, dtype=self.dtype, name="conv")(x_low)


class UpConvBlock(nn.Module):
    """ELU(conv3x3(reflect_pad(cat(up2(x), skip)))) — fused."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_low, skip=None, params_only: bool = False):
        if params_only:
            return _Conv3x3Shim(self.features, dtype=self.dtype,
                                name="conv")(x_low, skip, params_only=True)
        return nn.elu(_Conv3x3Shim(self.features, dtype=self.dtype,
                                   name="conv")(x_low, skip))


class SegmentHead(nn.Module):
    """Decoder over encoder features — segmentation.py:51-105."""

    num_ch_enc: Tuple[int, ...]
    num_ch_dec: Tuple[int, ...]
    num_output_channels: int
    use_skips: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray],
                 emit_argmax: bool = False, emit_phase: bool = False,
                 emit_wpack: int = 0):
        import os

        from hydranet_tpu.ops import quantize as qz
        from hydranet_tpu.parallel.spatial import shard_spatial

        # phase-tail fast path (inference decode): the last up-stage and the
        # final conv+argmax run entirely in phase space — the 2x-resolution
        # intermediate never materializes interleaved and both convs are
        # MXU-shaped (ops/fused_upsample_conv.upsample4x_phase_tail_argmax).
        # Exact same ids (tests); param tree unchanged (params_only pulls
        # the stages' kernels through their own modules). Default ON since
        # chain v6: 19.11 -> 18.15 ms standalone over the up3+final pair,
        # 1172.9 -> 1175.2 fps e2e (artifacts/bench_phase_tail_r4.log,
        # bench_phase_tail_pipeline_r4.log). Gated to batch >= 8 like the
        # wpack default — the measurements are bs128 and the fused
        # formulations are batch-sensitive (upsample2x_reflect_conv3x3's
        # own dilated/phase split); the published bs1 latencies keep the
        # measured path. Quant modes keep the modular path — the
        # params_only pull would bypass the last upconv's int8
        # calibration sow (see _FusedUpConv3x3).
        phase_tail = (emit_argmax and not emit_phase
                      and input_features[-1].shape[0] >= 8
                      and qz.current_mode() == "off"
                      and os.environ.get("HN_SEG_PHASE_TAIL", "1") == "1")

        n = len(self.num_ch_enc)
        x = input_features[-1]
        for i in range(n):
            # decoder indices follow the reference ModuleList layout built
            # from i = n-1 .. 0 (segmentation.py:66-82): forward stage i uses
            # modules 2*i and 2*i+1.
            ch = self.num_ch_dec[n - 1 - i]
            x = ConvBlock(ch, dtype=self.dtype, name=f"decoder_{2 * i}")(x)
            skip = (input_features[n - 2 - i]
                    if self.use_skips and i < n - 1 else None)
            if phase_tail and i == n - 1 and skip is None:
                from hydranet_tpu.ops.fused_upsample_conv import (
                    upsample4x_phase_tail_argmax)

                k_up, b_up = UpConvBlock(
                    ch, dtype=self.dtype,
                    name=f"decoder_{2 * i + 1}")(x, None, params_only=True)
                k_f, b_f = _OutputConvShim(
                    self.num_output_channels, dtype=self.dtype,
                    name=f"decoder_{2 * n}")(x, params_only=True)
                dt = self.dtype or x.dtype
                return upsample4x_phase_tail_argmax(
                    x.astype(dt), k_up, b_up, k_f, b_f)
            x = UpConvBlock(ch, dtype=self.dtype,
                            name=f"decoder_{2 * i + 1}")(x, skip)
            # spatial-mode boundary hint (identity otherwise): each up-stage
            # doubles H, so the sharding flips from replicated (tiny deep
            # stages) to H-sharded exactly once, where the rows amortize
            x = shard_spatial(x)
        # final: conv3x3(reflect_pad(up2(x))), no activation; inference
        # decode (emit_argmax) folds the class argmax into this stage;
        # training (emit_phase) emits the phase logits for the phase CE
        # (the full-res 5-channel logits lane-pad 5 -> 128 on TPU and
        # exist only to be re-read by the loss — see
        # ops/fused_upsample_conv.py::upsample2x_conv3x3_phase_logits)
        out = _OutputConvShim(self.num_output_channels, dtype=self.dtype,
                              name=f"decoder_{2 * n}")(
                                  x, emit_argmax=emit_argmax,
                                  emit_phase=emit_phase,
                                  emit_wpack=emit_wpack)
        return out

    @staticmethod
    def decode(logits: jnp.ndarray) -> jnp.ndarray:
        """argmax over classes — segmentation.py:109 (on-device; the
        colorize/overlay visualization lives in hydranet_tpu.inference)."""
        return jnp.argmax(logits, axis=-1)
