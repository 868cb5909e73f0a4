"""Post-training int8 quantization (PTQ) for the serving path.

TPU v5e's MXU runs s8 x s8 -> s32 at 2x the bf16 rate (394 vs 197 TOPS) —
but that doubling only pays where the MXU rate is the binding resource,
and on this model it never is: measured int8 is a wash at bs128
(1141.7 vs 1136.5 fps) and 25-33% SLOWER at bs1-16 (the quantize/dequant
elementwise passes cost more than the rate win buys; see the decision
table in docs/KNOBS.md and artifacts/bench_int8_latency_r4.log).
Accuracy is at parity (mIoU .944 / AP .370 / lane F1 .938 at p99.5
calibration). The module stands as a complete, accuracy-validated PTQ
path for shapes that ARE MXU-bound. The recipe is standard symmetric
PTQ, hydranet_tpu-style (everything stays inside one XLA program —
quantize, integer conv, dequantize all fuse into the pipeline):

- **weights**: per-output-channel symmetric, s_w[c] = max|w[..., c]| / 127,
  quantized at trace time from the float params (B-independent cost; XLA
  constant-folds it when params are closed over as constants).
- **activations**: per-tensor symmetric, s_x = absmax / 127 with absmax
  collected by a calibration pass (`mode="calibrate"`) that `sow`s the
  running max of |x| at every eligible conv input into the `act_stats`
  flax collection. Serving (`mode="int8"`) reads the collection back and
  bakes 1/s_x into the graph as a constant.
- **dequant epilogue**: y = conv_s8s8_s32(x_q, w_q) * (s_x * s_w[c]) + b —
  one per-channel multiply that XLA fuses into the conv epilogue, exactly
  like the BN scale that usually follows.

Eligibility: only dense convs (feature_group_count == 1) with cin >= 16
quantize — depthwise convs carry no MXU FLOPs, and tiny-cin convs (the RGB
stem) are accuracy-sensitive for negligible gain. Prediction output convs
(detection "header", lane "*_conv2") stay float: standard PTQ practice
keeps first/last layers high-precision.

The mode is a trace-time contextvar, NOT a module attribute — threading a
flag through every module in the tree would touch the whole model for a
serving-only concern. Each quant mode must therefore be traced into its
own jitted callable (InferencePipeline does this; a cached jit closure
from a different mode is never reused because the pipeline constructs its
functions per-mode).

No reference equivalent: the reference serves f16 through ONNX Runtime
(deploy/src/model/hydranet_model.cpp); this is a hydranet_tpu extension.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_MODE = contextvars.ContextVar("hn_quant_mode", default="off")

# conv-module path substrings that never quantize (prediction outputs)
SKIP_PATH_SUBSTRINGS: Tuple[str, ...] = ("header", "cls_conv2", "loc_conv2")

MIN_CIN = 16


def current_mode() -> str:
    return _MODE.get()


@contextlib.contextmanager
def quant_mode(mode: str):
    """Set the trace-time quantization mode: 'off' | 'calibrate' | 'int8'."""
    assert mode in ("off", "calibrate", "int8"), mode
    token = _MODE.set(mode)
    try:
        yield
    finally:
        _MODE.reset(token)


def conv_eligible(path: Sequence[str], cin: int, groups: int) -> bool:
    if groups != 1 or cin < MIN_CIN:
        return False
    joined = "/".join(path)
    return not any(s in joined for s in SKIP_PATH_SUBSTRINGS)


def per_sample_absmax(x: jnp.ndarray) -> jnp.ndarray:
    """max |x| over all non-batch axes -> [B] (f32).

    Calibration sows this VECTOR rather than a scalar so the host can take
    a percentile across calibration samples (absmax is driven by rare
    activation spikes under ELU/swish; clipping the top fraction of
    samples trades bounded saturation error for a finer quant step)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)),
                   axis=tuple(range(1, x.ndim)))


def reduce_calibration(batches, percentile: float = 100.0):
    """Host-side reduction of sown per-sample absmax trees.

    batches: list of act_stats trees whose leaves are [B] vectors (or
    scalars from older collections). Returns one tree of SCALAR scales:
    the `percentile`-th percentile across all calibration samples
    (100.0 = exact absmax)."""
    import numpy as np

    flat = [jax.tree_util.tree_flatten(b) for b in batches]
    treedef = flat[0][1]
    leaves = []
    for i in range(len(flat[0][0])):
        vals = np.concatenate(
            [np.atleast_1d(np.asarray(f[0][i], np.float32)) for f in flat])
        leaves.append(np.float32(np.percentile(vals, percentile)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def quantize_weight(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8. kernel: HWIO (f32/bf16).

    Returns (w_q int8, s_w f32[cout])."""
    kf = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
    s_w = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)
    return w_q, s_w


def quantize_activation(x: jnp.ndarray, absmax: jnp.ndarray):
    """Per-tensor symmetric int8 from a calibrated absmax scalar.

    Returns (x_q int8, s_x f32 scalar)."""
    # jnp.max: tolerate an un-reduced [B] per-sample vector as the scale
    # source (calibrate() normally stores host-reduced scalars)
    s_x = jnp.maximum(jnp.max(absmax.astype(jnp.float32)), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
    return x_q.astype(jnp.int8), s_x


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, absmax: jnp.ndarray,
              strides, padding, out_dtype) -> jnp.ndarray:
    """s8 x s8 -> s32 convolution with fused dequant epilogue.

    x: NHWC float, kernel: HWIO float, absmax: calibrated |x| max (scalar).
    Returns float `out_dtype` output equal to conv(x, kernel) up to
    quantization error.
    """
    x_q, s_x = quantize_activation(x, absmax)
    w_q, s_w = quantize_weight(kernel)
    y = jax.lax.conv_general_dilated(
        x_q, w_q,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    scale = (s_x * s_w).astype(jnp.float32)
    return (y.astype(jnp.float32) * scale).astype(out_dtype)
