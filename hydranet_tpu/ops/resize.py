"""Fused bilinear-resize + imagenet-normalize preprocessing kernel.

The serving pipeline's first op is `uint8 [B, H0, W0, 3] -> normalized
bf16 [B, H, W, 3]` (reference demo.py:191-196: cv2 INTER_LINEAR resize +
imagenet normalize). XLA cannot fuse the u8->float conversion into its
resize lowering, so it materializes a full-resolution float tensor:
measured 10.4 ms at bs128 1080p->640x640 (the conversion alone is
6.2 ms; ~2.4 GB of HBM traffic against ~1.1 GB ideal).

TPU-first design (one Pallas kernel, one HBM read of the uint8 frame,
one HBM write of the small output — measured 4.2 ms at bs128):

* The kernel consumes the image's NATIVE device layout. XLA stores
  uint8 NHWC frames channel-PLANAR ({2,1,3,0:T(8,128)(4,1)} — three
  [H0, W0] planes); any channel-interleaving reshape is a physical
  re-tiling copy (8.8 ms alone at bs128). `transpose(0, 3, 1, 2)` is a
  free relabeling of those bytes, so the grid runs over
  (batch, channel, row-strip) plane strips.
* For rational downscales the 2-tap bilinear taps are periodic. Rows:
  1080->640 has scale 27/16, so each 216-row input strip (8 periods —
  keeps Mosaic's 8-sublane block rule) blends into 128 output rows
  through a constant block-diagonal matrix — an MXU matmul over the
  full row width. Columns: 1920->640 has scale 3, whose
  half-pixel-center source (x+0.5)*3 - 0.5 = 3x+1 is integral — a
  single-tap subsample.
* The column resample on a plane is the SAME small
  [lcm(px_in,128), ...] matrix (here [384, 128]) applied to each lane
  block — an MXU matmul instead of an (expensive) lane-wise gather.
  Tap weights for 27/16-style scales are exact multiples of 1/32, so
  the matrices are exact in bf16 and the matmuls run at the bf16 MXU
  rate with f32 accumulation.
* Normalization is a per-plane scalar affine epilogue
  (`z/(255*std_c) - mean_c/std_c`) before the single bf16 rounding —
  the kernel's f32 intermediate is strictly more precise than the
  previous bf16-compute resize.

Semantics: EXACT cv2 INTER_LINEAR (2-tap, half-pixel centers) — closer
to the reference's host preprocess than `jax.image.resize('linear')`,
whose default antialias widens the taps on downscale. Callers fall back
to `jax.image.resize` when `supports()` is False (non-downscale or
impractically large tap periods).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_MAX_ROW_PERIOD = 64          # y-periods beyond this: fall back
_MAX_LANE_BLOCK = 4608        # x lane-block beyond this: fall back
_TARGET_BLOCK_ROWS_OUT = 96   # aim for ~this many output rows per step


def _axis_taps(n_in: int, n_out: int) -> Optional[np.ndarray]:
    """One period of 2-tap bilinear (cv2 INTER_LINEAR) weights for a
    downscale n_in -> n_out: [pin, pout] with pin = n_in/gcd. Each output
    period depends only on its own input period (holds for any pin >=
    pout). None if not a downscale."""
    if n_out <= 0 or n_in < n_out:
        return None
    g = math.gcd(n_in, n_out)
    pin, pout = n_in // g, n_out // g
    w = np.zeros((pin, pout), np.float32)
    for r in range(pout):
        f = (r + 0.5) * pin / pout - 0.5
        i0 = int(np.floor(f))
        frac = f - i0
        w[i0, r] += 1.0 - frac
        if frac > 0.0:
            w[min(i0 + 1, pin - 1), r] += frac
    return w


def _pick_k(n_periods: int, py_in: int, py_out: int) -> Optional[int]:
    """Periods per grid step. The input strip (py_in*k rows) must satisfy
    the Mosaic block rule (divisible by 8) and the output strip should hit
    the bf16 sublane tile (16); prefer the largest such k within the row
    budget."""
    candidates = [k for k in range(1, n_periods + 1)
                  if n_periods % k == 0
                  and (py_in * k) % 8 == 0 and (py_out * k) % 16 == 0
                  and py_out * k <= max(_TARGET_BLOCK_ROWS_OUT, py_out * 8)]
    return max(candidates) if candidates else None


def supports(in_hw: Tuple[int, int], out_hw: Tuple[int, int]) -> bool:
    """True when the fused kernel handles this shape pair."""
    h0, w0 = in_hw
    h, w = out_hw
    wy = _axis_taps(h0, h)
    wx = _axis_taps(w0, w)
    if wy is None or wx is None:
        return False
    py_in, py_out = wy.shape
    if py_in > _MAX_ROW_PERIOD or h0 % py_in != 0:
        return False
    if _pick_k(h // py_out, py_in, py_out) is None:
        return False
    px_in = wx.shape[0]
    lane_block = px_in * 128 // math.gcd(px_in, 128)
    if lane_block > _MAX_LANE_BLOCK or w0 % lane_block != 0:
        return False
    return True


@functools.partial(jax.jit,
                   static_argnames=("out_hw", "out_dtype", "interpret"))
def resize_normalize_u8(frames: jnp.ndarray, out_hw: Tuple[int, int],
                        out_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jnp.ndarray:
    """uint8 RGB [B, H0, W0, 3] -> resized, imagenet-normalized
    [B, H, W, 3]. Caller must check `supports((H0, W0), out_hw)`."""
    b, h0, w0, c = frames.shape
    assert c == 3, "RGB frames expected"
    h, w = out_hw
    if not supports((h0, w0), out_hw):
        raise ValueError(f"unsupported resize {(h0, w0)} -> {out_hw}; "
                         "use the jax.image.resize fallback")

    wy_p = _axis_taps(h0, h)              # [py_in, py_out]
    wx_p = _axis_taps(w0, w)              # [px_in, px_out]
    py_in, py_out = wy_p.shape
    px_in, px_out = wx_p.shape

    # ---- work on the array's NATIVE channel-planar device layout.
    # XLA stores uint8 NHWC images as {2,1,3,0:T(8,128)(4,1)} — three
    # [H0, W0] planes per image. Any reshape that interleaves channels is
    # a physical re-tiling copy (measured 8.8 ms for the bs128 input — more
    # than the whole kernel), so the kernel consumes [B, 3, H0, W0] planes
    # (a free relabeling of the same bytes) and emits [B, 3, H, W] planes
    # (relabeled back to NHWC for the consumer, again layout-native).
    planes = jnp.transpose(frames, (0, 3, 1, 2))

    # ---- grid: k whole y-periods per step
    n_periods = h // py_out
    k = _pick_k(n_periods, py_in, py_out)
    assert k is not None  # guaranteed by supports()
    rows_in, rows_out = py_in * k, py_out * k
    n_steps = n_periods // k
    grid = (b, 3, n_steps)

    # ---- y-blend: block-diagonal [rows_out, rows_in]
    wy = np.zeros((rows_out, rows_in), np.float32)
    for i in range(k):
        wy[i * py_out:(i + 1) * py_out, i * py_in:(i + 1) * py_in] = wy_p.T

    # ---- x-resample matrix on one lane block of a plane (pixels, not
    # bytes): lane_block = lcm(px_in, 128) input pixels -> out_block
    # output pixels, identical for every block.
    lane_block = px_in * 128 // math.gcd(px_in, 128)
    out_block = lane_block // px_in * px_out
    sx = np.zeros((lane_block, out_block), np.float32)
    for g in range(lane_block // px_in):
        for r in range(px_out):
            for i0 in range(px_in):
                if wx_p[i0, r] != 0.0:
                    sx[g * px_in + i0, g * px_out + r] = wx_p[i0, r]
    n_blocks = w0 // lane_block

    # normalize = z*scale_c - shift_c per channel plane, applied as a
    # scalar epilogue (channel = grid index). Keeping 1/(255*std) OUT of
    # the tap matrices keeps them exact in bf16 (taps are small dyadic
    # rationals for scales like 27/16) — the difference between bf16 and
    # f32 MXU rate here.
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    affine = np.stack([1.0 / (255.0 * std), mean / std], axis=1)  # [3, 2]

    def _bf16_exact(a):
        return bool(np.all(a.astype(jnp.bfloat16).astype(np.float32) == a))

    mat_dtype = jnp.bfloat16 if (_bf16_exact(wy) and _bf16_exact(sx)) \
        else jnp.float32

    wy_j = jnp.asarray(wy, mat_dtype)
    sx_j = jnp.asarray(sx, mat_dtype)
    affine_j = jnp.asarray(affine)

    def kernel(affine_ref, in_ref, wy_ref, sx_ref, out_ref):
        # Mosaic has no direct u8->float cast; widen via int32 first.
        # bf16 is exact for 0..255; the bf16 rounding of the y-blend
        # result (|y| <= 255, rel eps 2^-9) costs < 0.004 normalized
        # units — far inside the cv2-vs-float rounding band.
        x = in_ref[0, 0].astype(jnp.int32).astype(mat_dtype)
        y = jnp.dot(wy_ref[:, :], x,
                    preferred_element_type=jnp.float32)   # [rows_out, w0]
        y = y.astype(mat_dtype)
        parts = []
        for i in range(n_blocks):
            blk = y[:, i * lane_block:(i + 1) * lane_block]
            parts.append(jnp.dot(blk, sx_ref[:, :],
                                 preferred_element_type=jnp.float32))
        z = jnp.concatenate(parts, axis=1)                # [rows_out, w]
        c = pl.program_id(1)
        out_ref[0, 0] = (z * affine_ref[c, 0]
                         - affine_ref[c, 1]).astype(out_dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, rows_in, w0),
                             lambda bi, ci, pi, aff: (bi, ci, pi, 0)),
                pl.BlockSpec((rows_out, rows_in),
                             lambda bi, ci, pi, aff: (0, 0)),
                pl.BlockSpec((lane_block, out_block),
                             lambda bi, ci, pi, aff: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, rows_out, w),
                                   lambda bi, ci, pi, aff: (bi, ci, pi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 3 * n_steps * (rows_out * rows_in * w0
                                         + rows_out * w0 * out_block),
            bytes_accessed=b * h0 * w0 * 3 + 2 * b * h * w * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(affine_j, planes, wy_j, sx_j)
    # planes [B, 3, H, W] -> NHWC view (layout-native relabeling)
    return jnp.transpose(out, (0, 2, 3, 1))


def resize_normalize_reference(frames, out_hw, dtype=jnp.float32):
    """Pure-XLA 2-tap periodic resize + normalize (same math as the
    kernel, no fusion) — the numeric oracle for tests and the fallback
    for shapes `supports()` rejects when exact cv2 taps are still wanted."""
    b, h0, w0, _ = frames.shape
    h, w = out_hw
    wy = _axis_taps(h0, h)
    wx = _axis_taps(w0, w)
    if wy is None or wx is None:
        raise ValueError("downscale only")
    py_in, py_out = wy.shape
    px_in, px_out = wx.shape
    x = frames.astype(dtype)
    # f32 accumulation to match the Pallas kernel's epilogue (the taps
    # contract over only 2 elements, so this costs nothing; without it the
    # TPU default would accumulate these in bf16 and the mesh-sharded
    # fallback would drift from the single-chip kernel path by LSBs)
    x = x.reshape(b, h0, w0 // px_in, px_in, 3)
    x = jnp.einsum("bhgpc,pr->bhgrc", x, jnp.asarray(wx, dtype),
                   preferred_element_type=jnp.float32).astype(dtype)
    x = x.reshape(b, h0, w, 3)
    x = x.reshape(b, h0 // py_in, py_in, w, 3)
    x = jnp.einsum("bgpwc,pr->bgrwc", x, jnp.asarray(wy, dtype),
                   preferred_element_type=jnp.float32).astype(dtype)
    x = x.reshape(b, h, w, 3)
    scale = 1.0 / (255.0 * jnp.asarray(IMAGENET_STD, dtype))
    shift = jnp.asarray(IMAGENET_MEAN, dtype) / jnp.asarray(IMAGENET_STD,
                                                            dtype)
    return x * scale - shift
