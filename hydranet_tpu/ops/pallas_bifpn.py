"""Pallas TPU kernel: whole BiFPN cell(s) in VMEM.

The XLA composition of one repeat cell (models/bifpn.py) is ~50 small HLOs
per cell — 8 separable-conv blocks plus fusions, swishes, nearest-up2s and
3x3/s2 maxpools over five pyramid levels (80^2..5^2 x 112ch). Measured
6.1 ms/cell at bs128 on v5e against a ~1 ms HBM roofline: every node
re-enters HBM, and the small levels are dispatch/fusion-bound.

TPU-first design: ALL five levels of one image total ~1.9 MB bf16 — they
fit in VMEM together. One kernel, grid over the batch, computes entire
cells back to back: the only HBM traffic is reading the cell-stack inputs
and writing the final outputs; every intermediate level lives in VMEM.

In-kernel building blocks (C channels on lanes, W on sublanes, H outer):
- pointwise conv: ONE [H*W, C] x [C, C] MXU matmul per node ([H,W,C] ->
  [H*W,C] is physically free when W%8==0; P6/P7 are tiny).
- depthwise 3x3 (TF-SAME zero pad): 9 shifted multiply-adds; row shifts
  are outer-dim slices, column shifts are sublane slices with a zero
  column concat.
- nearest up2 / maxpool-3x3-s2 stride-2 column access: Mosaic supports
  neither strided sublane slices nor gathers nor lane<->sublane reshape
  casts, so the monotone index maps (j -> 2j and j -> j//2) are done as
  log2(W) masked shifts (shift = slice+concat, mask = iota bit test);
  row-side duplication/selection uses outer-dim stack/phase reshapes,
  which are free.
- maxpool keeps the reference's zero-pad-participates semantics
  (common.py:117-152) because the shifted taps zero-fill.

BatchNorm (inference affine) is folded into the pointwise kernel/bias and
the fast-attention fusion weights are normalized OUTSIDE the kernel, so
the kernel consumes plain arrays. Inference only — training uses the XLA
composition (this keeps autodiff and batch-stat updates out of scope).

Parity: exact node wiring of models/bifpn.py (reference bifpn.py:156-233);
verified in tests/test_pallas_bifpn.py in interpret mode.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# level sizes are static per call; C = num channels
LevelHW = Tuple[int, int]


def _to3d(x, h, w, c):
    return x.reshape(h, w, c)


def _flat(x, h, w, c):
    return x.reshape(h * w, c)


def _shift_rows(x3, dy):
    """x3 [H, W, C] shifted so out[i] = x[i+dy], zero rows outside."""
    if dy == 0:
        return x3
    h = x3.shape[0]
    if abs(dy) >= h:
        return jnp.zeros_like(x3)
    zero = jnp.zeros_like(x3[:abs(dy)])
    if dy > 0:
        return jnp.concatenate([x3[dy:], zero], axis=0)
    return jnp.concatenate([zero, x3[:h + dy]], axis=0)


def _shift_cols(x3, dx):
    """out[:, j] = x[:, j+dx], zero cols outside (sublane concat)."""
    if dx == 0:
        return x3
    w = x3.shape[1]
    if abs(dx) >= w:
        return jnp.zeros_like(x3)
    zero = jnp.zeros_like(x3[:, :abs(dx)])
    if dx > 0:
        return jnp.concatenate([x3[:, dx:], zero], axis=1)
    return jnp.concatenate([zero, x3[:, :w + dx]], axis=1)


def _dw3x3(x3, taps):
    """Depthwise 3x3, TF-SAME zero padding. taps [9, C] (row-major dy,dx
    in {-1,0,1}); x3 [H, W, C]."""
    acc = None
    i = 0
    for dy in (-1, 0, 1):
        xr = _shift_rows(x3, dy)
        for dx in (-1, 0, 1):
            t = _shift_cols(xr, dx) * taps[i][None, None, :]
            acc = t if acc is None else acc + t
            i += 1
    return acc


def _take_even_cols(x3, w2):
    """out[:, j] = x3[:, 2j] for j < w2 — a monotone sublane gather done
    as log2 masked left-shifts (Mosaic supports neither strided sublane
    slices nor gathers; shifts are slice+concat and masks are iota)."""
    y = x3
    col = jax.lax.broadcasted_iota(jnp.int32, x3.shape, 1)
    for k in range((max(w2 - 1, 1)).bit_length()):
        shifted = _shift_cols(y, 1 << k)
        y = jnp.where((col >> k) & 1 == 1, shifted, y)
    return y[:, :w2]


def _dup_cols(x3):
    """out[:, j] = x3[:, j // 2] (width doubles) — the inverse monotone
    gather, as log2 masked right-shifts applied most-significant-bit
    first."""
    h, w, c = x3.shape
    y = jnp.concatenate([x3, jnp.zeros_like(x3)], axis=1)  # [H, 2W, C]
    col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    s = col - col // 2                                     # shift per col
    for k in reversed(range(w.bit_length())):
        shifted = _shift_cols(y, -(1 << k))
        y = jnp.where((s >> k) & 1 == 1, shifted, y)
    return y


def _up2(x3):
    """Nearest 2x upsample of [H, W, C] -> [2H, 2W, C]."""
    h, w, c = x3.shape
    xc = _dup_cols(x3)                                 # [H, 2W, C]
    # rows: duplicate planes on the outer dim
    return jnp.stack([xc, xc], axis=1).reshape(2 * h, 2 * w, c)


def _maxpool3x3s2(x3):
    """Reference MaxPool2dStaticSamePadding(3, 2): zero-pad right/bottom
    by 1, 3x3/s2 VALID — zeros participate in the max. [H,W,C]->[H/2,W/2,C].
    The window taps are at offsets (0..2, 0..2) from the stride-2 anchor;
    zero-filled shifts reproduce the zero padding exactly."""
    h, w, c = x3.shape
    h2, w2 = h // 2, w // 2
    m = None
    for dy in range(3):
        xr = _shift_rows(x3, dy)
        for dx in range(3):
            t = _shift_cols(xr, dx)
            m = t if m is None else jnp.maximum(m, t)
    # rows 2i via outer reshape phase-select, cols 2j via log-shift gather
    m = m.reshape(h2, 2, w, c)[:, 0]
    return _take_even_cols(m, w2)


def _swish(x):
    # hand-rolled x*sigmoid(x): Mosaic's `logistic` lowering emits a
    # mixed-dtype vector.broadcast for bf16 inputs (verifier error)
    one = jnp.asarray(1.0, x.dtype)
    return x / (one + jnp.exp(-x))


def _node(x3, taps, pw, pb, h, w, c):
    """One fusion node body: swish -> depthwise 3x3 -> pointwise (+folded
    BN affine). x3 is the already-fused input [H, W, C]; returns [H,W,C]."""
    y = _dw3x3(_swish(x3), taps)
    if w % 8 == 0:
        # [H, W, C] -> [H*W, C] is physically free (whole sublane tiles)
        z = jnp.dot(_flat(y, h, w, c), pw,
                    preferred_element_type=jnp.float32)
        z = z + pb[None, :].astype(jnp.float32)
        return _to3d(z.astype(x3.dtype), h, w, c)
    # ragged-width levels (P6/P7: 10, 5): Mosaic rejects the flatten next
    # to a matmul; a handful of per-row matmuls is free at these sizes
    rows = []
    for i in range(h):
        zi = jnp.dot(y[i], pw, preferred_element_type=jnp.float32)
        rows.append((zi + pb[None, :].astype(jnp.float32)
                     ).astype(x3.dtype))
    return jnp.stack(rows, axis=0)


def _cell_body(levels, p4b, p5b, taps, pws, pbs, fw, sizes, c):
    """One BiFPN cell. levels = [p3..p7] ([H,W,C] values); p4b/p5b are the
    bottom-up lateral inputs (differ from p4/p5 only in the first cell).
    taps [8,9,C], pws [8,C,C], pbs [8,C], fw [8,3] f32 normalized fusion
    weights. Node order: conv6_up, conv5_up, conv4_up, conv3_up,
    conv4_down, conv5_down, conv6_down, conv7_down (bifpn.py:177-231)."""
    p3, p4, p5, p6, p7 = levels
    (h3, w3), (h4, w4), (h5, w5), (h6, w6), (h7, w7) = sizes

    def fuse2(n, a, b):
        return fw[n, 0] * a.astype(jnp.float32) + \
            fw[n, 1] * b.astype(jnp.float32)

    def fuse3(n, a, b, d):
        return fuse2(n, a, b) + fw[n, 2] * d.astype(jnp.float32)

    dt = p3.dtype

    p6_up = _node(fuse2(0, p6, _up2(p7)).astype(dt),
                  taps[0], pws[0], pbs[0], h6, w6, c)
    p5_up = _node(fuse2(1, p5, _up2(p6_up)).astype(dt),
                  taps[1], pws[1], pbs[1], h5, w5, c)
    p4_up = _node(fuse2(2, p4, _up2(p5_up)).astype(dt),
                  taps[2], pws[2], pbs[2], h4, w4, c)
    p3_out = _node(fuse2(3, p3, _up2(p4_up)).astype(dt),
                   taps[3], pws[3], pbs[3], h3, w3, c)
    p4_out = _node(fuse3(4, p4b, p4_up, _maxpool3x3s2(p3_out)).astype(dt),
                   taps[4], pws[4], pbs[4], h4, w4, c)
    p5_out = _node(fuse3(5, p5b, p5_up, _maxpool3x3s2(p4_out)).astype(dt),
                   taps[5], pws[5], pbs[5], h5, w5, c)
    p6_out = _node(fuse3(6, p6, p6_up, _maxpool3x3s2(p5_out)).astype(dt),
                   taps[6], pws[6], pbs[6], h6, w6, c)
    p7_out = _node(fuse2(7, p7, _maxpool3x3s2(p6_out)).astype(dt),
                   taps[7], pws[7], pbs[7], h7, w7, c)
    return p3_out, p4_out, p5_out, p6_out, p7_out


def bifpn_cells(levels: Sequence[jnp.ndarray],
                p4b: jnp.ndarray, p5b: jnp.ndarray,
                taps: jnp.ndarray, pws: jnp.ndarray, pbs: jnp.ndarray,
                fweights: jnp.ndarray,
                sizes: Tuple[LevelHW, ...],
                interpret: bool = False) -> List[jnp.ndarray]:
    """Run `n_cells` BiFPN cells fully in VMEM.

    levels: 5 arrays [B, H_l, W_l, C] (p3..p7 inputs to the FIRST cell)
    p4b, p5b: bottom-up lateral inputs for the first cell (pass p4/p5
        again for a stack that starts with a repeat cell)
    taps:     [n_cells, 8, 9, C]    depthwise taps
    pws:      [n_cells, 8, C, C]    pointwise kernels (BN scale folded)
    pbs:      [n_cells, 8, C]       pointwise bias (BN shift folded), f32
    fweights: [n_cells, 8, 3]       normalized fusion weights, f32
    """
    b = levels[0].shape[0]
    c = levels[0].shape[-1]
    n_cells = taps.shape[0]
    dt = levels[0].dtype

    def kernel(*refs):
        in_refs = refs[:7]
        taps_r, pws_r, pbs_r, fw_r = refs[7:11]
        out_refs = refs[11:16]
        cur = [r[0] for r in in_refs[:5]]
        p4b_v = in_refs[5][0]
        p5b_v = in_refs[6][0]
        for k in range(n_cells):
            cur = _cell_body(cur, p4b_v if k == 0 else cur[1],
                             p5b_v if k == 0 else cur[2],
                             taps_r[k], pws_r[k], pbs_r[k], fw_r[k],
                             sizes, c)
            cur = list(cur)
        for r, x in zip(out_refs, cur):
            r[0] = x

    def _block(i):
        return pl.BlockSpec((1,) + sizes[i] + (c,),
                            lambda bb: (bb, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    flat_levels = [x for x in levels]
    in_specs = [_block(i) for i in range(5)] + [_block(1), _block(2)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    out_specs = [_block(i) for i in range(5)]
    out_shape = [jax.ShapeDtypeStruct((b,) + sizes[i] + (c,), dt)
                 for i in range(5)]

    pw_flops = sum(h * w for h, w in sizes) * c * c * 2
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=b * n_cells * 8 * pw_flops // 5,
            bytes_accessed=int(2 * b * sum(h * w for h, w in sizes) * c * 2),
            transcendentals=b * n_cells * sum(h * w for h, w in sizes) * c,
        ),
        interpret=interpret,
    )(*flat_levels, p4b, p5b, taps, pws, pbs, fweights)


def supports(sizes: Sequence[LevelHW], c: int, n_cells: int,
             dtype) -> bool:
    """VMEM feasibility + shape sanity for the fused cell kernel."""
    if n_cells < 1:
        return False
    if any((h % 2 or w % 2) for h, w in sizes[:-1]):
        return False
    for (h, w), (h2, w2) in zip(sizes[:-1], sizes[1:]):
        if h != 2 * h2 or w != 2 * w2:
            return False
    el = jnp.dtype(dtype).itemsize
    level_bytes = sum(h * w for h, w in sizes) * c * el
    p3_bytes = sizes[0][0] * sizes[0][1] * c * el
    lat_bytes = (sizes[1][0] * sizes[1][1] + sizes[2][0] * sizes[2][1]) \
        * c * el
    params = n_cells * 8 * (c * c + 10 * c) * el
    # double-buffered in (5 levels + 2 laterals) and out (5 levels), plus
    # ~2 live P3-sized intermediates and the folded params. The flagship
    # config (80^2..5^2 x 112ch, 3 cells) totals ~13.9 MB and compiles on
    # v5e (16 MB VMEM); the margin guards configs near the edge.
    need = 2 * (level_bytes + lat_bytes) + 2 * level_bytes \
        + 2 * p3_bytes + params
    return need < 15 * 1024 * 1024 and c % 8 == 0
