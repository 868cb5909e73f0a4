"""Pallas TPU kernel: both detection towers fused, one level per call.

The XLA composition of the detection head's towers (heads/detection.py,
reference detection.py:11-83) is 8 separable-conv passes per level —
(3 tower layers + header) x (regressor + classifier) — and every dw/pw conv
re-enters HBM: at bs128 that is ~8 GB of intermediate traffic for ~0.2 GFLOP
of useful pointwise work per image, measured 12.5 ms (stage mix in NOTES.md)
against a ~1 ms input+output roofline.

TPU-first design: one kernel per pyramid level, grid over the batch. A whole
level of one image (80^2 x 112ch = 1.4 MB bf16 at the largest) sits in VMEM
while BOTH towers run back to back — the level features are read from HBM
once (the towers share their input), every intermediate stays in VMEM, and
the only writes are the two header outputs, packed into one
[H, W, O_reg + O_cls] tensor so the lane-padding cost is paid once.

In-kernel building blocks (C on lanes, W on sublanes, H outer) are shared
with ops/pallas_bifpn.py: depthwise 3x3 as 9 zero-filled shifted FMAs,
pointwise as [H*W, C] x [C, O] MXU matmuls (per-row matmuls on the
ragged-width small levels), hand-rolled swish. Per-level BatchNorm
(detection.py's bn_{lvl}_{i}, m=0.01/eps=1e-3) is an inference affine,
applied in f32 between the pointwise bias and the swish — the level's
scale/shift rows are passed in, so the tower weights stay shared across
levels exactly like the XLA path. The pointwise epilogue (bias + BN affine +
swish + cast) runs on row chunks to bound the f32 transient.

Inference only; training uses the XLA composition. Parity + identical
variable trees are verified in tests/test_pallas_tower.py (interpret mode).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydranet_tpu.ops.pallas_bifpn import _dw3x3, _swish

# rows per pointwise chunk: bounds the f32 matmul transient to
# ~CHUNK_ROWS * W * 128 * 4 bytes (P3: 16*80*128*4 = 655 KB)
_CHUNK_ROWS = 16


def _pw_rows(y3, pw, epilogue):
    """Pointwise conv of [H, W, C] by [C, O] with a per-chunk f32 epilogue,
    returning [H, W, O] in the input dtype. Row-chunked so the f32
    intermediate never exceeds one chunk; ragged widths (W % 8 != 0, the
    10/5-wide levels) fall back to one matmul per row."""
    h, w, c = y3.shape
    o = pw.shape[-1]
    dt = y3.dtype
    if w % 8 == 0:
        outs = []
        step = _CHUNK_ROWS
        for r0 in range(0, h, step):
            rows = min(step, h - r0)
            z = jnp.dot(y3[r0:r0 + rows].reshape(rows * w, c), pw,
                        preferred_element_type=jnp.float32)
            z = epilogue(z)
            outs.append(z.astype(dt).reshape(rows, w, o))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    rows = []
    for i in range(h):
        z = jnp.dot(y3[i], pw, preferred_element_type=jnp.float32)
        rows.append(epilogue(z).astype(dt))
    return jnp.stack(rows, axis=0)


def tower_level(x: jnp.ndarray,
                taps: jnp.ndarray, pws: jnp.ndarray, pbs: jnp.ndarray,
                bn_scale: jnp.ndarray, bn_shift: jnp.ndarray,
                taps_h: jnp.ndarray, pw_h: jnp.ndarray, pb_h: jnp.ndarray,
                out_channels: Tuple[int, int],
                interpret: bool = False) -> jnp.ndarray:
    """Run both towers over one level.

    x:          [B, H, W, C]
    taps:       [2, L, 9, C]   depthwise taps per tower/layer
    pws:        [2, L, C, C]   pointwise kernels
    pbs:        [2, L, C]      pointwise biases, f32
    bn_scale:   [2, L, C]      THIS level's folded BN scale, f32
    bn_shift:   [2, L, C]      THIS level's folded BN shift, f32
    taps_h:     [2, 9, C]      header depthwise taps
    pw_h:       [2, C, Omax]   header pointwise kernels (lane-padded to the
                               larger of the two header widths)
    pb_h:       [2, Omax]      header biases, f32
    out_channels: (O_reg, O_cls) true header widths

    Returns [B, H, W, O_reg + O_cls]: regression then classification,
    packed so the 128-lane VMEM padding is paid once.
    """
    b, h, w, c = x.shape
    o_reg, o_cls = out_channels
    n_layers = taps.shape[1]
    dt = x.dtype

    def kernel(x_ref, taps_r, pws_r, pbs_r, bns_r, bnt_r,
               tapsh_r, pwh_r, pbh_r, out_ref):
        outs = []
        for t, o_t in enumerate((o_reg, o_cls)):
            y = x_ref[0]
            for i in range(n_layers):
                y = _dw3x3(y, taps_r[t, i])
                pb = pbs_r[t, i].astype(jnp.float32)
                s = bns_r[t, i].astype(jnp.float32)
                sh = bnt_r[t, i].astype(jnp.float32)

                def epi(z, pb=pb, s=s, sh=sh):
                    return _swish((z + pb[None, :]) * s[None, :]
                                  + sh[None, :])

                y = _pw_rows(y, pws_r[t, i], epi)
            y = _dw3x3(y, tapsh_r[t])
            pbh = pbh_r[t, :o_t].astype(jnp.float32)
            outs.append(_pw_rows(y, pwh_r[t, :, :o_t],
                                 lambda z, pbh=pbh: z + pbh[None, :]))
        out_ref[0] = jnp.concatenate(outs, axis=-1)

    in_specs = [pl.BlockSpec((1, h, w, c), lambda bb: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
    out_spec = pl.BlockSpec((1, h, w, o_reg + o_cls),
                            lambda bb: (bb, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    pw_flops = 2 * h * w * c * (n_layers * c + (o_reg + o_cls) / 2)
    dw_flops = 2 * 9 * h * w * c * (n_layers + 1)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, o_reg + o_cls), dt),
        cost_estimate=pl.CostEstimate(
            flops=int(b * 2 * (pw_flops + dw_flops)),
            bytes_accessed=int(b * h * w * (c + o_reg + o_cls) * 2),
            transcendentals=int(b * 2 * n_layers * h * w * c),
        ),
        interpret=interpret,
    )(x, taps, pws, pbs, bn_scale, bn_shift, taps_h, pw_h, pb_h)


def det_towers(feats: Sequence[jnp.ndarray],
               reg: dict, cls: dict,
               num_anchors: int,
               interpret: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused regressor+classifier over all pyramid levels.

    feats: per-level [B, H_l, W_l, C]. reg/cls: per-tower param dicts with
    'taps' [L,9,C], 'pw' [L,C,C], 'pb' [L,C], 'bn_scale'/'bn_shift'
    [n_levels,L,C] (f32, folded), 'taps_h' [9,C], 'pw_h' [C,O], 'pb_h' [O].

    Returns (regression [B, sum(HWA), 4], classification [B, sum(HWA), K])
    matching heads/detection.py::_Tower's flatten+concat (pre-sigmoid).
    """
    o_reg = reg["pw_h"].shape[-1]
    o_cls = cls["pw_h"].shape[-1]
    o_max = max(o_reg, o_cls)
    dt = feats[0].dtype

    def pad_h(p):
        return jnp.pad(p["pw_h"], ((0, 0), (0, o_max - p["pw_h"].shape[-1])))

    taps = jnp.stack([reg["taps"], cls["taps"]]).astype(dt)
    pws = jnp.stack([reg["pw"], cls["pw"]]).astype(dt)
    pbs = jnp.stack([reg["pb"], cls["pb"]]).astype(jnp.float32)
    taps_h = jnp.stack([reg["taps_h"], cls["taps_h"]]).astype(dt)
    pw_h = jnp.stack([pad_h(reg), pad_h(cls)]).astype(dt)
    pb_h = jnp.stack([
        jnp.pad(reg["pb_h"], (0, o_max - o_reg)),
        jnp.pad(cls["pb_h"], (0, o_max - o_cls)),
    ]).astype(jnp.float32)

    regs, clss = [], []
    for lvl, x in enumerate(feats):
        bns = jnp.stack([reg["bn_scale"][lvl], cls["bn_scale"][lvl]]) \
            .astype(jnp.float32)
        bnt = jnp.stack([reg["bn_shift"][lvl], cls["bn_shift"][lvl]]) \
            .astype(jnp.float32)
        out = tower_level(x, taps, pws, pbs, bns, bnt, taps_h, pw_h, pb_h,
                          (o_reg, o_cls), interpret=interpret)
        b = out.shape[0]
        regs.append(out[..., :o_reg].reshape(b, -1, o_reg // num_anchors))
        clss.append(out[..., o_reg:].reshape(b, -1, o_cls // num_anchors))
    return jnp.concatenate(regs, axis=1), jnp.concatenate(clss, axis=1)


def supports(sizes: Sequence[Tuple[int, int]], c: int, n_layers: int,
             o_reg: int, o_cls: int, dtype) -> bool:
    """VMEM feasibility for the largest per-level call.

    Calibrated against the measured Mosaic scoped-vmem stack: the bf16
    80x80x112 level compiles to a 25.01 MB scoped allocation (hardware
    chain v5, artifacts/bench_det_tower.log) against the 16 MB limit —
    the dw3x3 f32 accumulator planes and the concat temporaries in
    `_pw_rows`/the tower epilogue dominate, so working planes are
    counted at f32 width regardless of the run dtype."""
    if c % 8 != 0:
        return False
    el = jnp.dtype(dtype).itemsize
    lanes = -(-c // 128) * 128
    o_lanes = -(-(o_reg + o_cls) // 128) * 128
    h, w = max(sizes, key=lambda s: s[0] * s[1])
    plane = h * w * lanes * el
    plane_f32 = h * w * lanes * 4
    out_plane = h * w * o_lanes * el
    params = 2 * (n_layers * c * c + c * max(o_reg, o_cls)
                  + (n_layers + 1) * 9 * c) * el
    # double-buffered in/out blocks + ~4 live f32-width working planes
    # (dw accumulators, chunk-concat temporaries) + one f32 pw chunk
    chunk = _CHUNK_ROWS * w * 128 * 4
    need = 2 * plane + 2 * out_plane + 4 * plane_f32 + chunk + 2 * params
    return need < 14 * 1024 * 1024
