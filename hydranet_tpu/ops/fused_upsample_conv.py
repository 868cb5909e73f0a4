"""Fused nearest-upsample(x2) + reflection-pad(1) + 3x3 conv.

The seg decoder's hot tail (reference segmentation.py:84-105: every stage does
`upsample -> [concat skip] -> reflection-padded 3x3 conv`) materializes a 2x2
nearest-upsampled tensor (840 MB at bs16/640^2/64ch/bf16) and a padded copy
before each conv — pure HBM traffic. On TPU this dominates the whole head.

Mathematical identity used here: for y = conv3x3(reflect_pad(up2(x))),
each output phase (di, dj) in {0,1}^2 reads x at

    out[2i+di, 2j+dj] = sum_{u,v} W[u, v] * x[(2i+di+u-1)//2, (2j+dj+v-1)//2]

and the floor-div collapses the 3x3 taps onto a 2x2 neighbourhood of x with
phase-dependent summed kernels:

    phase di=0 rows: {i-1: W[0], i: W[1]+W[2]}
    phase di=1 rows: {i: W[0]+W[1], i+1: W[2]}

Boundary check: reflect-pad on the upsampled grid maps pad row -1 to
up-row 1 = x[0] and pad row 2H to up-row 2H-2 = x[H-1] — exactly EDGE
(replicate) padding of x for the phase convs. So the whole stage becomes ONE
3x3->(2x2 per phase) conv at the LOW resolution producing 4*C_out channels,
followed by a depth_to_space interleave: 4/9 of the MACs and no upsampled
intermediate. Exact to float-associativity; verified against the reference
composition in tests/test_fused_ops.py.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _phase_kernels(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] -> [2, 2, Cin, 4*Cout] phase-collapsed kernels.

    Output channel layout: phase-major [(di, dj) = (0,0), (0,1), (1,0), (1,1)]
    so a depth_to_space reshape interleaves correctly.
    """
    w = kernel
    # row collapse: phase 0 -> taps (i-1, i) with weights (W0, W1+W2)
    #               phase 1 -> taps (i, i+1) with weights (W0+W1, W2)
    r0 = jnp.stack([w[0], w[1] + w[2]], axis=0)        # [2, 3, Cin, Cout]
    r1 = jnp.stack([w[0] + w[1], w[2]], axis=0)
    # column collapse on each
    def cc(r):
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)  # [2,2,Cin,Cout]
        c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
        return c0, c1
    k00, k01 = cc(r0)
    k10, k11 = cc(r1)
    return jnp.concatenate([k00, k01, k10, k11], axis=-1)  # [2,2,Cin,4*Cout]


def _composed_4tap_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] -> [4, 4, Cin, Cout]: conv3x3 composed with the
    nearest-up2 (= transposed conv by a 2x2 ones kernel). K4 row taps are
    [W0, W0+W1, W1+W2, W2]; same collapse on columns."""
    k4r = jnp.stack([kernel[0], kernel[0] + kernel[1],
                     kernel[1] + kernel[2], kernel[2]], axis=0)
    return jnp.stack([k4r[:, 0], k4r[:, 0] + k4r[:, 1],
                      k4r[:, 1] + k4r[:, 2], k4r[:, 2]], axis=1)


def _dilated_form(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ONE input-dilated (transposed) conv: nearest-up2 is a transposed conv
    by a 2x2 ones kernel, so the whole stage collapses to
    conv(edge_pad1(x), K4, lhs_dilation=2, VALID) with the composed 4x4
    kernel — the output comes out ALREADY interleaved at 2x resolution."""
    pk = _composed_4tap_kernel(kernel)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp, pk, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def _phase_form(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Phase-collapsed 2x2 conv producing 4*Cout phase channels at the low
    resolution, then a stack/transpose interleave."""
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    pk = _phase_kernels(kernel)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    y00 = y[:, :-1, :-1, 0 * cout:1 * cout]
    y01 = y[:, :-1, 1:, 1 * cout:2 * cout]
    y10 = y[:, 1:, :-1, 2 * cout:3 * cout]
    y11 = y[:, 1:, 1:, 3 * cout:4 * cout]
    out = jnp.stack([y00, y01, y10, y11], axis=-2)
    out = out.reshape(b, h, w, 2, 2, cout)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)


def _phase_logits_zsplit(x: jnp.ndarray, kernel: jnp.ndarray,
                         bias: jnp.ndarray) -> jnp.ndarray:
    """Phase logits [B, H+1, W+1, 4*Cout] via the z-split reassociation.

    The direct 2x2 phase conv contracts K=(2x2 taps x Cin)=4*Cin with only
    4*Cout output lanes — at Cout=5 that is 20/128 lanes (~15% MXU lane
    utilization, ~9 TF/s measured). Reassociating per row tap u:

        z[h', w, (u, pc)] = sum_{v, cin} pk[u, v, cin, pc] * xp[h', w+v, cin]
        y[h, w, pc]       = z[h, w, :4*Cout] + z[h+1, w, 4*Cout:]

    turns it into a 1x2 conv with K=(2 col-taps x Cin)=128 at Cin=64
    (exactly one K tile) and N=8*Cout=40 lanes (2.7x the utilization), plus
    one shifted row add. Same products and adds — exact to float
    associativity (tests/test_fused_ops.py)."""
    pk = _phase_kernels(kernel)                    # [2, 2, Cin, 4*Cout]
    k2 = jnp.concatenate([pk[0][None], pk[1][None]], axis=-1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        xp, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)            # [B, H+2, W+1, 8*Cout]
    n = 4 * kernel.shape[-1]
    y = z[:, :-1, :, :n] + z[:, 1:, :, n:]
    return y + jnp.tile(bias, 4).astype(y.dtype)


def upsample2x_conv3x3_phase_logits(x: jnp.ndarray, kernel: jnp.ndarray,
                                    bias: jnp.ndarray) -> jnp.ndarray:
    """Phase logits [B, H+1, W+1, 4*Cout] of conv3x3(reflect_pad(up2(x))) —
    the full-resolution logits NEVER materialize. Full-res pixel
    (2i+di, 2j+dj) corresponds to phase (di, dj) (phase-major channel
    blocks) at cell offset given by `phase_slices`. Train-time analogue of
    the emit_argmax decode: at Cout=5 the full-res tensor lane-pads
    5 -> 128 (6.4 GB physical at bs64), and both the loss read and the
    backward cotangent pay it; the phase tensor is 20 channels once."""
    pk = _phase_kernels(kernel)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + jnp.tile(bias, 4).astype(y.dtype)


def phase_slices(z: jnp.ndarray, cout: int):
    """The four exact phase views of `upsample2x_conv3x3_phase_logits`
    output: [(di, dj), logits [B, H, W, cout]] in phase-major order."""
    return [((0, 0), z[:, :-1, :-1, 0 * cout:1 * cout]),
            ((0, 1), z[:, :-1, 1:, 1 * cout:2 * cout]),
            ((1, 0), z[:, 1:, :-1, 2 * cout:3 * cout]),
            ((1, 1), z[:, 1:, 1:, 3 * cout:4 * cout])]


def upsample2x_conv3x3_wpack_logits(x: jnp.ndarray, kernel: jnp.ndarray,
                                    bias: jnp.ndarray, g: int = 6):
    """W-packed phase logits: ONE stride-(1, g) conv whose kernel embeds
    the phase kernels at per-group column offsets (zero taps elsewhere)
    emits yw[b, h', wgi, gi*4*Cout + pc] = phase_logits[b, h', wgi*g + gi,
    pc] EXACTLY — the [B, H+1, W+1, 4*Cout] phase tensor (whose 4*Cout=20
    minor dim lane-pads to 128 on TPU) never exists; the packed minor dim
    is g*4*Cout (120/128 lanes at g=6). Ragged tail columns are edge-
    padded on input and carry garbage logits in groups past W — callers
    slice (argmax) or ignore-mask (CE) them. Returns (yw [B, H+1, WG,
    g*4*Cout], WG = ceil((W+1)/g))."""
    _, _, w, cin = x.shape
    cout = kernel.shape[-1]
    n = 4 * cout
    pk = _phase_kernels(kernel)                     # [2, 2, Cin, 4*Cout]
    # kernel [2, g+1, Cin, g*4*Cout]: block gi gets pk at col offset gi
    kw = jnp.zeros((2, g + 1, cin, g * n), pk.dtype)
    for gi in range(g):
        kw = kw.at[:, gi:gi + 2, :, gi * n:(gi + 1) * n].set(pk)
    wg = -(-(w + 1) // g)                           # ceil((W+1)/g) groups
    pad_w = (wg - 1) * g + (g + 1) - (w + 2)        # extra edge cols needed
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + pad_w), (0, 0)), mode="edge")
    yw = jax.lax.conv_general_dilated(
        xp, kw, (1, g), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)             # [B, H+1, wg, g*4*Cout]
    return yw + jnp.tile(bias, 4 * g).astype(yw.dtype), wg


def _wpack_argmax(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  g: int = 6) -> jnp.ndarray:
    """W-packed phase conv + argmax: the roofline fix for the final seg
    stage (argmax decode path).

    The plain phase conv emits 4*Cout=20 channels — lane-padded 20->128 on
    TPU, so the [B, 321, 321, 20] logits tensor physically round-trips
    ~6.8 GB of HBM at bs128 (written by the conv, re-read by the argmax):
    the stage measures 15.5 ms against a <1 ms MXU bound. Packing `g`
    consecutive output COLUMNS into the channel dim fixes the layout at
    the source: a stride-(1, g) conv whose kernel [2, g+1, Cin, g*4*Cout]
    embeds the phase kernels at column offset `t-gi` (zeros elsewhere)
    computes out[b, h, wg, (gi, pc)] = y[b, h, wg*g + gi, pc] EXACTLY
    (the zero taps add exact 0.0 terms; accumulation order inside a conv
    is unspecified either way). With g=6 the output is [B, 321, 54, 120]
    — 94% lane utilization, ~0.55 GB physical — and the argmax reduces it
    before anything fat exists. FLOPs grow (g+1)/2 x from the zero taps,
    but the stage sits >20x above its MXU bound, so trading dark FLOPs
    for layout is the right TPU call.

    Returns int32 class ids [B, 2H, 2W], same contract as
    upsample2x_conv3x3_argmax."""
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    yw, wg = upsample2x_conv3x3_wpack_logits(x, kernel, bias, g)
    # per-(group, phase) argmax at the packed layout, then unpack columns
    a = jnp.argmax(yw.reshape(b, h + 1, wg, g * 4, cout),
                   axis=-1).astype(jnp.int8)        # [B, H+1, wg, g*4]
    a = a.reshape(b, h + 1, wg * g, 4)[:, :, :w + 1]  # [B, H+1, W+1, 4]
    p00 = a[:, :-1, :-1, 0]
    p01 = a[:, :-1, 1:, 1]
    p10 = a[:, 1:, :-1, 2]
    p11 = a[:, 1:, 1:, 3]
    out = jnp.stack([p00, p01, p10, p11], axis=-1).reshape(b, h, w, 2, 2)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, 2 * w)
    return out.astype(jnp.int32)


def upsample2x_conv3x3_argmax(x: jnp.ndarray, kernel: jnp.ndarray,
                              bias: jnp.ndarray) -> jnp.ndarray:
    """argmax_c(conv3x3(reflect_pad(up2(x))) + bias) without EVER forming
    the 2x-resolution logits: phase-collapsed 2x2 conv at the low
    resolution (4*Cout channels), per-phase argmax, then an int8
    depth-to-space interleave of the CLASS IDS (52 MB vs 409 MB of bf16
    logits at bs128/640^2/5c). For tiny-Cout heads the XLA conv runs at
    ~9 TF/s either way (Cout lanes starve the MXU; NCHW variants just move
    the transpose cost around — measured 15.2-15.5 ms for every
    formulation of the conv at bs128), so skipping the full-res logits
    write + separate argmax pass is the available win (17.2 -> 15.3 ms).

    Returns int32 class ids [B, 2H, 2W] (int32 to match jnp.argmax
    consumers; the interleave itself runs on int8)."""
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    # W-packed strided-conv formulation (see _wpack_argmax): fixes the
    # 20->128 lane padding of the phase-logits round trip. HN_SEGFINAL_WPACK
    # sets the column-group size g (0 disables); g must divide nothing in
    # particular — ragged tails are edge-padded and sliced off.
    # DEFAULT ON at g=6 since r4: 16.0 -> 12.7 ms standalone, e2e 1132.4 ->
    # 1172.9 fps at bs128 (artifacts/bench_wpack_r4.log, exact parity).
    wpack = int(os.environ.get("HN_SEGFINAL_WPACK", "6"))
    if wpack > 1 and x.shape[0] >= 8:
        return _wpack_argmax(x, kernel, bias, g=wpack)
    segfinal = os.environ.get("HN_PALLAS_SEGFINAL", "0")
    if segfinal in ("1", "2"):
        from hydranet_tpu.ops import pallas_seg_final

        if pallas_seg_final.supports(x.shape, cout):
            # VMEM-resident z-split kernel (see pallas_seg_final.py);
            # "2" = full-unrolled row loops (Mosaic interleaves VPU
            # assembly with the MXU dots; longer compiles)
            y = pallas_seg_final.phase_logits_pallas(
                x, kernel, bias, unroll=(segfinal == "2"))
            return _phase_argmax_interleave(y, b, h, w, cout)
    if os.environ.get("HN_ZSPLIT", "0") == "1":
        # z-split reassociation: MEASURED NEGATIVE at bs128/320^2/64->5
        # (18.0 vs 16.0 ms) — the [B, H+2, W+1, 8*Cout] z tensor's HBM
        # round-trip (~2.1 GB at bs128) outweighs the 2.7x MXU lane-
        # utilization gain. Kept opt-in as the measured record.
        y = _phase_logits_zsplit(x, kernel, bias)
    else:
        pk = _phase_kernels(kernel)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            xp, pk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return _phase_argmax_interleave(y, b, h, w, cout)


def _phase_argmax_interleave(y, b, h, w, cout):
    """Per-phase argmax of [B, H+1, W+1, 4*cout] phase logits + int8
    depth-to-space interleave of the class ids."""
    phases = (y[:, :-1, :-1, 0 * cout:1 * cout],
              y[:, :-1, 1:, 1 * cout:2 * cout],
              y[:, 1:, :-1, 2 * cout:3 * cout],
              y[:, 1:, 1:, 3 * cout:4 * cout])
    a = jnp.stack([jnp.argmax(p, axis=-1).astype(jnp.int8)
                   for p in phases], axis=-1)        # [B, H, W, 4]
    a = a.reshape(b, h, w, 2, 2)
    a = a.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, 2 * w)
    return a.astype(jnp.int32)


def _phase2_kernel(k_fin: jnp.ndarray, cmid: int) -> jnp.ndarray:
    """[3, 3, Cmid, Cout] final-stage kernel -> the [2, 2, 4*Cmid, 16*Cout]
    kernel that applies it directly to the PREVIOUS up-stage's phase-major
    output z3 (layout of upsample2x_conv3x3_phase_logits: blocks (pi, pj),
    z3[t + pi, u + pj, block p] = x320[2t + pi, 2u + pj]).

    Derivation (rows; columns symmetric): the final phase conv reads
    xp320[a' + r] with a' = 2m + qi, i.e. x320 row alpha = 2m + qi + r - 1:
      qi=0: r=0 -> (p=1, x-row m-1) -> z3 row m,   window 0
            r=1 -> (p=0, x-row m)   -> z3 row m,   window 0
      qi=1: r=0 -> (p=0, x-row m)   -> z3 row m,   window 0
            r=1 -> (p=1, x-row m)   -> z3 row m+1, window 1
    so every output parity q reads a 2x2 window of z3 with per-(q, r, s)
    phase-block selection — one dense-enough conv (25% nonzero), no
    materialized interleave of the 2x-resolution tensor in between.

    Edge exactness (why no boundary fix-up is needed): at m=0 the (qi=0,
    r=0) tap wants clamped xp320[-1] = x320[0] but reads z3[0] block 1 —
    the extrapolated row; with edge padding all row taps collapse onto
    x160 row 0, so both equal (W0+W1+W2) * colconv(x160[0]) exactly (up
    to the float associativity of the pre-summed kernel taps). The far
    edge (m=H, qi=0, r=1 wanting clamped x320[2H-1]) collapses the same
    way onto x160 row H-1. The only z3 cells with no such identity are
    (qi=1, m=H) outputs — which the 4x interleave never reads."""
    cout = k_fin.shape[-1]
    pk = _phase_kernels(k_fin)  # [2, 2, Cmid, 4*Cout], d-major blocks
    k2 = jnp.zeros((2, 2, 4 * cmid, 16 * cout), pk.dtype)
    for qi in (0, 1):
        for r in (0, 1):
            pi, wi = ((1 - r, 0) if qi == 0 else (r, r))
            for qj in (0, 1):
                for s in (0, 1):
                    pj, wj = ((1 - s, 0) if qj == 0 else (s, s))
                    q = qi * 2 + qj
                    p = pi * 2 + pj
                    k2 = k2.at[wi, wj, p * cmid:(p + 1) * cmid,
                               q * 4 * cout:(q + 1) * 4 * cout].set(pk[r, s])
    return k2


def upsample4x_phase_tail_argmax(x: jnp.ndarray,
                                 k_up: jnp.ndarray, b_up: jnp.ndarray,
                                 k_fin: jnp.ndarray, b_fin: jnp.ndarray
                                 ) -> jnp.ndarray:
    """argmax(conv3x3(reflect_pad(up2( elu(conv3x3(reflect_pad(up2(x))))))))
    — the seg decoder's last TWO stages — computed ENTIRELY in phase space:
    the 2x-resolution intermediate (320² at the flagship shape) never
    materializes interleaved, and the 16-phase final logits carry 80
    channels (5/8 of a lane tile) instead of the 20->128-padded phase
    logits. x: [B, H, W, Cmid up-input]; returns int32 ids [B, 4H, 4W].

    Exact to float associativity vs the composed reference path
    (tests/test_fused_ops.py::test_phase_tail_*); boundary rows/cols
    self-resolve via the edge-collapse identity (see _phase2_kernel).

    Motivation (roofline r4): up3 ran at 54 TF/s (N=64 lanes) and the
    final stage at 8.7 TF/s; in phase space the up conv is K=256/N=256
    and the final conv K=1024/N=80 — MXU-shaped on both ends."""
    b, h, w, _ = x.shape
    cmid = k_up.shape[-1]
    cout = k_fin.shape[-1]

    z3 = upsample2x_conv3x3_phase_logits(x, k_up, b_up)  # [B,H+1,W+1,4Cmid]
    z3 = jax.nn.elu(z3)
    z3p = jnp.pad(z3, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    k2 = _phase2_kernel(k_fin, cmid)
    y = jax.lax.conv_general_dilated(
        z3p, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)                  # [B,H+1,W+1,16Cout]
    y = y + jnp.tile(b_fin, 16).astype(y.dtype)
    a = jnp.argmax(y.reshape(b, h + 1, w + 1, 16, cout),
                   axis=-1).astype(jnp.int8)             # [B,H+1,W+1,16]

    # 4x interleave: full-res row R = 4m + (2qi - di), so residue
    # rho_i = (2qi - di) mod 4 maps (qi, di) = (0,0)->0, (1,1)->1,
    # (1,0)->2, (0,1)->3; rho 3 reads rows 1..H (it owns R=4m-1), the
    # rest rows 0..H-1. Columns identical.
    by_rho = {0: (0, 0), 1: (1, 1), 2: (1, 0), 3: (0, 1)}
    views = []
    for ri in range(4):
        qi, di = by_rho[ri]
        rs = slice(1, h + 1) if ri == 3 else slice(0, h)
        for rj in range(4):
            qj, dj = by_rho[rj]
            cs = slice(1, w + 1) if rj == 3 else slice(0, w)
            ch = (qi * 2 + qj) * 4 + di * 2 + dj
            views.append(a[:, rs, cs, ch])
    out = jnp.stack(views, axis=-1).reshape(b, h, w, 4, 4)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, 4 * h, 4 * w)
    return out.astype(jnp.int32)


def upsample2x_reflect_conv3x3_int8(x: jnp.ndarray, kernel: jnp.ndarray,
                                    absmax: jnp.ndarray,
                                    out_dtype) -> jnp.ndarray:
    """int8-PTQ variant of upsample2x_reflect_conv3x3 (ops/quantize.py).

    The kernel is phase/tap-COLLAPSED in float first (collapsing sums taps;
    summing after quantization would overflow int8 and lose exactness of
    the collapse), then quantized per output channel; x is quantized
    per-tensor from the calibrated absmax. Edge-padding and the
    lhs-dilation zeros are exact on int8 values, so the integer conv sees
    the same formulation the float path uses at this batch size."""
    from hydranet_tpu.ops import quantize as qz

    x_q, s_x = qz.quantize_activation(x, absmax)
    if x.shape[0] >= 8:
        pk = _composed_4tap_kernel(kernel.astype(jnp.float32))
        w_q, s_w = qz.quantize_weight(pk)
        xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            xp, w_q, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (s_x * s_w)).astype(out_dtype)
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    pk = _phase_kernels(kernel.astype(jnp.float32))
    w_q, s_w = qz.quantize_weight(pk)  # per phase-channel scale
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, w_q, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * (s_x * s_w)).astype(out_dtype)
    y00 = y[:, :-1, :-1, 0 * cout:1 * cout]
    y01 = y[:, :-1, 1:, 1 * cout:2 * cout]
    y10 = y[:, 1:, :-1, 2 * cout:3 * cout]
    y11 = y[:, 1:, 1:, 3 * cout:4 * cout]
    out = jnp.stack([y00, y01, y10, y11], axis=-2)
    out = out.reshape(b, h, w, 2, 2, cout)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)


def upsample2x_reflect_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                               bias: Optional[jnp.ndarray] = None
                               ) -> jnp.ndarray:
    """= conv3x3(reflect_pad(nearest_up2(x)), kernel) + bias, computed at the
    low resolution. x: [B, H, W, Cin]; kernel [3,3,Cin,Cout].

    Two exact formulations, picked by (static) batch size:
    - dilated (B >= 8): the phase-conv + stack/transpose interleave spends
      28 of 34 ms in the transpose at the hot shape (bs128 160^2 64ch, v5e);
      the transposed-conv form emits the output already interleaved and is
      4.5x faster there.
    - phase+interleave (small B): XLA lowers lhs_dilated convs poorly at
      tiny batch (bs1 320^2 64->5: 4.8 ms dilated vs 1.6 ms phase — the
      interleave transpose is negligible at bs1 sizes).
    Both exact to float associativity vs the reference composition
    (tests/test_fused_ops.py covers both). A third exact formulation —
    the z-split for tiny Cout — is opt-in via HN_ZSPLIT=1 (measured
    negative in XLA, see _phase_logits_zsplit)."""
    cout = kernel.shape[-1]
    if (x.shape[0] >= 8 and cout <= 8
            and os.environ.get("HN_ZSPLIT", "0") == "1"):
        # tiny-Cout z-split variant for the train path (opt-in, same
        # economics as the inference z-split which measured NEGATIVE:
        # the z tensor's HBM round-trip beats the lane-utilization gain).
        b, h, w, _ = x.shape
        y = _phase_logits_zsplit(x, kernel,
                                 jnp.zeros((cout,), x.dtype))
        y00 = y[:, :-1, :-1, 0 * cout:1 * cout]
        y01 = y[:, :-1, 1:, 1 * cout:2 * cout]
        y10 = y[:, 1:, :-1, 2 * cout:3 * cout]
        y11 = y[:, 1:, 1:, 3 * cout:4 * cout]
        out = jnp.stack([y00, y01, y10, y11], axis=-2)
        out = out.reshape(b, h, w, 2, 2, cout)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)
    else:
        form = _dilated_form if x.shape[0] >= 8 else _phase_form
        out = form(x, kernel)
    if bias is not None:
        out = out + bias
    return out
