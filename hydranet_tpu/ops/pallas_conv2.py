"""Pallas TPU kernel v2: fused pad + 3x3/s1 conv + bias + activation.

v1 (`pallas_conv.py`) required the caller to pre-pad in HBM — a full extra
read+write of the activation tensor and a fusion barrier that made the
kernel a net LOSS inside the pipeline despite winning standalone (73 vs
41 TF/s). v2 reads the UNPADDED input and builds the halo in VMEM:

- rows: each grid step DMAs a clamped (tile+2)-row window and reassembles
  the logical rows with a 1-row pad candidate + dynamic_slice, so the
  first/last blocks get reflect/zero padding without branching;
- columns: one VMEM concat builds the left/right halo (+ zero alignment
  columns to an 8-sublane multiple);
- epilogue: bias add + optional ELU fused into the f32 accumulator before
  the bf16 store.

The conv itself is the 9-shifted-MXU-matmul formulation of v1. Targets the
segmentation decoder's ConvBlocks (reflect-pad 3x3 + ELU, Cin in
{128, 256, 512} — reference segmentation.py:16-48); exact to float
associativity vs pad->conv->bias->elu.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydranet_tpu.ops.pallas_conv import _pick_tile_h, tpu_backend


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_slab, ext_ref, sems, *,
            tile_h: int,
            height: int, width: int, wp: int, cin: int, cout: int,
            pad_mode: str, act: Optional[str]):
    """Grid (B, H/tile_h); double-buffered window DMA across grid steps."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb, nh = pl.num_programs(0), pl.num_programs(1)
    s = b * nh + i
    slot = jax.lax.rem(s, 2)
    next_slot = jax.lax.rem(s + 1, 2)
    win = tile_h + 2

    def win_start(step):
        ii = jax.lax.rem(step, nh)
        return jnp.clip(ii * tile_h - 1, 0, height - win)

    def dma_for(step, slot_idx):
        bb = step // nh
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(win_start(step), win)],
            x_slab.at[slot_idx], sems.at[slot_idx])

    @pl.when(s == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(s + 1 < nb * nh)
    def _():
        dma_for(s + 1, next_slot).start()

    dma_for(s, slot).wait()

    phys = x_slab[slot]  # [win, wp, cin]; cols [0, width) are real
    # --- row halo: logical rows (i*tile_h - 1 .. i*tile_h + tile_h) are
    # ext[delta+1 : delta+1+win] where delta = (i*tile_h - 1) - win_start
    if pad_mode == "reflect":
        top = phys[1:2]
        bot = phys[tile_h:tile_h + 1]
    else:  # zero
        top = jnp.zeros_like(phys[0:1])
        bot = jnp.zeros_like(phys[0:1])
    # materialize the extended window in VMEM scratch so the row-shift can
    # be a dynamic REF slice (Mosaic has no dynamic_slice on values)
    ext_ref[:] = jnp.concatenate([top, phys, bot], axis=0)  # [win+2, wp, cin]
    delta = (i * tile_h - 1) - win_start(s)
    logical = ext_ref[pl.ds(delta + 1, win)]

    # --- column halo (and keep alignment cols on the right)
    if pad_mode == "reflect":
        left = logical[:, 1:2]
        right = logical[:, width - 2:width - 1]
    else:
        left = jnp.zeros_like(logical[:, 0:1])
        right = jnp.zeros_like(logical[:, 0:1])
    slabp = jnp.concatenate([left, logical[:, :width], right],
                            axis=1)  # [win, width+2, cin]

    acc = jnp.zeros((tile_h * width, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = slabp[dy:dy + tile_h, dx:dx + width, :]
            patch = patch.reshape(tile_h * width, cin)
            acc = acc + jnp.dot(patch, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if act == "elu":
        # Mosaic has no expm1; exp-1 in f32 differs by <1 ulp here
        acc = jnp.where(acc > 0, acc, jnp.exp(acc) - 1.0)
    out_ref[0] = acc.reshape(tile_h, width, cout).astype(out_ref.dtype)


def _lax_reference(x, kernel, bias, pad_mode, act):
    mode = {"reflect": "reflect", "zero": "constant"}[pad_mode]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    y = jax.lax.conv_general_dilated(
        xp, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype) + bias.astype(x.dtype)
    if act == "elu":
        y = jax.nn.elu(y)
    return y


def conv3x3_pad_act(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                    pad_mode: str = "reflect", act: Optional[str] = "elu",
                    interpret: bool = False) -> jnp.ndarray:
    """Fused pad+conv3x3+bias(+act) of an UNPADDED NHWC input.

    Differentiable: primal runs the Pallas kernel on TPU; backward uses the
    XLA composition's VJP (identical math up to reassociation). Falls back
    to the XLA composition when shapes don't tile.
    """

    @jax.custom_vjp
    def op(x, kernel, bias):
        return _forward(x, kernel, bias)

    def _forward(x, kernel, bias):
        if not interpret and not tpu_backend():
            return _lax_reference(x, kernel, bias, pad_mode, act)
        b, h, w, cin = x.shape
        cout = kernel.shape[-1]
        tile_h = _pick_tile_h(h)
        wp = -(-w // 8) * 8
        el = jnp.dtype(x.dtype).itemsize
        if tile_h is not None:
            slab_bytes = (2 * (tile_h + 2) + (tile_h + 4)) * wp * cin * el
            acc_bytes = tile_h * w * cout * 4
            w_bytes = 9 * cin * cout * el
            fits = (cin % 128 == 0 and h >= tile_h + 2
                    and slab_bytes + acc_bytes + w_bytes < 12 * 1024 * 1024)
        else:
            fits = False
        if not fits:
            return _lax_reference(x, kernel, bias, pad_mode, act)
        xw = x
        if wp != w:
            xw = jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        grid = (b, h // tile_h)
        return pl.pallas_call(
            functools.partial(_kernel, tile_h=tile_h, height=h, width=w,
                              wp=wp, cin=cin, cout=cout, pad_mode=pad_mode,
                              act=act),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, w, cout),
                                   lambda bb, ii: (bb, ii, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h + 2, wp, cin), x.dtype),
                pltpu.VMEM((tile_h + 4, wp, cin), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xw, kernel, bias.reshape(1, cout))

    def fwd(x, kernel, bias):
        return op(x, kernel, bias), (x, kernel, bias)

    def bwd(res, g):
        x, kernel, bias = res
        _, vjp = jax.vjp(
            lambda x, k, b: _lax_reference(x, k, b, pad_mode, act),
            x, kernel, bias)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op(x, kernel, bias)
