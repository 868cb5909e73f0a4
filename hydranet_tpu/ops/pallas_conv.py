"""Pallas TPU kernel: 3x3 stride-1 convolution as 9 shifted MXU matmuls.

XLA's conv lowering on v5e sustains ~30-60 TF/s for this model's 3x3 NHWC
convs while plain matmuls reach ~160 TF/s. This kernel reformulates the conv
so the MXU sees pure [rows, Cin] x [Cin, Cout] matmuls:

    y[h, w, :] = sum_{dy, dx in 0..2} x_pad[h+dy, w+dx, :] @ K[dy, dx]

Each grid step owns a row-band of one image: the padded input slab
[TILE_H+2, W+2, Cin] is DMA'd HBM->VMEM, then the 9 taps run as shifted-slab
matmuls accumulating in f32. Accumulation differences vs XLA's conv are
float-reassociation only.

Used by `conv3x3_mxu` (zero or pre-padded inputs). Falls back to
lax.conv_general_dilated when shapes don't fit the kernel's constraints.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, out_ref, x_slab, sems, *, tile_h: int,
                 width: int, cin: int, cout: int):
    """Double-buffered across grid steps: step s waits on the slab its
    predecessor started and prefetches the slab for step s+1 (grid steps run
    sequentially on a TensorCore; scratch and DMA semaphores persist)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb, nh = pl.num_programs(0), pl.num_programs(1)
    s = b * nh + i
    slot = jax.lax.rem(s, 2)
    next_slot = jax.lax.rem(s + 1, 2)

    def dma_for(step, slot_idx):
        bb = step // nh
        ii = jax.lax.rem(step, nh)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * tile_h, tile_h + 2)],
            x_slab.at[slot_idx], sems.at[slot_idx])

    @pl.when(s == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(s + 1 < nb * nh)
    def _():
        dma_for(s + 1, next_slot).start()

    dma_for(s, slot).wait()

    acc = jnp.zeros((tile_h * width, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x_slab[slot, dy:dy + tile_h, dx:dx + width, :]
            patch = patch.reshape(tile_h * width, cin)
            acc = acc + jnp.dot(patch, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(tile_h, width, cout).astype(out_ref.dtype)


def _pick_tile_h(h: int) -> Optional[int]:
    for t in (16, 20, 8, 10, 32, 40, 4, 5, 2):
        if h % t == 0:
            return t
    return None


def tpu_backend() -> bool:
    """True when the default JAX backend is a TPU (incl. tunneled plugins)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@jax.custom_vjp
def conv3x3_prepadded(x_padded: jnp.ndarray, kernel: jnp.ndarray
                      ) -> jnp.ndarray:
    """Differentiable VALID 3x3/s1 conv of a pre-padded NHWC input.

    Primal runs the Pallas MXU kernel on TPU (lax fallback elsewhere);
    backward uses XLA's conv VJP (identical math, reassociation-only
    differences)."""
    return conv3x3_mxu(x_padded, kernel)


def _conv3x3_lax(x_padded, kernel):
    return jax.lax.conv_general_dilated(
        x_padded, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x_padded.dtype)


def _conv3x3_fwd(x_padded, kernel):
    return conv3x3_prepadded(x_padded, kernel), (x_padded, kernel)


def _conv3x3_bwd(res, g):
    x_padded, kernel = res
    _, vjp = jax.vjp(_conv3x3_lax, x_padded, kernel)
    return vjp(g)


conv3x3_prepadded.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_mxu(x_padded: jnp.ndarray, kernel: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """VALID 3x3/s1 conv of a pre-padded NHWC input via the Pallas kernel.

    x_padded: [B, H+2, W+2, Cin] (caller applies zero/reflect/edge padding).
    kernel:   [3, 3, Cin, Cout].
    Returns [B, H, W, Cout] in x_padded.dtype.

    Falls back to lax conv when the shape doesn't tile (H has no small
    divisor, or the VMEM slab would be too large).
    """
    if not interpret and not tpu_backend():
        return _conv3x3_lax(x_padded, kernel)

    b, hp, wp, cin = x_padded.shape
    h, w = hp - 2, wp - 2
    cout = kernel.shape[-1]
    tile_h = _pick_tile_h(h)

    # DMA slices must be 8-sublane aligned in the second-to-minor dim: round
    # the padded width up to a multiple of 8 (tail columns are never read).
    wp_pad = -(-wp // 8) * 8

    el = jnp.dtype(x_padded.dtype).itemsize
    slab_bytes = 2 * (tile_h + 2) * wp_pad * cin * el if tile_h else None
    acc_bytes = tile_h * w * cout * 4 if tile_h else None
    w_bytes = 9 * cin * cout * el
    fits = (tile_h is not None
            and cin % 128 == 0  # HBM DMA slices need 128-lane alignment
            and slab_bytes + acc_bytes + w_bytes < 12 * 1024 * 1024)

    if not fits:
        return _conv3x3_lax(x_padded, kernel)

    if wp_pad != wp:
        x_padded = jnp.pad(x_padded,
                           ((0, 0), (0, 0), (0, wp_pad - wp), (0, 0)))
        wp = wp_pad

    grid = (b, h // tile_h)
    return pl.pallas_call(
        functools.partial(_conv_kernel, tile_h=tile_h, width=w, cin=cin,
                          cout=cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, cout),
                               lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x_padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wp, cin), x_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_padded, kernel)
