"""RegNet parameterization (TPU-native equivalent of
/root/reference/model/net/regnet.py).

Converts the design-space parameters (w0, wa, wm, depth, b, g) into per-stage
widths/depths via the RegNet equations, with /8 rounding and group-width
compatibility fixup (regnet.py:21-36). RegNetY = RegNetX + SE.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from hydranet_tpu.models.anynet import AnyNetXe


def regnet_stage_params(
    initial_width: int,
    slope: float,
    quantized_param: float,
    network_depth: int,
    bottleneck_ratio: int,
    group_width: int,
) -> Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, ...]]:
    """Derive (per-stage widths, depths, group widths) — regnet.py:21-36.

    For the big preset (24, 36, 2.5, 30, 1, 8) this yields
    widths [24, 64, 152, 376, 936], depths [1, 1, 4, 10, 14].
    """
    parameterized_width = initial_width + slope * np.arange(network_depth)
    ks = np.round(np.log(parameterized_width / initial_width)
                  / np.log(quantized_param))
    quantized_width = initial_width * np.power(quantized_param, ks)
    quantized_width = 8 * np.round(quantized_width / 8)
    widths, depths = np.unique(quantized_width.astype(np.int32),
                               return_counts=True)
    group_widths = np.array(
        [min(group_width, w // bottleneck_ratio) for w in widths])
    widths = np.round(widths // bottleneck_ratio / group_width) * group_width
    group_widths = group_widths.astype(np.int32) * bottleneck_ratio
    return (
        tuple(int(w) for w in widths),
        tuple(int(d) for d in depths),
        tuple(int(g) for g in group_widths),
    )


def RegNetY(
    initial_width: int,
    slope: float,
    quantized_param: float,
    network_depth: int,
    bottleneck_ratio: int,
    group_width: int,
    stride: int,
    se_ratio: Optional[int],
    dtype=None,
    remat: bool = False,
) -> AnyNetXe:
    """Build a RegNetY backbone module — regnet.py:47-52."""
    widths, depths, group_widths = regnet_stage_params(
        initial_width, slope, quantized_param, network_depth,
        bottleneck_ratio, group_width)
    return AnyNetXe(
        ls_num_blocks=depths,
        ls_block_width=widths,
        ls_bottleneck_ratio=tuple([bottleneck_ratio] * len(widths)),
        ls_group_width=group_widths,
        stride=stride,
        se_ratio=se_ratio,
        dtype=dtype,
        remat=remat,
    )
