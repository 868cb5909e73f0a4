"""Host-side lane geometry: arc-length natural cubic spline interpolation and
uniform y-grid resampling (TPU-native equivalents of
/root/reference/model/head_lane/lane_spline_interp.py and
lane_codec.py:254-304). Pure numpy/scipy; used only at data-preparation time.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy import interpolate as _sp_interp


def _natural_cubic_moments(values: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Solve the natural-cubic-spline tridiagonal system for second
    derivatives ("moments") via the Thomas algorithm, matching the reference's
    forward-elimination / back-substitution (lane_spline_interp.py:51-92)."""
    n = len(values)
    m = np.zeros(n)
    if n < 3:
        return m
    # rows i = 1..n-2 of the tridiagonal system
    a = h[:-1]
    b = 2.0 * (h[:-1] + h[1:])
    c = h[1:].astype(float).copy()
    d = 6.0 * ((values[2:] - values[1:-1]) / h[1:]
               - (values[1:-1] - values[:-2]) / h[:-1])
    cp = np.zeros(n - 2)
    dp = np.zeros(n - 2)
    cp[0] = c[0] / b[0]
    dp[0] = d[0] / b[0]
    for i in range(1, n - 2):
        base = b[i] - a[i] * cp[i - 1]
        cp[i] = c[i] / base
        dp[i] = (d[i] - a[i] * dp[i - 1]) / base
    m[n - 2] = dp[n - 3] if n >= 3 else 0.0
    for i in range(n - 4, -1, -1):
        m[i + 1] = dp[i] - cp[i] * m[i + 2]
    m[0] = 0.0
    m[-1] = 0.0
    return m


def natural_cubic_interp(xs: Sequence[float], ys: Sequence[float],
                         step_t: float = 1.0) -> List[Tuple[float, float]]:
    """Arc-length-parameterized natural cubic spline through the points,
    sampled every `step_t` along each chord — reference
    lane_spline_interp.py:5-108. Returns [(x, y), ...] including the final
    input point."""
    n = len(xs)
    if n < 2:
        return list(zip(xs, ys))
    xs = np.asarray(xs, dtype=float)
    ys = np.asarray(ys, dtype=float)
    h = np.sqrt(np.diff(xs) ** 2 + np.diff(ys) ** 2)

    if n == 2:
        h0 = h[0]
        bx, by = (xs[1] - xs[0]) / h0, (ys[1] - ys[0]) / h0
        ts = np.arange(0.0, h0, step_t)
        pts = [(xs[0] + bx * t, ys[0] + by * t) for t in ts]
        pts.append((float(xs[1]), float(ys[1])))
        return pts

    mx = _natural_cubic_moments(xs, h)
    my = _natural_cubic_moments(ys, h)

    pts: List[Tuple[float, float]] = []
    for i in range(n - 1):
        ax, ay = xs[i], ys[i]
        bx = (xs[i + 1] - xs[i]) / h[i] - (2 * h[i] * mx[i] + h[i] * mx[i + 1]) / 6
        by = (ys[i + 1] - ys[i]) / h[i] - (2 * h[i] * my[i] + h[i] * my[i + 1]) / 6
        cx, cy = mx[i] / 2, my[i] / 2
        dx = (mx[i + 1] - mx[i]) / (6 * h[i])
        dy = (my[i + 1] - my[i]) / (6 * h[i])
        t = 0.0
        while t < h[i]:
            pts.append((ax + bx * t + cx * t * t + dx * t ** 3,
                        ay + by * t + cy * t * t + dy * t ** 3))
            t += step_t
    pts.append((float(xs[-1]), float(ys[-1])))
    return pts


def resample_on_y_grid(
    x_pt_list: List[float],
    y_pt_list: List[float],
    *,
    input_height: int,
    interval: float,
    points_per_line: int,
    interpolation: bool,
) -> Optional[Tuple[int, int, np.ndarray, List[float]]]:
    """Uniformly resample a lane on the row grid
    y = input_height - 1 - pos * interval — reference lane_codec.py:254-304.

    Returns (startpos, endpos, xs, ys) or None for degenerate lanes.
    `interpolation` linearly extends the lane to the bottom edge first.
    """
    if len(x_pt_list) < 2 or len(y_pt_list) < 2:
        return None
    x_pt_list = list(x_pt_list)
    y_pt_list = list(y_pt_list)

    if interpolation:
        max_y = y_pt_list[-1]
        if max_y < input_height - 1:
            y1, y2 = y_pt_list[-2], y_pt_list[-1]
            x1, x2 = x_pt_list[-2], x_pt_list[-1]
            while max_y < input_height - 1:
                y_new = max_y + interval
                x_new = x1 + (x2 - x1) * (y_new - y1) / (y2 - y1)
                x_pt_list.append(x_new)
                y_pt_list.append(y_new)
                max_y = y_new

    x_arr = np.asarray(x_pt_list)
    y_arr = np.asarray(y_pt_list)
    if y_arr.max() - y_arr.min() < 5:  # filter <5px lanes
        return None
    k = 1 if len(y_arr) < 4 else 3
    tck = _sp_interp.splrep(y_arr, x_arr, k=k, s=0)

    if interpolation:
        startpos = 0
    else:
        startpos = int((input_height - 1 - y_arr[-1]) / interval + 1)
    endpos = int((input_height - 1 - y_arr[0]) / interval)
    endpos = min(endpos, points_per_line - 1)
    if startpos >= endpos:
        return None

    ys = [input_height - 1 - i * interval for i in range(startpos, endpos + 1)]
    xs = np.asarray(_sp_interp.splev(ys, tck, der=0), dtype=float)
    xs[xs == 0] += 0.01
    return startpos, endpos, xs, ys
