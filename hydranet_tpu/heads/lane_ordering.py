"""Lane ordering + dict conversion (TPU-native equivalents of
/root/reference/model/head_lane/lane_codec_utils.py:66-124, 185-282).

Orders decoded lanes left-to-right by where their end segment crosses the
image bottom edge, assigns signed lane indices (-1, -2, ... left of ego;
1, 2, ... right), and converts to the {"Lines": [{score, points}]} JSON
schema used by the metric and the demo overlay. Host-side (operates on the
<= max_lanes compact decode results)."""

from __future__ import annotations

from typing import Dict, List


def _cross_x(p1, p2, y: float) -> float:
    """x coordinate where the line through p1, p2 crosses row y —
    lane_codec_utils.py:66-82."""
    if abs(p1["y"] - p2["y"]) < 1e-6:
        return -1.0
    k = (p1["x"] - p2["x"]) / (p1["y"] - p2["y"])
    b = p1["x"] - k * p1["y"]
    return k * y + b


def order_lanes_x_axis(lanes: List[Dict], height: int) -> List[Dict]:
    """Sort lanes by bottom-edge crossing x (ties by far-end x), compute
    per-lane slope, and assign signed indices — lane_codec_utils.py:85-235.

    `lanes`: list of {"score", "points": [{x, y}, ...]} with points ordered
    bottom-of-image first. Returns the same dicts with "idx" added, sorted.
    """
    if not lanes:
        return []
    cross_y = height - 1.0
    keyed = []
    for lane in lanes:
        pts = lane["points"]
        if len(pts) < 2:
            k = 1000.0
            cx = pts[0]["x"] if pts else -1.0
        elif pts[1]["y"] < pts[0]["y"]:
            # normal orientation: first two points are nearest the bottom
            dy = pts[1]["y"] - pts[0]["y"]
            k = (pts[1]["x"] - pts[0]["x"]) / dy if dy else 1000.0
            cx = _cross_x(pts[0], pts[1], cross_y)
        elif pts[1]["y"] > pts[0]["y"]:
            dy = pts[-1]["y"] - pts[-2]["y"]
            k = (pts[-1]["x"] - pts[-2]["x"]) / dy if dy else 1000.0
            cx = _cross_x(pts[-2], pts[-1], cross_y)
        else:
            k = 1000.0
            cx = _cross_x(pts[-2], pts[-1], cross_y)
        far_x = pts[-1]["x"] if pts[1]["y"] < pts[0]["y"] else pts[0]["x"]
        keyed.append((cx, far_x, k, lane))

    keyed.sort(key=lambda t: (t[0], t[1]))

    # first lane with positive slope marks the left/right split
    right_pos = len(keyed)
    for i, (_, _, k, _) in enumerate(keyed):
        if k > 0:
            right_pos = i
            break

    ordered = []
    for i, (_, _, _, lane) in enumerate(keyed):
        lane = dict(lane)
        lane["idx"] = (i - right_pos) if i < right_pos else (i - right_pos + 1)
        ordered.append(lane)
    return ordered


def lanes_to_json(lanes: List[Dict], scale_x: float = 1.0,
                  scale_y: float = 1.0, min_score: float = 0.01) -> Dict:
    """Ordered lanes -> {"Lines": [{score, points}]} with coordinate scaling
    — lane_codec_utils.py:257-282."""
    lines = []
    for lane in lanes:
        if lane["score"] < min_score:
            continue
        lines.append({
            "score": lane["score"],
            "points": [{"x": p["x"] * scale_x, "y": p["y"] * scale_y}
                       for p in lane["points"]],
        })
    return {"Lines": lines}
