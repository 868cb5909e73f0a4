"""Lane ground-truth codec (TPU-native equivalent of
/root/reference/model/head_lane/lane_codec.py).

Two halves:

- `LaneCodec.encode_lane` (host, numpy): annotation polylines -> per-anchor
  class one-hot + offset targets, used by the data pipeline at sample-prep
  time (as in the reference, dataloader.py:342-354). Pipeline: scale ->
  y-dedup -> arc-length natural-cubic interp -> uniform y-grid resample ->
  anchor assignment -> per-anchor offsets.

- `decode_lanes` (device, JAX): the reference decodes with data-dependent
  per-anchor Python loops (lane_codec.py:139-217); here the same semantics are
  re-expressed as fixed-shape tensor ops: the sequential "walk until break"
  becomes a prefix-AND (cumulative product) over per-step validity conditions,
  and points scatter into a dense [anchors, points_per_line] x-position grid.
  Lane NMS (lane_codec_utils.py:518-542) becomes a pairwise-distance matrix +
  greedy suppression scan, mirroring the box-NMS formulation.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hydranet_tpu.heads.lane_geometry import (
    natural_cubic_interp,
    resample_on_y_grid,
)


class LaneCodec:
    """Configuration + host-side encoder. Mirrors the constructor quantities
    of the reference codec (lane_codec.py:24-51)."""

    def __init__(self, input_width: int, input_height: int, anchor_stride: int,
                 points_per_line: int, do_interpolate: bool = False,
                 anchor_lane_num: int = 1, scale_invariance: bool = True):
        self.input_width = input_width
        self.input_height = input_height
        self.stride = anchor_stride
        self.feature_width = int(input_width / anchor_stride)
        self.feature_height = int(input_height / anchor_stride)
        self.points_per_line = points_per_line
        self.pt_nums_single_lane = 2 * points_per_line + 2
        self.points_per_anchor = points_per_line / self.feature_height
        self.interval = float(input_height) / points_per_line
        self.feature_size = self.feature_width * self.feature_height
        self.img_center_x = input_width / 2
        self.anchor_lane_num = anchor_lane_num
        self.interpolation = do_interpolate
        self.scale_invariance = scale_invariance

    # ------------------------------------------------------------------ encode

    def encode_lane(self, lane_object: Dict, org_width: int, org_height: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Annotation dict {"Lines": [[{x, y}, ...], ...]} -> (gt_type
        [feature_size, 2], gt_loc [feature_size, 2*ppl+2]) —
        reference lane_codec.py:53-114.

        NOTE: offsets are returned in RAW PIXELS (reference convention).
        Under scale_invariance the training targets and `decode_lanes`
        both use offsets / interval — the dataset applies that division
        after this call (data/dataset.py:160-164); feeding raw encoder
        output straight to the decoder mis-scales every x by `interval`."""
        s_x = self.input_width / float(org_width)
        s_y = self.input_height / float(org_height)
        lanes = self._scaled_lane_list(lane_object, s_x, s_y)

        gt_loc = np.zeros((self.feature_size, self.pt_nums_single_lane),
                          dtype=np.float32)
        gt_type = np.zeros((self.feature_size, 2), dtype=np.float32)
        gt_type[:, 0] = 1.0
        if not lanes:
            return gt_type, gt_loc

        anchor_count = np.zeros((self.feature_height, self.feature_width),
                                dtype=np.int32)
        # per-anchor candidate (distance, loc) lists
        candidates: Dict[Tuple[int, int], List[Tuple[float, np.ndarray]]] = {}

        for lane in lanes:
            sampled = self._sample_lane(lane)
            if sampled is None:
                continue
            startpos, endpos, xs, ys = sampled
            self._assign_anchors(startpos, endpos, xs, ys, anchor_count,
                                 candidates)

        if self.anchor_lane_num != 1:
            raise NotImplementedError("anchor_lane_num != 1")

        for (h, w), cand in candidates.items():
            index = h * self.feature_width + w
            gt_type[index, 0] = 0.0
            gt_type[index, 1] = 1.0
            if len(cand) == 1:
                gt_loc[index] = cand[0][1]
            else:
                # choose the candidate whose signed distance from the image
                # center is smallest under argsort — reference
                # lane_codec_utils.py:428-443 sorts the raw signed values.
                dists = [c[0] for c in cand]
                gt_loc[index] = cand[int(np.argsort(dists)[0])][1]
        return gt_type, gt_loc

    def _scaled_lane_list(self, lane_object: Dict, s_x: float, s_y: float
                          ) -> List[List[Tuple[float, float]]]:
        """Scale + per-lane y-dedup (keep first occurrence), orient y
        descending — reference lane_codec_utils.py:127-154."""
        out = []
        for line in lane_object.get("Lines", []):
            pts = []
            seen_y = set()
            for p in line:
                if p["x"] == "nan" or p["y"] == "nan":
                    continue
                if p["y"] in seen_y:
                    continue
                seen_y.add(p["y"])
                pts.append((float(p["x"]) * s_x, float(p["y"]) * s_y))
            if len(pts) >= 2:
                if pts[0][1] < pts[1][1]:
                    pts = pts[::-1]
                out.append(pts)
        return out

    def _sample_lane(self, lane: Sequence[Tuple[float, float]]):
        """dedup -> spline interp -> nearby-point filter -> uniform y-grid
        resample — reference lane_codec.py:84-97 + :254-304."""
        # delete_repeat_y (lane_codec_utils.py:298-335): sort by y ascending,
        # dedup keeping the first x for each y, then orient y descending.
        ys = [p[1] for p in lane]
        xs = [p[0] for p in lane]
        order = np.argsort(ys, kind="stable")
        ys_sorted = [ys[i] for i in order]
        xs_sorted = [xs[i] for i in order]
        dedup_x, dedup_y = [], []
        for x, y in zip(xs_sorted, ys_sorted):
            if y not in dedup_y:
                dedup_y.append(y)
                dedup_x.append(x)
        if len(dedup_y) < 2:
            return None
        if dedup_y[0] < dedup_y[1]:
            dedup_x, dedup_y = dedup_x[::-1], dedup_y[::-1]

        # arc-length natural cubic spline, 1px steps (lane_spline_interp.py)
        interp = natural_cubic_interp(dedup_x, dedup_y, step_t=1.0)

        # delete_nearby_point (lane_codec_utils.py:356-393): first point kept
        # unconditionally; others need y to drop by >= 1 and be in-bounds.
        fx, fy = [interp[0][0]], [interp[0][1]]
        prev_y = interp[0][1]
        for x, y in interp[1:]:
            if prev_y - y < 1:
                continue
            if not (0 < x < self.input_width and 0 < y < self.input_height):
                continue
            fx.append(x)
            fy.append(y)
            prev_y = y
        fx, fy = fx[::-1], fy[::-1]  # y ascending

        return resample_on_y_grid(
            fx, fy, input_height=self.input_height, interval=self.interval,
            points_per_line=self.points_per_line,
            interpolation=self.interpolation)

    def _assign_anchors(self, startpos: int, endpos: int, xs, ys,
                        anchor_count: np.ndarray, candidates: Dict) -> None:
        """Assign the resampled line to each grid cell it passes and compute
        per-anchor up/down offset targets — reference lane_codec.py:306-366."""
        fh, fw = self.feature_height, self.feature_width
        step = self.stride
        ppl = self.points_per_line
        visited = set()
        length = endpos - startpos + 1
        for i in range(length):
            h = fh - 1 - int((startpos + i) * self.interval / step)
            w = int(xs[i] / step)
            if h < 0 or h > fh - 1 or w < 0 or w > fw - 1:
                continue
            if (h, w) in visited:
                continue
            anchor_y = (h + 0.5) * step
            center_x = (w + 0.5) * step
            curr_y = self.input_height - 1 - (i + startpos) * self.interval
            if curr_y <= anchor_y:  # anchor must sit below the point
                continue
            visited.add((h, w))

            if self.interpolation:
                center_y = ys[int(ppl / fh) * (fh - 1 - h)]
            else:
                center_y = (self.input_height - 1
                            - (fh - 1 - h) * int(ppl / fh) * self.interval)

            loc = np.zeros(self.pt_nums_single_lane, dtype=np.float64)
            up_index = 0
            for j in range(length):
                if ys[j] <= center_y:
                    loc[ppl + 2 + up_index] = xs[j] - center_x
                    up_index += 1
            loc[ppl + 1] = up_index
            down_index = length - up_index - 1
            down_counter = 0
            for j in range(length):
                if ys[j] > center_y:
                    dx = xs[j] - center_x
                    loc[down_index] = 1e-6 if dx == 0 else dx
                    down_counter += 1
                    down_index -= 1
            loc[ppl] = down_counter

            anchor_count[h, w] += 1
            distance = xs[i] - self.img_center_x
            candidates.setdefault((h, w), []).append((distance, loc))


class DecodedLanes(NamedTuple):
    """Fixed-shape decoded lanes. `xs[pos]` is the lane's x at image row
    y = input_height - 1 - pos * interval; `mask` marks populated rows."""

    prob: jnp.ndarray    # [..., L]
    xs: jnp.ndarray      # [..., L, ppl]
    mask: jnp.ndarray    # [..., L, ppl] bool
    start: jnp.ndarray   # [..., L] int32
    end: jnp.ndarray     # [..., L] int32
    valid: jnp.ndarray   # [..., L] bool
    anchor: jnp.ndarray  # [..., L] int32 — source anchor index (h*fw + w)


try:  # allow the result type through jax.export serialization
    from jax import export as _jax_export

    _jax_export.register_namedtuple_serialization(
        DecodedLanes, serialized_name="hydranet_tpu.DecodedLanes")
except (ImportError, AttributeError, ValueError):
    pass


def decode_lanes(
    predict_cls: jnp.ndarray,  # [N, 2] softmax probabilities
    predict_loc: jnp.ndarray,  # [N, 2*ppl+2]
    *,
    feature_height: int,
    feature_width: int,
    points_per_line: int,
    interval: float,
    stride: int,
    input_width: int,
    input_height: int,
    scale_invariance: bool = True,
    exist_threshold: float = 0.5,
    margin_width: float = 100.0,
) -> DecodedLanes:
    """On-device lane decode — semantics of reference lane_codec.py:116-219
    with the sequential walks turned into prefix-AND masks."""
    n = feature_height * feature_width
    ppl = points_per_line
    dtype = predict_loc.dtype

    h_idx = jnp.arange(n, dtype=jnp.int32) // feature_width
    w_idx = jnp.arange(n, dtype=jnp.int32) % feature_width
    prob = predict_cls[:, 1]
    ayp = ((feature_height - 1 - h_idx) * ppl) // feature_height  # [N]
    acx = (w_idx.astype(dtype) + 0.5) * stride

    down_off = predict_loc[:, :ppl]
    rel_end_down = predict_loc[:, ppl]
    rel_end_up = predict_loc[:, ppl + 1]
    up_off = predict_loc[:, ppl + 2: 2 * ppl + 2]
    if scale_invariance:
        down_off = down_off * interval
        up_off = up_off * interval

    i = jnp.arange(ppl, dtype=jnp.int32)[None, :]  # [1, ppl]

    # --- up walk (lane_codec.py:168-181): break on any failed condition.
    up_x = acx[:, None] + up_off
    up_ok = ((i.astype(dtype) < rel_end_up[:, None])
             & (ayp[:, None] + i < ppl)
             & (up_x >= 0) & (up_x < input_width))
    up_valid = jnp.cumprod(up_ok.astype(jnp.int32), axis=1).astype(bool)
    count_up = jnp.sum(up_valid, axis=1)

    # --- down walk (lane_codec.py:183-204): margin on the right edge.
    down_x = acx[:, None] + down_off
    down_ok = ((i.astype(dtype) < rel_end_down[:, None])
               & (ayp[:, None] - 1 - i >= 0)
               & (down_x >= 0) & (down_x < input_width + margin_width))
    down_valid = jnp.cumprod(down_ok.astype(jnp.int32), axis=1).astype(bool)
    count_down = jnp.sum(down_valid, axis=1)

    exists = (prob >= exist_threshold) & (count_up + count_down >= 2)
    start = ayp - count_down
    end = ayp + count_up

    # Fill the dense per-row x grid. Walk positions are affine in the walk
    # index (up: pos = ayp + i; down: pos = ayp - 1 - i), AND the offset
    # `ayp` is a static function of the anchor's grid row alone — so the
    # scatter inverts into a STATIC shift per grid row (20 slice+pad ops),
    # not a gather. (A take_along_axis here costs several ms/batch128 on
    # v5e — TPU gathers are row-serial.)
    fh, fw = feature_height, feature_width
    up_x3 = up_x.reshape(fh, fw, ppl)
    up_v3 = up_valid.reshape(fh, fw, ppl)
    down_x3 = down_x.reshape(fh, fw, ppl)
    down_v3 = down_valid.reshape(fh, fw, ppl)

    xs_rows, up_m_rows, down_m_rows = [], [], []
    for h in range(fh):
        a = ((fh - 1 - h) * ppl) // fh          # = ayp for this grid row
        # up: vals[p] = up_x[p - a] for p >= a  -> shift right by a
        u_x = jnp.pad(up_x3[h, :, :ppl - a] if a else up_x3[h],
                      ((0, 0), (a, 0)))
        u_m = jnp.pad(up_v3[h, :, :ppl - a] if a else up_v3[h],
                      ((0, 0), (a, 0)))
        # down: vals[p] = down_x[a - 1 - p] for p <= a-1 -> reverse then
        # shift left by ppl - a
        d_xr = down_x3[h, :, ::-1]
        d_vr = down_v3[h, :, ::-1]
        s = ppl - a
        d_x = jnp.pad(d_xr[:, s:], ((0, 0), (0, s))) if s else d_xr
        d_m = jnp.pad(d_vr[:, s:], ((0, 0), (0, s))) if s else d_vr
        xs_rows.append(jnp.where(u_m, u_x, d_x))
        up_m_rows.append(u_m)
        down_m_rows.append(d_m)

    xs = jnp.concatenate(xs_rows, axis=0)
    m_up = jnp.concatenate(up_m_rows, axis=0)
    m_down = jnp.concatenate(down_m_rows, axis=0)
    mask = (m_up | m_down) & exists[:, None]

    return DecodedLanes(
        prob=prob, xs=xs, mask=mask,
        start=start.astype(jnp.int32), end=end.astype(jnp.int32),
        valid=exists, anchor=jnp.arange(n, dtype=jnp.int32))


def lane_pairwise_distance(lanes: DecodedLanes, use_mean_dist: bool = False
                           ) -> jnp.ndarray:
    """Pairwise lane distance matrix — reference calc_err_dis_with_pos
    (lane_codec_utils.py:487-515): mean |dx| over the overlapping row range,
    optionally maxed with the endpoint |dx|s; 1e6 when no overlap."""
    ppl = lanes.xs.shape[-1]
    start, end = lanes.start, lanes.end
    max_start = jnp.maximum(start[:, None], start[None, :])
    min_end = jnp.minimum(end[:, None], end[None, :])
    no_overlap = ((min_end <= max_start) | (max_start < 0) | (min_end < 1))

    pos = jnp.arange(ppl, dtype=jnp.int32)
    in_range = ((pos[None, None, :] >= max_start[:, :, None])
                & (pos[None, None, :] < min_end[:, :, None]))
    dx = jnp.abs(lanes.xs[:, None, :] - lanes.xs[None, :, :])
    cnt = jnp.maximum(jnp.sum(in_range, axis=-1), 1)
    mean_d = jnp.sum(jnp.where(in_range, dx, 0.0), axis=-1) / cnt

    if use_mean_dist:
        dist = mean_d
    else:
        pos_r = jnp.arange(ppl, dtype=jnp.int32)[None, None, :]

        def endpoint(idx):
            # |x_i[idx] - x_j[idx]| per pair. A [L, L] fancy-index gather
            # here is scalar-serial on TPU (~20 ms/batch128 for the lane
            # NMS); the one-hot contraction over the small ppl axis is
            # exact and vectorizes.
            oh = (idx[:, :, None] == pos_r)               # [L, L, ppl]
            xi = jnp.sum(jnp.where(oh, lanes.xs[:, None, :], 0.0), axis=-1)
            xj = jnp.sum(jnp.where(oh, lanes.xs[None, :, :], 0.0), axis=-1)
            return jnp.abs(xi - xj)

        d_start = endpoint(jnp.clip(max_start, 0, ppl - 1))
        d_end = endpoint(jnp.clip(min_end - 1, 0, ppl - 1))
        dist = jnp.maximum(mean_d, jnp.maximum(d_start, d_end))

    return jnp.where(no_overlap, 1e6, dist)


def lane_nms(lanes: DecodedLanes, thresh: float, top_k: int = 64,
             max_lanes: int = 16, use_mean_dist: bool = False) -> DecodedLanes:
    """Greedy lane NMS by pairwise x-distance — reference nms_with_pos
    (lane_codec_utils.py:518-542) on device with fixed shapes.

    Candidates are the `top_k` anchors by probability (the reference considers
    every anchor above threshold; identical whenever <= top_k anchors fire).
    """
    k = min(top_k, lanes.prob.shape[-1])
    max_lanes = min(max_lanes, k)
    top_prob, idx = jax.lax.top_k(
        jnp.where(lanes.valid, lanes.prob, -1.0), k)
    # candidate rows via a one-hot matmul pick (row gathers are serial on
    # TPU); a single nonzero per row keeps every field exact, including
    # the int/bool ones (values < 2^24 are exact in f32) — but ONLY under
    # Precision.HIGHEST: the TPU default multiplies in bf16, whose 8-bit
    # mantissa would corrupt anchor ids and xs. The pick matrix is tiny
    # ([k, N], k<=64) so full precision costs nothing.
    pick = (idx[:, None] == jnp.arange(lanes.prob.shape[-1])[None, :]
            ).astype(jnp.float32)                         # [k, N]

    def sel_rows(a, dtype):
        picked = jnp.dot(pick, a.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return picked.astype(dtype) if dtype != jnp.bool_ \
            else picked > 0.5

    cand = DecodedLanes(
        prob=top_prob,
        xs=sel_rows(lanes.xs, lanes.xs.dtype),
        mask=sel_rows(lanes.mask, jnp.bool_),
        start=sel_rows(lanes.start, jnp.int32),
        end=sel_rows(lanes.end, jnp.int32),
        valid=sel_rows(lanes.valid, jnp.bool_),
        anchor=sel_rows(lanes.anchor, jnp.int32))

    dist = lane_pairwise_distance(cand, use_mean_dist)
    suppress_pair = (dist <= thresh) & cand.valid[None, :] & cand.valid[:, None]
    later = jnp.triu(jnp.ones((k, k), bool), 1)
    # Materialize before the sequential loop so XLA does not rematerialize
    # the pairwise-distance computation inside every iteration (same fix as
    # detection.greedy_nms_mask).
    suppress_pair = jax.lax.optimization_barrier(suppress_pair & later)

    # Jacobi fixpoint for the greedy keep mask (see
    # detection.greedy_nms_mask): converges in longest-suppression-chain
    # rounds, exact full greedy, density-independent.
    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(suppress_pair & keep[:, None], axis=0)
        return cand.valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (cand.valid, jnp.zeros_like(cand.valid), jnp.int32(0)))

    order = jnp.argsort(~keep, stable=True)[:max_lanes]
    sel = lambda a: a[order]
    return DecodedLanes(
        prob=sel(cand.prob), xs=sel(cand.xs), mask=sel(cand.mask),
        start=sel(cand.start), end=sel(cand.end),
        valid=keep[order], anchor=sel(cand.anchor))


def lanes_to_points(lanes: DecodedLanes, *, input_height: int,
                    interval: float, scale_x: float = 1.0,
                    scale_y: float = 1.0) -> List[Dict]:
    """Host-side: fixed-shape decoded lanes -> list of
    {"score", "points": [{x, y}...]} dicts (points ordered bottom-of-image
    first, i.e. ascending pos — matching the reference decode's merged
    down+up order, lane_codec.py:206-208), scaled to the original image —
    reference convert_lane_to_dict (lane_codec_utils.py:257-282)."""
    out = []
    prob = np.asarray(lanes.prob)
    xs = np.asarray(lanes.xs)
    mask = np.asarray(lanes.mask)
    start = np.asarray(lanes.start)
    end = np.asarray(lanes.end)
    valid = np.asarray(lanes.valid)
    for li in range(prob.shape[0]):
        if not valid[li] or prob[li] < 0.01:
            continue
        pts = []
        for p in range(int(start[li]), int(end[li])):
            if 0 <= p < xs.shape[1] and mask[li, p]:
                y = input_height - 1 - p * interval
                pts.append({"x": float(xs[li, p]) * scale_x,
                            "y": float(y) * scale_y})
        if pts:
            out.append({"score": float(prob[li]), "points": pts})
    return out
