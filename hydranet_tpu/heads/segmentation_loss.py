"""Segmentation losses (TPU-native equivalents of
/root/reference/model/head_seg/segmentation_loss.py and loss_lovasz.py).

All fixed-shape, mask-based formulations (no boolean indexing) so they trace
into a single XLA program; numerics match the torch reference on valid inputs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _topk_sum_bitsearch(loss: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-row sum of the k largest values of non-negative [B, N] `loss`,
    WITHOUT sorting.

    `lax.top_k` at the seg-loss shape ([32, 409600], k = 30%) costs
    ~250 ms/step on v5e — over half the whole train step. The k-th
    largest VALUE is enough to reduce top-k to a masked sum, and for
    non-negative floats the IEEE bit pattern is monotone, so a 31-step
    binary search on the int32 bit pattern finds it exactly; each step is
    one fused compare+count pass (~2.5 ms total). The boundary (elements equal to the k-th value) contributes
    `(k - count_above) / count_tied * sum(tied values)` — the identical
    sum, differentiably: with distinct values this backprops exactly like
    `top_k`; with ties, the unit of gradient torch gives to an arbitrary
    subset of the tied elements is spread evenly over all of them.
    """
    b, n = loss.shape
    lf = jax.lax.stop_gradient(loss).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(lf, jnp.int32)
    # keep the loss tensor materialized OUTSIDE the search loop — without
    # the barrier XLA rematerializes the full CE chain inside every one of
    # the 31 iterations (NOTES.md: same failure mode as the det-NMS loop)
    bits = jax.lax.optimization_barrier(bits)

    def body(i, cur):
        trial = cur | (1 << (30 - i))
        cnt = jnp.sum((bits >= trial).astype(jnp.int32), axis=1,
                      keepdims=True)
        return jnp.where(cnt >= k, trial, cur)

    kth_bits = jax.lax.fori_loop(0, 31, body,
                                 jnp.zeros((b, 1), jnp.int32))
    kth = jax.lax.bitcast_convert_type(kth_bits, jnp.float32)  # [B, 1]
    lf32 = loss.astype(jnp.float32)
    gt = lf32 > kth
    eq = lf32 == kth
    c_gt = jnp.sum(gt.astype(jnp.float32), axis=1)
    n_eq = jnp.maximum(jnp.sum(eq.astype(jnp.float32), axis=1), 1.0)
    s_gt = jnp.sum(lf32 * gt, axis=1)
    s_eq = jnp.sum(lf32 * eq, axis=1)
    return s_gt + (k - c_gt) / n_eq * s_eq


def _ce_per_pixel(
    logits: jnp.ndarray,  # [..., C]
    target: jnp.ndarray,  # [...] int
    weights: jnp.ndarray,  # [C]
    ignore_index: int,
    use_focal: bool,
    gamma: float,
    alpha: float,
) -> jnp.ndarray:
    """Per-pixel weighted CE / focal value, rank-agnostic ([..., C] logits)."""
    c = logits.shape[-1]
    target = target.astype(jnp.int32)
    if use_focal:
        # reference segmentation_loss.py:30-45 (including its eps terms)
        eps = 1e-8
        p = jax.nn.softmax(logits, axis=-1) + eps
        one_hot = jax.nn.one_hot(target, c, dtype=logits.dtype) + eps
        focal_w = jnp.power(1.0 - p, gamma)
        focal = -alpha * focal_w * jnp.log(p) * weights
        return jnp.sum(one_hot * focal, axis=-1)
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # per-pixel class pick + weight lookup as one-hot contractions: a
    # take_along_axis gather at this shape costs 208 ms/step on v5e vs
    # 3 ms for the contraction (TPU gathers are row-serial). Summing
    # value*{0,1} over C is exact, so numerics equal the gather form.
    one_hot = (tgt[..., None] == jnp.arange(c)).astype(logits.dtype)
    nll = -jnp.sum(logp * one_hot, axis=-1)
    pix_w = jnp.sum(one_hot * weights, axis=-1)
    return nll * pix_w * valid.astype(logits.dtype)


def _ce_reduce(loss: jnp.ndarray,  # [B, N] per-pixel values
               use_top_k: bool, top_k_ratio: float,
               use_focal: bool) -> jnp.ndarray:
    if use_top_k and not use_focal:
        # penalize the top-k hardest pixels — segmentation_loss.py:59-63.
        # top-k-as-threshold (exact sum, no sort): 251 -> ~4 ms at bs32.
        k = int(top_k_ratio * loss.shape[1])
        if k < 1:
            k = 1
        return jnp.mean(_topk_sum_bitsearch(loss, k) / k)
    return jnp.mean(loss)


def cross_entropy_loss(
    logits: jnp.ndarray,  # [B, H, W, C]
    target: jnp.ndarray,  # [B, H, W] int
    class_weights: Sequence[float],
    ignore_index: int = 255,
    use_top_k: bool = False,
    top_k_ratio: float = 1.0,
    use_focal: bool = False,
    gamma: float = 2.0,
    alpha: float = 1.0,
) -> jnp.ndarray:
    """Weighted CE with optional top-k hard-pixel mining or focal variant —
    reference segmentation_loss.py:5-65.

    Matches torch semantics: per-pixel loss is weight[target] * NLL, pixels
    equal to ignore_index contribute 0, and the final reduction is a plain
    mean over all (b, h*w) entries (torch reduction='none' then .mean()).
    """
    b = logits.shape[0]
    weights = jnp.asarray(class_weights, dtype=logits.dtype)
    per = _ce_per_pixel(logits, target, weights, ignore_index,
                        use_focal, gamma, alpha)
    return _ce_reduce(per.reshape(b, -1), use_top_k, top_k_ratio, use_focal)


def cross_entropy_loss_phases(
    phase_pairs,  # sequence of (logits [B, H, W, C], target [B, H, W])
    class_weights: Sequence[float],
    ignore_index: int = 255,
    use_top_k: bool = False,
    top_k_ratio: float = 1.0,
    use_focal: bool = False,
    gamma: float = 2.0,
    alpha: float = 1.0,
) -> jnp.ndarray:
    """CE over a pixel PARTITION given as equal-size phase slices.

    Exactly `cross_entropy_loss(interleave(phases), interleave(targets))`:
    every reduction (mean, top-k threshold counting, focal mean) is
    invariant to any permutation of pixels, so evaluating the per-pixel
    values on de-interleaved slices and concatenating is the identical
    loss — without ever materializing the full-resolution logits tensor
    (at C=5 its minor dim lane-pads 5 -> 128 on TPU: 6.4 GB physical at
    bs64/640^2 that exists only to be re-read by the loss). Used by the
    seg head's train-time phase output (heads/segmentation.py)."""
    b = phase_pairs[0][0].shape[0]
    weights = jnp.asarray(class_weights, dtype=phase_pairs[0][0].dtype)
    per = [
        _ce_per_pixel(lg, tg, weights, ignore_index, use_focal, gamma,
                      alpha).reshape(b, -1)
        for lg, tg in phase_pairs
    ]
    return _ce_reduce(jnp.concatenate(per, axis=1),
                      use_top_k, top_k_ratio, use_focal)


def _pack_phase_gt(target: jnp.ndarray, ignore_index: int) -> jnp.ndarray:
    """[B, 2H, 2W] int gt -> [B, H+1, W+1, 4] phase-major packed gt (the
    layout of `upsample2x_conv3x3_phase_logits`): phase (di, dj) cell
    (r, c) IS full-res pixel (2r-di, 2c-dj); border cells no full-res
    pixel maps to get ignore_index. Int-only strided slices + pads — the
    cheap, gradient-free direction. Shared by the phase-packed and
    w-packed CEs."""
    target = target.astype(jnp.int32)
    gts = []
    for di, dj in ((0, 0), (0, 1), (1, 0), (1, 1)):
        g = target[:, di::2, dj::2]  # [B, H, W] — exact phase view of gt
        gts.append(jnp.pad(g, ((0, 0), (di, 1 - di), (dj, 1 - dj)),
                           constant_values=ignore_index))
    return jnp.stack(gts, axis=-1)


def _packed_ce_reduce(per: jnp.ndarray, gtp: jnp.ndarray, b: int,
                      n_true: int, ignore_index: int,
                      use_top_k: bool, top_k_ratio: float,
                      use_focal: bool) -> jnp.ndarray:
    """Shared reduction tail of the packed CEs: per-cell values over a
    layout with extra non-pixel cells (phase borders, ragged packed
    tails) that carry gt = ignore_index. The focal branch of
    `_ce_per_pixel` has no ignore handling (the reference's doesn't
    either), so those cells are zeroed explicitly; zeros are exact
    no-ops in both the true-pixel-count mean and the top-k boundary sum
    (tied-at-zero entries contribute s_eq = 0)."""
    if use_focal:
        per = per * (gtp != ignore_index).astype(per.dtype)
    per = per.reshape(b, -1)
    if use_top_k and not use_focal:
        k = max(int(top_k_ratio * n_true), 1)
        return jnp.mean(_topk_sum_bitsearch(per, k) / k)
    return jnp.sum(per) / (b * n_true)


def cross_entropy_loss_phase_packed(
    z: jnp.ndarray,  # [B, H+1, W+1, 4*C] phase logits
    target: jnp.ndarray,  # [B, 2H, 2W] int — FULL-resolution gt
    class_weights: Sequence[float],
    ignore_index: int = 255,
    use_top_k: bool = False,
    top_k_ratio: float = 1.0,
    use_focal: bool = False,
    gamma: float = 2.0,
    alpha: float = 1.0,
) -> jnp.ndarray:
    """CE over the PACKED phase-logits tensor of
    `upsample2x_conv3x3_phase_logits` — one computation on the [B, H+1,
    W+1, 4C] layout instead of four per-slice losses.

    Numerically identical to `cross_entropy_loss(full_logits, target)`:
    grouped log-softmax over each C-lane block sees exactly the same C
    values each full-res pixel sees (phase (di, dj) cell (r, c) IS
    full-res pixel (2r-di, 2c-dj)), per-pixel values are the same
    products, and every reduction is permutation-invariant over pixels.

    Why this exists when `cross_entropy_loss_phases` already does the
    same math: the slicing form builds four spatially-shifted [B, H, W,
    C] tensors whose backward is four pad-transposes re-assembled into
    the z cotangent — measured -1.7% e2e at bs128 (KNOBS). Here the gt
    is rearranged ONCE into the z layout (strided int slices + pads —
    the cheap direction: int8-sized, no gradient) and both the per-pixel
    forward and the whole backward cotangent stay in z's own layout:
    the full-resolution float tensor exists in NEITHER direction and no
    slice/pad transposes appear in the grad path.

    The border cells of z that no full-res pixel maps to (phase (0,*)
    row H, phase (1,*) row 0, ditto columns) get gt = ignore_index so
    `_ce_per_pixel` zeroes them; see `_packed_ce_reduce` for why the
    extra cells are exact no-ops in every reduction."""
    b, hp, wp, c4 = z.shape
    c = c4 // 4
    h, w = hp - 1, wp - 1
    weights = jnp.asarray(class_weights, dtype=z.dtype)
    gtp = _pack_phase_gt(target, ignore_index)  # [B, H+1, W+1, 4]

    z5 = z.reshape(b, hp, wp, 4, c)
    per = _ce_per_pixel(z5, gtp, weights, ignore_index, use_focal,
                        gamma, alpha)  # [B, H+1, W+1, 4]
    return _packed_ce_reduce(per, gtp, b, 4 * h * w, ignore_index,
                             use_top_k, top_k_ratio, use_focal)


def cross_entropy_loss_wpacked(
    yw: jnp.ndarray,  # [B, H+1, WG, g*4*C] w-packed phase logits
    target: jnp.ndarray,  # [B, 2H, 2W] int — FULL-resolution gt
    class_weights: Sequence[float],
    g: int,
    ignore_index: int = 255,
    use_top_k: bool = False,
    top_k_ratio: float = 1.0,
    use_focal: bool = False,
    gamma: float = 2.0,
    alpha: float = 1.0,
) -> jnp.ndarray:
    """CE over the W-PACKED phase logits of
    `upsample2x_conv3x3_wpack_logits` — the train-side twin of the
    inference wpack argmax.

    Numerically identical to `cross_entropy_loss(full_logits, target)`
    for the same reason as `cross_entropy_loss_phase_packed`: packed cell
    (h', wgi, gi, phase) IS one full-res pixel, per-pixel values are the
    same products, and every reduction is permutation-invariant. The gt
    is rearranged ONCE into the packed layout (int strided slices + pads,
    no gradient); the forward logits AND the backward cotangent live in
    the [.., g*4*C] layout — 120/128 lanes at g=6/C=5 instead of the
    plain phase tensor's 20 -> 128 lane pad, whose physical HBM round
    trip is what kept `phase_loss` e2e-negative at bs128 (KNOBS: 233.1
    vs 237.0 samples/s) even though pixel math was identical.

    Cells that map to no true pixel — the phase borders (as in
    phase_packed) and the ragged packed-tail columns past W — get gt =
    ignore_index; see `_packed_ce_reduce`."""
    b, hp, wg, c4g = yw.shape
    c = c4g // (4 * g)
    h, w = hp - 1, target.shape[2] // 2
    weights = jnp.asarray(class_weights, dtype=yw.dtype)
    gtp = _pack_phase_gt(target, ignore_index)  # [B, H+1, W+1, 4]
    # pack columns exactly like the logits: col w = wgi*g + gi, ragged
    # tail gets ignore_index
    gtp = jnp.pad(gtp, ((0, 0), (0, 0), (0, wg * g - (w + 1)), (0, 0)),
                  constant_values=ignore_index)
    gtp = gtp.reshape(b, hp, wg, g * 4)

    z5 = yw.reshape(b, hp, wg, g * 4, c)
    per = _ce_per_pixel(z5, gtp, weights, ignore_index, use_focal,
                        gamma, alpha)  # [B, H+1, WG, g*4]
    return _packed_ce_reduce(per, gtp, b, 4 * h * w, ignore_index,
                             use_top_k, top_k_ratio, use_focal)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t sorted errors —
    loss_lovasz.py:19-31."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


_LOVASZ_SORT_WARN_N = 1 << 21  # ~2M elements


def _warn_if_big_sort(n: int, what: str) -> None:
    """The Lovász extension is DEFINED on sorted errors — there is no exact
    sort-free formulation (only the boundary values between distinct errors
    matter, but enumerating distinct f32 values is itself a sort). TPU sorts
    over multi-million-element axes are row-serial and slow (measured:
    lax.top_k ~250 ms at [32, 409600]; a full argsort is worse), which
    violates this repo's no-big-sorts rule — so enabling `use_lovasz` on TPU
    at training shapes craters the step time. Warn loudly instead of
    silently regressing; the knob is off in all three presets."""
    if n >= _LOVASZ_SORT_WARN_N and jax.default_backend() == "tpu":
        import warnings

        warnings.warn(
            f"{what}: sorting {n} elements per class on TPU costs hundreds "
            "of ms per step (see NOTES.md 'lovasz on TPU'); set "
            "segment.lovasz_bins > 0 (sort-free binned form, O(1/bins) "
            "from exact) or use the CE/top-k loss for TPU training.",
            RuntimeWarning, stacklevel=3)


def lovasz_softmax(
    probas: jnp.ndarray,  # [B, H, W, C] probabilities
    labels: jnp.ndarray,  # [B, H, W] int
    ignore: Optional[int] = 255,
) -> jnp.ndarray:
    """Multi-class Lovasz-Softmax (classes='present', per_image=False) —
    loss_lovasz.py:154-200, re-expressed with fixed shapes: ignored pixels are
    given error 0 / fg 0 so they sort last and contribute nothing (their
    products vanish), instead of torch's boolean filtering."""
    b, h, w, c = probas.shape
    _warn_if_big_sort(b * h * w, "lovasz_softmax")
    p = probas.reshape(-1, c)
    y = labels.reshape(-1).astype(jnp.int32)
    valid = (y != ignore) if ignore is not None else jnp.ones_like(y, bool)
    validf = valid.astype(p.dtype)

    def class_loss(ci):
        fg = (y == ci).astype(p.dtype) * validf
        errors = jnp.abs(fg - p[:, ci]) * validf
        order = jnp.argsort(-errors)  # descending
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        grad = _lovasz_grad(fg_sorted)
        loss_c = jnp.dot(errors_sorted, grad,
                         precision=jax.lax.Precision.HIGHEST)
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, present = jax.vmap(class_loss)(jnp.arange(c))
    presentf = present.astype(p.dtype)
    return jnp.sum(losses * presentf) / jnp.maximum(jnp.sum(presentf), 1.0)


def lovasz_softmax_binned(
    probas: jnp.ndarray,  # [B, H, W, C] probabilities
    labels: jnp.ndarray,  # [B, H, W] int
    ignore: Optional[int] = 255,
    bins: int = 1024,
) -> jnp.ndarray:
    """Sort-free Lovász-Softmax via counting statistics — the TPU-fast
    form behind `segment.lovasz_bins` (see `lovasz_softmax` for the exact
    sort-based semantics of loss_lovasz.py:154-200).

    Why this is possible: the Lovász extension value
    `dot(errors_sorted, grad)` depends on the errors only through their
    DESCENDING RANK GROUPS — `grad` is the first difference of a Jaccard
    curve evaluated at cumulative (count, foreground-count) prefixes, so
    any two orderings that agree on which group each pixel falls in give
    the same loss. Quantizing the errors (which live in [0, 1]) into
    `bins` equal buckets therefore yields the EXACT Lovász of the
    quantized ranking: per-bucket (count, fg-sum, err-sum) histograms
    replace the sort, cumulative sums over the `bins`-length axis replace
    the per-pixel prefix scan, and each pixel's error receives the
    bucket's Jaccard-difference weight spread evenly over the bucket
    (the same tie convention as `_topk_sum_bitsearch`; torch hands an
    arbitrary tie permutation to cumsum instead). The approximation error
    vs the unquantized loss is bounded by the bucket width times the
    total variation of the Jaccard curve: O(1/bins), measured ~1e-3 at
    bins=1024 (tests/test_phase_loss.py::test_lovasz_binned_*).

    Why histograms instead of the sort: TPU sorts over multi-million
    element axes are row-serial (measured in NOTES.md — this is the
    repo's no-big-sorts rule), while the histograms here are three
    one-hot contractions [S, CH] @ [CH, 3S] with bins = S*S — MXU work.
    The pixel axis is processed in `chunk`-row pieces by a lax.scan for
    two reasons: (a) the [CH, 3S] f32 dot operand stays bounded
    (~0.4 GB at the default 2^20 instead of ~20 GB for all of bs128 in
    one piece), and (b) per-chunk bucket counts stay below 2^24, so the
    f32 accumulator never hits the x+1 == x integer-saturation wall
    (cross-chunk adds of similar-magnitude partials carry ~1e-7 relative
    error, harmless in the Jaccard ratios). Classes run sequentially
    (lax.map) so only one class's operands are live. Cost is HBM-bound
    on the operand build: ~2 GB of traffic per 13M pixels per class —
    tens of ms for the whole loss at training shapes, vs hundreds of ms
    PER CLASS for the sort. Gradients flow through the err-sum histogram
    only (the bucket assignment and Jaccard weights are stop-gradient,
    exactly like torch's detached `perm`/`grad`)."""
    b, h, w, c = probas.shape
    s = int(np.sqrt(bins))
    assert s * s == bins, "bins must be a perfect square (one-hot split)"
    p = probas.astype(jnp.float32).reshape(-1, c)
    y = labels.reshape(-1).astype(jnp.int32)
    n = p.shape[0]
    valid = (y != ignore) if ignore is not None else jnp.ones_like(y, bool)
    validf = valid.astype(jnp.float32)
    arange_s = jnp.arange(s, dtype=jnp.int32)
    ch = min(1 << 20, n)
    nc = -(-n // ch)
    pad = nc * ch - n

    def class_loss(ci):
        fg = (y == ci).astype(jnp.float32) * validf
        err = jnp.abs(fg - p[:, ci]) * validf  # in [0, 1]
        # bucket index with bucket 0 = LARGEST errors, so ascending
        # cumsums walk the descending sort order. Invalid pixels carry
        # err = 0 / fg = 0: they land in the last bucket where — as in
        # the exact form, where they sort last — their contribution
        # vanishes with their error.
        idx = jnp.clip(((1.0 - jax.lax.stop_gradient(err)) * bins)
                       .astype(jnp.int32), 0, bins - 1)
        wts = jnp.stack(
            [jnp.ones_like(err), fg, err], axis=-1)  # [N, 3]
        # chunk the pixel axis; padded rows carry zero weights so their
        # bucket assignment is irrelevant
        idx_c = jnp.pad(idx, (0, pad)).reshape(nc, ch)
        wts_c = jnp.pad(wts, ((0, pad), (0, 0))).reshape(nc, ch, 3)

        def body(acc, xs):
            ic, wc = xs
            oh_hi = ((ic // s)[:, None] == arange_s).astype(jnp.float32)
            oh_lo = ((ic % s)[:, None] == arange_s).astype(jnp.float32)
            m = (oh_lo[:, :, None] * wc[:, None, :]).reshape(ch, 3 * s)
            return acc + jax.lax.dot_general(
                oh_hi, m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), None

        hist, _ = jax.lax.scan(body, jnp.zeros((s, 3 * s), jnp.float32),
                               (idx_c, wts_c))
        hist = hist.reshape(s, s, 3).reshape(bins, 3)
        cnt, fgs, errs = hist[:, 0], hist[:, 1], hist[:, 2]
        cum_n = jnp.cumsum(cnt)
        cum_f = jnp.cumsum(fgs)
        gts = cum_f[-1]
        intersection = gts - cum_f
        union = gts + (cum_n - cum_f)
        jaccard = 1.0 - intersection / jnp.maximum(union, 1.0)
        djac = jaccard - jnp.concatenate([jnp.zeros((1,)), jaccard[:-1]])
        bucket_w = jax.lax.stop_gradient(djac / jnp.maximum(cnt, 1.0))
        loss_c = jnp.dot(bucket_w, errs,
                         precision=jax.lax.Precision.HIGHEST)
        present = gts > 0
        return loss_c, present

    losses, present = jax.lax.map(class_loss, jnp.arange(c))
    presentf = present.astype(jnp.float32)
    return jnp.sum(losses * presentf) / jnp.maximum(jnp.sum(presentf), 1.0)


def _lovasz_hinge_flat(logits: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """Binary Lovász hinge on flat [P] logits/labels with a validity mask —
    loss_lovasz.py:96-111 (lovasz_hinge_flat) with fixed shapes: instead of
    torch's boolean filtering, invalid pixels get error -1e30 (they sort
    last, relu zeroes their contribution) and fg 0 (they never perturb the
    cumulative Jaccard of the valid prefix)."""
    fg = labels.astype(jnp.float32) * valid
    signs = 2.0 * fg - 1.0
    errors = (1.0 - logits.astype(jnp.float32) * signs)
    errors = jnp.where(valid > 0, errors, -1e30)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = fg[order]
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), grad,
                   precision=jax.lax.Precision.HIGHEST)


def lovasz_hinge(
    logits: jnp.ndarray,  # [B, H, W] raw logits
    labels: jnp.ndarray,  # [B, H, W] binary {0, 1}
    per_image: bool = True,
    ignore: Optional[int] = None,
) -> jnp.ndarray:
    """Binary Lovász hinge — loss_lovasz.py:79-94. Dead code in the
    reference pipeline (only lovasz_softmax is reachable from model.py:118),
    implemented for capability parity."""
    _warn_if_big_sort(int(np.prod(labels.shape[1:] if per_image
                                  else labels.shape)), "lovasz_hinge")
    valid = (jnp.ones(labels.shape, jnp.float32) if ignore is None
             else (labels != ignore).astype(jnp.float32))
    if per_image:
        flat = lambda a: a.reshape(a.shape[0], -1)
        losses = jax.vmap(_lovasz_hinge_flat)(flat(logits), flat(labels),
                                              flat(valid))
        return jnp.mean(losses)
    return _lovasz_hinge_flat(logits.reshape(-1), labels.reshape(-1),
                              valid.reshape(-1))


def binary_xloss(
    logits: jnp.ndarray,  # [B, H, W] raw logits
    labels: jnp.ndarray,  # [B, H, W] binary {0, 1}
    ignore: Optional[int] = None,
) -> jnp.ndarray:
    """Numerically-stable binary cross-entropy on masked pixels —
    loss_lovasz.py:129-147 (StableBCELoss + binary_xloss). The mean runs
    over valid pixels only (torch filters them out; here they are masked)."""
    x = logits.astype(jnp.float32).reshape(-1)
    t = labels.astype(jnp.float32).reshape(-1)
    valid = (jnp.ones_like(t) if ignore is None
             else (labels.reshape(-1) != ignore).astype(jnp.float32))
    loss = jnp.clip(x, 0, None) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)
