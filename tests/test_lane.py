"""Lane head, codec (encode + on-device decode/NMS), and losses: golden
parity vs the reference implementation."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import tests.ref_compat as rc
from hydranet_tpu.heads.lane import LaneHead
from hydranet_tpu.heads.lane_codec import (
    LaneCodec, decode_lanes, lane_nms, lanes_to_points)
from hydranet_tpu.heads.lane_loss import lane_cls_loss, lane_reg_loss
from hydranet_tpu.utils.torch_import import import_state_dict

W = H = 256
STRIDE = 32
INTERVAL = 8
PPL = H // INTERVAL  # 32
FH = FW = H // STRIDE  # 8


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def _rand_lanes(rng, n_lanes=3):
    """Synthetic plausible lane annotations in a 512x512 source image."""
    lines = []
    for _ in range(n_lanes):
        x0 = rng.uniform(50, 450)
        slope = rng.uniform(-0.8, 0.8)
        curve = rng.uniform(-3e-4, 3e-4)
        pts = []
        for y in np.linspace(rng.uniform(150, 250), 511, 8):
            x = x0 + slope * (y - 511) + curve * (y - 511) ** 2
            pts.append({"x": float(x), "y": float(y)})
        lines.append(pts[::-1])
    return {"Lines": lines, "Labels": ["lane"] * n_lanes}


@pytest.mark.parametrize("stride", [16, 32])
def test_lane_head_parity(stride):
    rc.install()
    from head_lane.lanedetect import LaneHeader as RefLane

    base = 16 * 4
    ref = RefLane(base_channel=base, num_classes=2, stride=stride,
                  input_width=W, input_height=H, interval=INTERVAL).eval()
    model = LaneHead(base_channel=base, num_classes=2, stride=stride,
                     input_width=W, input_height=H, interval=INTERVAL)

    feats = [np.random.randn(2, 16, s, s).astype(np.float32)
             for s in [32, 16, 8, 4]]
    with torch.no_grad():
        want = ref([torch.from_numpy(f) for f in feats])

    inputs = [jnp.asarray(_nhwc(f)) for f in feats]
    variables = model.init(jax.random.PRNGKey(0), inputs)
    variables = import_state_dict(variables, ref.state_dict())
    got = model.apply(variables, inputs, train=False)

    np.testing.assert_allclose(np.asarray(got["predict_cls"]),
                               want["predict_cls"].numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["predict_loc"]),
                               want["predict_loc"].numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("interpolation", [True, False])
def test_encode_lane_parity(interpolation):
    rc.install()
    from head_lane.lane_codec import LaneCodec as RefCodec

    ref = RefCodec(input_width=W, input_height=H, anchor_stride=STRIDE,
                   points_per_line=PPL, do_interpolate=interpolation,
                   anchor_lane_num=1, scale_invariance=True)
    mine = LaneCodec(input_width=W, input_height=H, anchor_stride=STRIDE,
                     points_per_line=PPL, do_interpolate=interpolation,
                     anchor_lane_num=1, scale_invariance=True)

    rng = np.random.RandomState(7)
    for trial in range(5):
        lanes = _rand_lanes(rng, n_lanes=rng.randint(0, 5))
        want_type, want_loc = ref.encode_lane(lanes, 512, 512)
        got_type, got_loc = mine.encode_lane(lanes, 512, 512)
        np.testing.assert_allclose(got_type, want_type, atol=0,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(got_loc, want_loc, rtol=1e-5, atol=1e-5,
                                   err_msg=f"trial {trial}")


def _ref_decode_to_grid(ref_lanes, ppl):
    """Reference Lane objects -> (prob, start, end, xs-grid) for comparison."""
    out = []
    for lane in ref_lanes:
        xs = np.zeros(ppl)
        mask = np.zeros(ppl, bool)
        for k, pt in enumerate(lane.lane):
            pos = lane.start_pos + k
            xs[pos] = pt.x
            mask[pos] = True
        out.append((lane.prob, lane.start_pos, lane.end_pos, xs, mask))
    return out


def test_decode_and_nms_parity():
    rc.install()
    from head_lane.lane_codec import LaneCodec as RefCodec
    from head_lane.lane_codec_utils import nms_with_pos

    ref = RefCodec(input_width=W, input_height=H, anchor_stride=STRIDE,
                   points_per_line=PPL, do_interpolate=True,
                   anchor_lane_num=1, scale_invariance=True)

    rng = np.random.RandomState(3)
    n = FH * FW
    d = 2 * PPL + 2
    # realistic predictions: a few confident anchors with smooth offsets
    logits = rng.randn(n, 2).astype(np.float32)
    logits[:, 1] -= 4
    hot = rng.choice(n, size=10, replace=False)
    logits[hot, 1] += rng.uniform(6, 10, 10).astype(np.float32)
    cls_prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    loc = rng.randn(n, d).astype(np.float32) * 1.5
    loc[:, PPL] = rng.randint(0, PPL, n)      # down counts
    loc[:, PPL + 1] = rng.randint(0, PPL, n)  # up counts

    want_set = ref.decode_lane(torch.from_numpy(cls_prob),
                               torch.from_numpy(loc), exist_threshold=0.5)
    want = _ref_decode_to_grid(want_set, PPL)

    got = decode_lanes(
        jnp.asarray(cls_prob), jnp.asarray(loc), feature_height=FH,
        feature_width=FW, points_per_line=PPL, interval=H / PPL,
        stride=STRIDE, input_width=W, input_height=H,
        scale_invariance=True, exist_threshold=0.5)

    got_valid = [i for i in range(n) if bool(got.valid[i])]
    assert len(got_valid) == len(want)
    for (prob, s, e, xs, mask), i in zip(want, got_valid):
        assert abs(float(got.prob[i]) - prob) < 1e-5
        assert int(got.start[i]) == s
        assert int(got.end[i]) == e
        np.testing.assert_array_equal(np.asarray(got.mask[i]), mask)
        np.testing.assert_allclose(np.asarray(got.xs[i])[mask], xs[mask],
                                   rtol=1e-4, atol=1e-3)

    # --- NMS parity
    want_nms = nms_with_pos(want_set, thresh=60)
    got_nms = lane_nms(got, thresh=60, top_k=32, max_lanes=16)
    n_kept = int(np.sum(np.asarray(got_nms.valid)))
    assert n_kept == len(want_nms)
    want_probs = sorted([l.prob for l in want_nms], reverse=True)
    got_probs = sorted(np.asarray(got_nms.prob)[np.asarray(got_nms.valid)],
                       reverse=True)
    np.testing.assert_allclose(got_probs, want_probs, rtol=1e-5)


def test_lane_loss_parity():
    rc.install()
    from head_lane.lanedetect_loss import cal_loss_cls, cal_loss_regress

    rng = np.random.RandomState(11)
    b, n, d = 2, FH * FW, 2 * PPL + 2
    cls_t = np.zeros((b, n, 2), dtype=np.float32)
    fg = rng.rand(b, n) > 0.9
    cls_t[..., 1] = fg
    cls_t[..., 0] = ~fg
    cls_p = rng.randn(b, n, 2).astype(np.float32)
    loc_t = (rng.randn(b, n, d) * (rng.rand(b, n, d) > 0.5)).astype(np.float32)
    loc_p = rng.randn(b, n, d).astype(np.float32)

    wp, wn, wpmask, wpos = cal_loss_cls(torch.from_numpy(cls_t),
                                        torch.from_numpy(cls_p))
    # pass the true points_per_line to both (see lane_loss.py docstring)
    wreg = cal_loss_regress(wpmask, wpos, torch.from_numpy(loc_t),
                            torch.from_numpy(loc_p), points_per_line=PPL)

    gp, gn, gpmask, gpos = lane_cls_loss(jnp.asarray(cls_t), jnp.asarray(cls_p))
    greg = lane_reg_loss(gpmask, gpos, jnp.asarray(loc_t), jnp.asarray(loc_p),
                         points_per_line=PPL)

    np.testing.assert_allclose(float(gp), wp.item(), rtol=1e-4)
    np.testing.assert_allclose(float(gn), wn.item(), rtol=1e-4)
    np.testing.assert_allclose(float(greg), wreg.item(), rtol=1e-4)
    assert int(gpos) == int(wpos)
