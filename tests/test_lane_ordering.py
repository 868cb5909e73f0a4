"""Lane ordering idx assignment + idx-colored overlay (reference
order_lane_x_axis, lane_codec_utils.py:185-235, wired into the demo overlay
as scale_to_org does, lanedetect.py:118-124)."""

import numpy as np

from hydranet_tpu.heads.lane_ordering import order_lanes_x_axis


def _lane(xs_bottom_to_top, ys_bottom_to_top, score=0.9):
    return {"score": score,
            "points": [{"x": float(x), "y": float(y)}
                       for x, y in zip(xs_bottom_to_top, ys_bottom_to_top)]}


def test_signed_idx_assignment():
    h = 100
    # two left lanes (leaning left: x decreases going down => slope k <= 0
    # in the ordering's convention) and two right lanes
    left2 = _lane([10, 30], [99, 50])    # crosses bottom near x=10
    left1 = _lane([40, 60], [99, 50])    # crosses near x=40
    right1 = _lane([60, 40], [99, 50])   # crosses near x=60, k > 0
    right2 = _lane([90, 70], [99, 50])   # crosses near x=90
    ordered = order_lanes_x_axis([right2, left1, right1, left2], height=h)
    by_idx = {l["idx"]: l for l in ordered}
    assert sorted(by_idx) == [-2, -1, 1, 2]
    assert by_idx[-2]["points"][0]["x"] == 10
    assert by_idx[-1]["points"][0]["x"] == 40
    assert by_idx[1]["points"][0]["x"] == 60
    assert by_idx[2]["points"][0]["x"] == 90
    # sorted left-to-right
    assert [l["idx"] for l in ordered] == [-2, -1, 1, 2]


def test_all_same_side():
    h = 100
    r1 = _lane([50, 30], [99, 50])
    r2 = _lane([80, 60], [99, 50])
    ordered = order_lanes_x_axis([r2, r1], height=h)
    assert [l["idx"] for l in ordered] == [1, 2]


def test_visualize_colors_by_idx(monkeypatch):
    """The overlay draws each ordered lane in its signed-index color."""
    import cv2

    from hydranet_tpu import inference as inf

    calls = []
    real_line = cv2.line

    def spy_line(im, p0, p1, color, thickness):
        calls.append(color)
        return real_line(im, p0, p1, color, thickness)

    monkeypatch.setattr(cv2, "line", spy_line)

    class _Pipe:
        pass

    # drive only the lane branch of visualize via a minimal fake results dict
    from tests.test_hydranet import small_config
    from hydranet_tpu.config import Config
    from hydranet_tpu.inference import InferencePipeline
    import jax.numpy as jnp
    import jax

    cfg = small_config()
    from hydranet_tpu.models.hydranet import HydraNet
    model = HydraNet(cfg=cfg)
    x0 = jnp.zeros((1, *cfg.input_hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    pipe = InferencePipeline(cfg, variables, batch_size=1)

    # build a fake decoded-lanes structure: 2 lanes, one left one right
    from hydranet_tpu.heads.lane_codec import DecodedLanes

    ppl = cfg.lane_points_per_line
    n = 2
    xs = np.zeros((1, n, ppl + 1), np.float32)
    mask = np.zeros((1, n, ppl + 1), bool)
    # lane 0: left of ego (x increases going up-image, toward the vanishing
    # point => negative slope k in the ordering's convention)
    xs[0, 0, :3] = [40, 45, 50]
    # lane 1: right of ego (x decreases going up-image => positive k)
    xs[0, 1, :3] = [90, 85, 80]
    mask[0, :, :3] = True
    lanes = DecodedLanes(
        prob=jnp.asarray([[0.95, 0.9]]),
        xs=jnp.asarray(xs), mask=jnp.asarray(mask),
        start=jnp.asarray([[0, 0]]), end=jnp.asarray([[2, 2]]),
        valid=jnp.asarray([[True, True]]),
        anchor=jnp.zeros((1, n, 2), jnp.int32))

    frame = np.zeros((cfg.input_hw[0], cfg.input_hw[1], 3), np.uint8)
    out = pipe.visualize({"lanes": lanes}, [frame])
    assert len(out) == 1
    used = set(calls)
    assert inf.LANE_IDX_COLORS[-1] in used, used
    assert inf.LANE_IDX_COLORS[1] in used, used
