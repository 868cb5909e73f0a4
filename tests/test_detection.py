"""Detection head, anchors, loss, and on-device postprocess: golden parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import tests.ref_compat as rc
from hydranet_tpu.heads import detection as det
from hydranet_tpu.heads.detection_loss import focal_loss
from hydranet_tpu.utils.torch_import import import_state_dict


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


ASPECT_RATIOS = ((1.0, 1.0), (1.4, 0.7), (0.7, 1.4))
SCALES = (2 ** 0.0, 2 ** 0.333, 2 ** 0.667)


def test_anchors_match_reference():
    rc.install()
    from head_detect.detection import Anchors as RefAnchors

    ref = RefAnchors(anchor_scale=2.0, pyramid_levels=[3, 4, 5, 6, 7],
                     scales=list(SCALES), ratio=list(ASPECT_RATIOS))
    img = torch.zeros(1, 3, 128, 128)
    want = ref(img).numpy()[0]
    got = det.generate_anchors((128, 128), 2.0, [3, 4, 5, 6, 7],
                               SCALES, ASPECT_RATIOS)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def _build_pair(num_classes=4, channels=16, levels=5):
    rc.install()
    from head_detect.detection import DetectionHeader as RefHead

    ref = RefHead(num_classes=num_classes, fpn_num_filters_detect=channels,
                  aspect_ratios=list(ASPECT_RATIOS), scales=list(SCALES),
                  box_class_repeats=2, pyramid_levels=levels,
                  anchor_scale=2.0).eval()
    model = det.DetectionHead(
        num_classes=num_classes, in_channels=channels,
        aspect_ratios=ASPECT_RATIOS, scales=SCALES, box_class_repeats=2,
        pyramid_levels=levels, anchor_scale=2.0)
    return ref, model


def test_detection_head_parity():
    ref, model = _build_pair()
    feats = [np.random.randn(2, 16, s, s).astype(np.float32)
             for s in [16, 8, 4, 2, 1]]
    x = np.zeros((2, 3, 128, 128), dtype=np.float32)
    with torch.no_grad():
        want_anchors, want_reg, want_cls = ref(
            torch.from_numpy(x), [torch.from_numpy(f) for f in feats])

    inputs = [jnp.asarray(_nhwc(f)) for f in feats]
    variables = model.init(jax.random.PRNGKey(0), (128, 128), inputs)
    variables = import_state_dict(variables, ref.state_dict())
    anchors, reg, cls = model.apply(variables, (128, 128), inputs, train=False)

    np.testing.assert_allclose(np.asarray(anchors), want_anchors.numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), want_reg.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cls), want_cls.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_focal_loss_parity():
    rc.install()
    from head_detect.detection_loss import FocalLoss as RefLoss

    b, num_classes = 3, 4
    anchors_np = det.generate_anchors((128, 128), 2.0, [3, 4, 5],
                                      SCALES, ASPECT_RATIOS)
    a = anchors_np.shape[0]
    cls = 1.0 / (1.0 + np.exp(-np.random.randn(b, a, num_classes))) \
        .astype(np.float32)
    reg = (0.1 * np.random.randn(b, a, 4)).astype(np.float32)

    # padded annotations, image 2 has none (exercises the empty branch)
    ann = -np.ones((b, 5, 5), dtype=np.float32)
    for i in range(2):
        for j in range(3):
            x1, y1 = np.random.uniform(0, 80, 2)
            bw, bh = np.random.uniform(10, 40, 2)
            ann[i, j] = [x1, y1, x1 + bw, y1 + bh,
                         np.random.randint(0, num_classes)]

    ref = RefLoss()
    want_cls, want_reg = ref(torch.from_numpy(cls), torch.from_numpy(reg),
                             torch.from_numpy(anchors_np[None]),
                             torch.from_numpy(ann))
    got_cls, got_reg = focal_loss(jnp.asarray(cls), jnp.asarray(reg),
                                  jnp.asarray(anchors_np[None]),
                                  jnp.asarray(ann))
    np.testing.assert_allclose(float(got_cls[0]), float(want_cls[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(got_reg[0]), float(want_reg[0]),
                               rtol=1e-4, atol=1e-5)


def test_postprocess_parity():
    """On-device top-k + NMS postprocess vs the reference host-side
    postprocess (detection_loss.py:70-108) with identical inputs."""
    rc.install()
    from head_detect.detection_loss import (BBoxTransform, ClipBoxes,
                                            postprocess as ref_post)

    rng = np.random.RandomState(42)
    b, num_classes = 2, 4
    anchors_np = det.generate_anchors((128, 128), 2.0, [3, 4, 5],
                                      SCALES, ASPECT_RATIOS)
    a = anchors_np.shape[0]
    # mostly background, some confident detections
    logits = rng.randn(b, a, num_classes) * 0.5 - 6
    for i in range(b):
        hot = rng.choice(a, size=60, replace=False)
        logits[i, hot, rng.randint(0, num_classes, 60)] += rng.uniform(4, 10, 60)
    cls = (1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
    reg = (0.2 * rng.randn(b, a, 4)).astype(np.float32)

    x = torch.zeros(b, 3, 128, 128)
    want = ref_post(x, torch.from_numpy(np.stack([anchors_np] * b)),
                    torch.from_numpy(reg), torch.from_numpy(cls),
                    BBoxTransform(), ClipBoxes(), 0.3, 0.3)

    got = det.postprocess(jnp.asarray(anchors_np[None]), jnp.asarray(reg),
                          jnp.asarray(cls), (128, 128), score_threshold=0.3,
                          iou_threshold=0.3, pre_nms_top_k=512,
                          max_detections=64)

    for i in range(b):
        n = int(np.sum(np.asarray(got.valid[i])))
        assert n == len(want[i]["rois"]), f"image {i}: {n} vs {len(want[i]['rois'])}"
        if n:
            np.testing.assert_allclose(np.asarray(got.boxes[i][:n]),
                                       want[i]["rois"], rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(np.asarray(got.scores[i][:n]),
                                       want[i]["scores"], rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(got.classes[i][:n]),
                                          want[i]["class_ids"])


def test_certified_block_topk_exact():
    """Block-preselected top-k matches lax.top_k on the above-threshold set
    in every regime: sparse, spatially clumped (stresses the strided
    partition), and certificate-violating (falls back to full top_k)."""
    k, thresh = 500, 0.4
    rng = np.random.RandomState(7)

    def check(scores):
        v_ref, i_ref = jax.jit(lambda s: jax.lax.top_k(s, k))(scores)
        v, i = jax.jit(lambda s: det.certified_block_topk(
            s, k, thresh, block_size=512, max_per_block=32))(scores)
        # exactness on the subset consumers keep (score > thresh)
        m_ref, m = np.asarray(v_ref) > thresh, np.asarray(v) > thresh
        np.testing.assert_array_equal(np.where(m_ref, np.asarray(i_ref), -1),
                                      np.where(m, np.asarray(i), -1))
        np.testing.assert_array_equal(np.where(m_ref, np.asarray(v_ref), 0),
                                      np.where(m, np.asarray(v), 0))

    a = 40000
    base = (rng.rand(2, a) * 0.35).astype(np.float32)

    check(jnp.asarray(base))                       # nothing above threshold

    clumped = base.copy()                          # contiguous hot run
    clumped[0, 1000:1400] = 0.45 + 0.5 * rng.rand(400)
    clumped[1, 30000:30200] = 0.45 + 0.5 * rng.rand(200)
    check(jnp.asarray(clumped))

    dense = base.copy()                            # one block > max_per_block
    nb = -(-a // 512)                              # -> tier-2 (m=128) path
    hot_idx = np.arange(64) * nb + 3               # all in strided block 3
    dense[0, hot_idx] = 0.45 + 0.5 * rng.rand(64)
    check(jnp.asarray(dense))

    denser = base.copy()                           # one block > 4x tier ->
    hot_idx = np.arange(200) * nb + 5              # full lax.top_k fallback
    denser[1, hot_idx] = 0.45 + 0.5 * rng.rand(200)
    check(jnp.asarray(denser))

    small = (rng.rand(2, 800).astype(np.float32))  # a <= 4k: plain top_k path
    check(jnp.asarray(small))


def test_jacobi_nms_matches_greedy_oracle():
    """The fixpoint NMS must equal sequential greedy exactly, including
    suppression chains (A kills B, so B cannot kill C) and all-invalid
    rows."""
    rng = np.random.RandomState(11)
    k = 200

    def numpy_greedy(boxes, valid, thr):
        iou = np.asarray(det._iou_matrix(jnp.asarray(boxes)))
        keep = np.zeros(k, bool)
        supp = np.zeros(k, bool)
        for i in range(k):
            if valid[i] and not supp[i]:
                keep[i] = True
                supp |= (iou[i] > thr) & (np.arange(k) > i) & valid
        return keep

    for trial in range(3):
        centers = rng.rand(k, 2) * 200          # clustered -> chains
        wh = 20 + rng.rand(k, 2) * 40
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                               -1).astype(np.float32)
        scores = np.sort(rng.rand(k).astype(np.float32))[::-1].copy()
        valid = rng.rand(k) > (0.2 if trial < 2 else 1.1)  # last: none valid
        got = np.asarray(det.greedy_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.4))
        want = numpy_greedy(boxes, valid, 0.4)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")
