"""End-to-end inference pipeline (TPU-native equivalent of
/root/reference/model/demo.py).

The reference's per-frame path is: host preprocess (cv2) -> CUDA forward ->
host decode loops (demo.py:188-244). Here preprocess (resize + imagenet
normalize), the 3-head forward, and ALL post-processing (box decode +
class-aware NMS, seg argmax, lane decode + lane NMS) compile into ONE XLA
program over a fixed batch shape — zero per-frame host round trips; the host
only converts compact fixed-shape results for visualization.

Also provides the deployment-artifact export: `jax.export` serializes the
compiled pipeline to portable StableHLO bytes — the TPU-native replacement
for the reference's ONNX boundary (demo.py:134-148).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hydranet_tpu.config import Config
from hydranet_tpu.heads import detection as det_ops
from hydranet_tpu.heads import lane_codec as lane_ops
from hydranet_tpu.models.hydranet import HydraNet

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# fixed demo visualization palette — demo.py:88-93
SEG_CLASS_COLORS = {0: (0, 0, 0), 1: (128, 0, 128), 2: (255, 255, 255),
                    3: (0, 255, 255), 4: (0, 255, 0)}

# per-signed-index lane colors (BGR): ego-adjacent lanes pop, outer lanes
# cool down; anything beyond +-3 falls back to the reference's yellow
# (lanedetect.py:159). Index semantics: -1 first lane left of ego, +1 first
# right (order_lane_x_axis, lane_codec_utils.py:185-235).
LANE_IDX_COLORS = {-3: (180, 120, 0), -2: (255, 140, 0), -1: (0, 0, 255),
                   1: (0, 255, 255), 2: (0, 200, 80), 3: (160, 255, 120)}


def preprocess_images(images: jnp.ndarray, target_hw: Tuple[int, int],
                      dtype=jnp.float32, allow_pallas: bool = True
                      ) -> jnp.ndarray:
    """uint8 RGB [B, H0, W0, 3] -> normalized [B, H, W, 3] on device
    (bilinear resize with half-pixel centers, matching cv2 INTER_LINEAR used
    by demo.py:192; then the imagenet normalize of demo.py:26-40).

    Rational downscales (any real camera resolution -> net input) take the
    fused Pallas resize+normalize kernel (ops/resize.py): exact cv2
    INTER_LINEAR taps, 4.2 vs 10.4 ms at bs128 1080p. Other shape pairs
    fall back to jax.image.resize; `allow_pallas=False` forces the
    fallback (used by the mesh-sharded pipeline, where a pallas_call has
    no SPMD partitioning rule)."""
    from hydranet_tpu.ops import resize as fused_resize

    b, h0, w0, _ = images.shape
    if (h0, w0) != tuple(target_hw) \
            and fused_resize.supports((h0, w0), target_hw):
        if allow_pallas and images.dtype == jnp.uint8 \
                and jax.default_backend() == "tpu":
            return fused_resize.resize_normalize_u8(images, tuple(target_hw),
                                                    out_dtype=dtype)
        # same 2-tap periodic math as plain XLA einsums (shardable under a
        # mesh, runs anywhere) so every backend agrees with the kernel
        return fused_resize.resize_normalize_reference(
            images, tuple(target_hw), dtype=dtype)
    x = images.astype(dtype)
    if (h0, w0) != tuple(target_hw):
        # resize FIRST (on 0..255 values) so the big source-resolution tensor
        # is touched once; the /255 + imagenet normalize folds into a single
        # per-channel affine on the small resized tensor (resize is linear,
        # so this is exact up to float rounding). 14.5 -> 10.5 ms at bs128.
        x = jax.image.resize(x, (b, target_hw[0], target_hw[1], 3),
                             method="linear")
    scale = 1.0 / (255.0 * jnp.asarray(IMAGENET_STD, dtype))
    shift = jnp.asarray(IMAGENET_MEAN, dtype) / jnp.asarray(IMAGENET_STD, dtype)
    return x * scale - shift


class InferencePipeline:
    """Compiled batch pipeline: raw frames in, decoded results out."""

    def __init__(self, cfg: Config, variables: Dict[str, Any],
                 batch_size: int = 1,
                 input_hw: Optional[Tuple[int, int]] = None,
                 compute_dtype=jnp.bfloat16,
                 det_conf_thres: float = 0.4, det_iou_thres: float = 0.3,
                 lane_conf_thres: float = 0.9, lane_nms_thres: float = 80.0,
                 mesh=None, quant: str = "off", spatial: bool = False):
        """quant: 'off' (default) or 'int8' — serving-path post-training
        quantization (ops/quantize.py). 'int8' needs calibrated activation
        scales: either pass an `act_stats` collection inside `variables`
        or call `calibrate(frame_batches)` before the first inference.

        spatial: with a mesh, shard the image HEIGHT over every mesh
        device instead of the batch — latency-oriented SP for single-frame
        inference (one frame's convs run on all chips; XLA GSPMD inserts
        the halo exchanges). Throughput serving should keep the default
        batch sharding."""
        from hydranet_tpu.ops import quantize as qz

        assert quant in ("off", "int8"), quant
        self.quant = quant
        self.cfg = cfg
        self.variables = variables
        self.batch_size = batch_size
        self.net_hw = cfg.input_hw
        self.input_hw = input_hw or self.net_hw
        self.compute_dtype = compute_dtype
        self.model = HydraNet(cfg=cfg, dtype=compute_dtype)

        h, w = self.net_hw
        fh, fw = cfg.lane_feat_hw
        ppl = cfg.lane_points_per_line
        cfg_d, cfg_l = cfg.detection, cfg.lane

        def run_body(variables, frames):
            from hydranet_tpu.parallel.spatial import shard_spatial

            x = preprocess_images(frames, self.net_hw, dtype=compute_dtype,
                                  allow_pallas=mesh is None)
            x = shard_spatial(x)
            # seg_argmax: the final seg stage emits class ids directly (the
            # full-res logits never exist) — segmentation decode fused into
            # the forward, as the reference's deploy graph inlines argmax
            # (model.py:193-198).
            # quant_mode is a trace-time switch: it must wrap the apply's
            # BODY (jit traces lazily on first call, not at construction).
            with qz.quant_mode("int8" if self.quant == "int8" else "off"):
                out = self.model.apply(variables, x, train=False,
                                       seg_argmax=True)
            results: Dict[str, Any] = {}
            if cfg.train.train_seg:
                results["seg"] = out["seg"]
            if cfg.train.train_detect:
                d = out["detection"]
                # bf16 passes straight through: selection is monotone in
                # any dtype and postprocess casts the K kept rows to f32
                # itself (all-anchor casts would materialize ~0.5 GB)
                results["detections"] = det_ops.postprocess(
                    d["anchors"],
                    d["regression"],
                    d["classification"],
                    self.net_hw,
                    score_threshold=det_conf_thres,
                    iou_threshold=det_iou_thres,
                    pre_nms_top_k=cfg_d.pre_nms_top_k,
                    max_detections=cfg_d.max_detections,
                    use_approx_top_k=getattr(cfg_d, "use_approx_top_k",
                                             False))
            if cfg.train.train_lane:
                def one(cls_i, loc_i):
                    lanes = lane_ops.decode_lanes(
                        jax.nn.softmax(cls_i.astype(jnp.float32), axis=-1),
                        loc_i.astype(jnp.float32),
                        feature_height=fh, feature_width=fw,
                        points_per_line=ppl, interval=h / ppl,
                        stride=cfg_l.anchor_stride,
                        input_width=w, input_height=h,
                        scale_invariance=cfg_l.scale_invariance,
                        exist_threshold=lane_conf_thres)
                    return lane_ops.lane_nms(
                        lanes, thresh=lane_nms_thres,
                        top_k=cfg_l.pre_nms_top_k, max_lanes=cfg_l.max_lanes)
                results["lanes"] = jax.vmap(one)(out["lane"]["predict_cls"],
                                                 out["lane"]["predict_loc"])
            return results

        def run(variables, frames):
            import contextlib

            from hydranet_tpu.parallel.spatial import spatial_sharding

            # trace-time: in spatial mode every stage boundary in the model
            # pins its sharding (H-shard big tensors, replicate tiny deep
            # levels) so GSPMD never falls back to replicate-and-repartition
            # ("Involuntary full rematerialization") — parallel/spatial.py
            ctx = (spatial_sharding(mesh) if spatial and mesh is not None
                   else contextlib.nullcontext())
            with ctx:
                return run_body(variables, frames)

        if mesh is not None:
            # multi-chip batched inference: frames sharded over the data
            # axis, weights replicated; XLA partitions the whole pipeline
            # (including the per-image vmapped post-processing) with no
            # cross-device collectives in the hot path.
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            if spatial:
                # SP: split H of [B, H, W, 3] over the whole mesh; every
                # decoded result is gathered replicated (they are the
                # small fixed-shape postprocess outputs + the class-id
                # map, i.e. what the host consumes anyway)
                data = NamedSharding(
                    mesh, P(None, tuple(mesh.axis_names)))
                out = repl
            else:
                data = NamedSharding(mesh, P("data"))
                out = data
            self.variables = jax.device_put(variables, repl)
            self._run = jax.jit(run, in_shardings=(repl, data),
                                out_shardings=out)
        else:
            # Pin the weights on-device ONCE. A restored checkpoint (orbax)
            # arrives as host numpy arrays; without this, every dispatch
            # re-uploads the full parameter set H2D (on this harness's
            # remote tunnel that is ~2.5 s/batch — a 20x slowdown measured
            # in artifacts/bench_ckpt_r4.log before the fix). Device arrays
            # pass through device_put as a no-op.
            self.variables = jax.device_put(self.variables)
            self._run = jax.jit(run)

    def calibrate(self, frame_batches,
                  percentile: float = 100.0) -> Dict[str, Any]:
        """PTQ calibration: run `frame_batches` (iterable of uint8 RGB
        [B, H0, W0, 3]) through the float model collecting per-conv
        per-sample input absmax into the `act_stats` collection, then
        reduce to scalar scales with the `percentile`-th percentile across
        all calibration samples (100.0 = exact absmax; ~99.5 clips rare
        activation spikes for a finer quant step). Stores the result into
        `self.variables` (so a subsequent quant='int8' pipeline built from
        them serves quantized) and returns it."""
        from hydranet_tpu.ops import quantize as qz

        def calib_run(variables, frames):
            x = preprocess_images(frames, self.net_hw,
                                  dtype=self.compute_dtype,
                                  allow_pallas=False)
            with qz.quant_mode("calibrate"):
                _, st = self.model.apply(variables, x, train=False,
                                         seg_argmax=True,
                                         mutable=["act_stats"])
            return st["act_stats"]

        fn = jax.jit(calib_run)
        base = {k: v for k, v in self.variables.items() if k != "act_stats"}
        batches = [jax.device_get(fn(base, jnp.asarray(frames)))
                   for frames in frame_batches]
        assert batches, "calibrate() needs at least one batch"
        acc = qz.reduce_calibration(batches, percentile)
        self.variables = {**self.variables, "act_stats": acc}
        return acc

    def __call__(self, frames: np.ndarray) -> Dict[str, Any]:
        """frames: uint8 RGB [B, H0, W0, 3] (B == batch_size)."""
        if self.quant == "int8" and "act_stats" not in self.variables:
            raise RuntimeError(
                "quant='int8' needs calibrated activation scales: call "
                "calibrate(frame_batches) first or pass an 'act_stats' "
                "collection in variables")
        return self._run(self.variables, jnp.asarray(frames))

    def stream(self, frame_batches, depth: int = 2):
        """Pipelined serving: keep up to `depth` batches in flight so host
        H2D transfer and preprocessing of batch k+1 overlap device compute
        of batch k (JAX dispatch is async). Yields results in order.

        The reference's per-frame loop (demo.py:167-261) synchronizes on
        every frame; this is the TPU-native streaming shape.
        """
        import collections

        pending = collections.deque()
        for frames in frame_batches:
            pending.append(self._run(self.variables, jnp.asarray(frames)))
            if len(pending) >= depth:
                yield jax.tree_util.tree_map(np.asarray, pending.popleft())
        while pending:
            yield jax.tree_util.tree_map(np.asarray, pending.popleft())

    # ------------------------------------------------------------- host visual

    def visualize(self, results: Dict[str, Any], frames_bgr: List[np.ndarray]
                  ) -> List[np.ndarray]:
        """Overlay seg/det/lane results on original-size BGR frames —
        equivalent of the decode+draw stages of demo.py:207-244."""
        import cv2

        cfg = self.cfg
        h, w = self.net_hw
        out_frames = []
        n = len(frames_bgr)
        seg = np.asarray(results["seg"]) if "seg" in results else None
        dets = results.get("detections")
        lanes = results.get("lanes")
        obj_list = list(cfg.detection.class_list[1:])

        for bi in range(n):
            im = frames_bgr[bi].copy()
            oh, ow = im.shape[:2]

            if lanes is not None:
                from hydranet_tpu.heads.lane_ordering import order_lanes_x_axis

                one = jax.tree_util.tree_map(lambda a: a[bi], lanes)
                lines = lane_ops.lanes_to_points(
                    one, input_height=h, interval=h / cfg.lane_points_per_line,
                    scale_x=ow / w, scale_y=oh / h)
                # order left-to-right and assign signed ego-relative indices
                # (reference scale_to_org -> order_lane_x_axis,
                # lanedetect.py:118-124); color/label by index.
                for line in order_lanes_x_axis(lines, height=oh):
                    pts = [(int(p["x"]), int(p["y"])) for p in line["points"]]
                    if len(pts) < 2:  # min_length — lanedetect.py:138-139
                        continue
                    # near-vertical filter — lanedetect.py:141-147
                    arr = np.asarray(pts, np.float64)
                    if np.ptp(arr[:, 0]) < 1e-6:
                        continue
                    slope = np.polyfit(arr[:, 0], arr[:, 1], 1)[0]
                    if abs(np.arctan(slope)) / np.pi * 180 > 65:
                        continue
                    color = LANE_IDX_COLORS.get(line["idx"], (255, 255, 0))
                    for p0, p1 in zip(pts[:-1], pts[1:]):
                        cv2.line(im, p0, p1, color, 15)
                    cv2.putText(im, "Lane %+d: %.2f" % (line["idx"],
                                                        line["score"]),
                                (max(pts[0][0], 30), pts[0][1] - 10),
                                cv2.FONT_HERSHEY_SIMPLEX, 2.0, color, 7)

            if seg is not None:
                vis = np.zeros((seg.shape[1], seg.shape[2], 3), np.uint8)
                for cid, color in SEG_CLASS_COLORS.items():
                    if cid < cfg.segment.num_classes:
                        vis[seg[bi] == cid] = color
                vis = cv2.resize(vis, (ow, oh),
                                 interpolation=cv2.INTER_NEAREST)
                im = cv2.addWeighted(im, 0.8, vis, 0.5, 0.0)

            if dets is not None:
                from hydranet_tpu.heads.display import (class_color,
                                                        draw_box_caption)

                valid = np.asarray(dets.valid[bi])
                boxes = np.asarray(dets.boxes[bi])
                scores = np.asarray(dets.scores[bi])
                classes = np.asarray(dets.classes[bi])
                for k in np.where(valid)[0]:
                    x1, y1, x2, y2 = boxes[k]
                    cid = int(classes[k])
                    label = obj_list[cid] if obj_list else str(cid)
                    draw_box_caption(
                        im, (x1 / w * ow, y1 / h * oh,
                             x2 / w * ow, y2 / h * oh),
                        f"{label} {scores[k]:.0%}", class_color(cid),
                        thickness=2)
            out_frames.append(im)
        return out_frames

    # ------------------------------------------------------------- export

    def export_artifact(self, out_dir: str) -> None:
        """Write the native deployment artifact consumed by the C++ runtime
        (deploy/): weights frozen into the graph, single uint8-frames input.

        Files:
          module.mlir        — StableHLO bytecode of the full pipeline
          compile_options.pb — serialized xla.CompileOptionsProto
          artifact.json      — input/output specs (flat, pytree paths)
        """
        import json
        import os

        from jax import export as jax_export
        from jaxlib import xla_client

        os.makedirs(out_dir, exist_ok=True)
        h0, w0 = self.input_hw
        spec = jax.ShapeDtypeStruct((self.batch_size, h0, w0, 3), jnp.uint8)
        variables = self.variables

        def frozen(frames):
            return self._run.__wrapped__(variables, frames)

        exported = jax_export.export(jax.jit(frozen))(spec)
        with open(os.path.join(out_dir, "module.mlir"), "wb") as f:
            f.write(exported.mlir_module_serialized)

        flat_paths = []
        paths = jax.tree_util.tree_flatten_with_path(
            jax.eval_shape(frozen, spec))[0]
        for path, leaf in paths:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            flat_paths.append(dict(name=name, shape=list(leaf.shape),
                                   dtype=str(leaf.dtype)))

        # Pin every RESULT to a dense row-major device layout. Left to its
        # own layout assignment, XLA picks a transposed physical layout for
        # outputs whose minor dim is small (observed: the [B, 100, 4] det
        # boxes buffer landed coordinate-major), and this harness's PJRT
        # plugin ignores ToHostBuffer's host_layout — so the C runtime's
        # raw copy scrambled the det structs. Row-major results cost one
        # 400-element device-side transpose and make the raw copy exact.
        import numpy as np

        co = xla_client.CompileOptions()
        co.executable_build_options.result_layout = (
            xla_client.Shape.tuple_shape([
                xla_client.Shape.array_shape(
                    np.dtype(p["dtype"]), p["shape"],
                    list(reversed(range(len(p["shape"])))))
                for p in flat_paths]))
        with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
            f.write(co.SerializeAsString())
        # a previously compiled executable in this dir was built with the
        # OLD options — stale layouts must not be served from cache
        cache = os.path.join(out_dir, "executable.cache")
        if os.path.exists(cache):
            os.remove(cache)
        meta = dict(
            input=dict(shape=list(spec.shape), dtype="uint8",
                       layout="NHWC RGB"),
            outputs=flat_paths,
            net_input_hw=list(self.net_hw),
            seg_num_classes=self.cfg.segment.num_classes,
            det_class_list=list(self.cfg.detection.class_list),
            lane=dict(points_per_line=self.cfg.lane_points_per_line,
                      interval=self.net_hw[0] / self.cfg.lane_points_per_line,
                      max_lanes=self.cfg.lane.max_lanes),
            max_detections=self.cfg.detection.max_detections,
        )
        with open(os.path.join(out_dir, "artifact.json"), "w") as f:
            json.dump(meta, f, indent=2)

    def export_stablehlo(self, path: str) -> None:
        """Serialize the full compiled pipeline to portable StableHLO — the
        deployment artifact replacing the reference's hydraNET.onnx
        (demo.py:134-148). Loadable from C++ via PJRT or back into JAX via
        jax.export.deserialize."""
        from jax import export as jax_export

        h0, w0 = self.input_hw
        spec = jax.ShapeDtypeStruct((self.batch_size, h0, w0, 3), jnp.uint8)
        var_specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype),
            self.variables)
        exported = jax_export.export(self._run)(var_specs, spec)
        with open(path, "wb") as f:
            f.write(exported.serialize())


def load_stablehlo(path: str):
    """Deserialize an exported pipeline; returns a callable."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
