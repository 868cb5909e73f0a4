"""Demo / export CLI (TPU-native equivalent of /root/reference/model/demo.py).

Modes:
- image folder: run the compiled pipeline over a directory of images, write
  overlays next to them (demo.py:150-153, 167-261).
- video: decode a video, run, and write an annotated video.
- --deploy: export the full compiled pipeline (preprocess + 3-head forward +
  all post-processing) as a StableHLO artifact — the replacement for the
  reference's torch.onnx.export (demo.py:134-148). The C++ deploy layer
  (deploy/) consumes the raw StableHLO module via PJRT.

Checkpoints: --checkpoint may be an orbax directory (ours) or a reference
.pth file (imported via hydranet_tpu.utils.torch_import).

Usage:
  python -m hydranet_tpu.demo --config configs/hydranet_joint_big_backbone.yml \
      [--checkpoint logs/run/model/epoch_0] [--images DIR | --video FILE] \
      [--deploy OUT.stablehlo] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Any, Dict

import numpy as np


def load_variables(cfg, checkpoint: str):
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.models.hydranet import HydraNet

    model = HydraNet(cfg=cfg)
    h, w = cfg.input_hw
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    if not checkpoint:
        return variables
    if checkpoint.endswith(".pth"):
        from hydranet_tpu.train.checkpoint import import_torch_weights

        return import_torch_weights(variables, weight_file=checkpoint)
    if checkpoint.endswith(".npz"):
        # commit-sized trained snapshot (save_compact) — the wipe-proof
        # serving checkpoint; mirrors the reference's demo always loading
        # trained weights (demo.py:123-131)
        from hydranet_tpu.train.checkpoint import load_compact

        return load_compact(checkpoint)
    from hydranet_tpu.train.checkpoint import restore_checkpoint

    state = restore_checkpoint(checkpoint, target=None)
    return {"params": state["params"], "batch_stats": state["batch_stats"]}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config",
                        default="configs/hydranet_joint_big_backbone.yml")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--images", default="")
    parser.add_argument("--video", default="")
    parser.add_argument("--deploy", default="",
                        help="export StableHLO artifact to this path and exit")
    parser.add_argument("--out", default="demo_vis")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--quant", default="off", choices=["off", "int8"],
                        help="serve the int8-PTQ pipeline (calibrates "
                             "activation scales on the first frames)")
    parser.add_argument("--calib-frames", type=int, default=8,
                        help="frames used for int8 activation calibration")
    parser.add_argument("--calib-percentile", type=float, default=100.0,
                        help="percentile across calibration frames for the "
                             "activation scale (100 = absmax)")
    parser.add_argument("--calib-images", default="",
                        help="image dir for --deploy int8 calibration")
    args = parser.parse_args(argv)

    import cv2
    import jax.numpy as jnp

    from hydranet_tpu.config import load_config
    from hydranet_tpu.inference import InferencePipeline

    cfg = load_config(args.config)
    variables = load_variables(cfg, args.checkpoint)

    def make_pipe(batch_size, input_hw, calib_batches=()):
        """Float pipeline, or (with --quant int8) a PTQ pipeline whose
        activation scales are calibrated on `calib_batches` (iterable of
        uint8 RGB [B,H,W,3] at the pipeline's input resolution)."""
        pipe = InferencePipeline(cfg, variables, batch_size=batch_size,
                                 input_hw=input_hw)
        if args.quant != "int8":
            return pipe
        calib_batches = list(calib_batches)
        if not calib_batches:
            raise SystemExit("--quant int8 needs calibration frames "
                             "(none available at this resolution)")
        pipe.calibrate(calib_batches, percentile=args.calib_percentile)
        print(f"int8: calibrated on {len(calib_batches)} frame(s) at "
              f"percentile {args.calib_percentile}")
        return InferencePipeline(cfg, pipe.variables, batch_size=batch_size,
                                 input_hw=input_hw, quant="int8")

    if args.deploy:
        calib = []
        if args.quant == "int8":
            if not args.calib_images:
                raise SystemExit("--deploy with --quant int8 needs "
                                 "--calib-images DIR")
            for name in sorted(os.listdir(args.calib_images)):
                if len(calib) >= args.calib_frames:
                    break
                frame = cv2.imread(os.path.join(args.calib_images, name))
                if frame is None:
                    continue
                frame = cv2.resize(frame, (1920, 1080))
                # calibrate() jits its own forward per batch shape — feed
                # [1, H, W, 3] frames directly (replicating to args.batch
                # would add compute and duplicate percentile samples)
                calib.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)[None])
        pipe = make_pipe(args.batch, (1080, 1920), calib)
        pipe.export_artifact(args.deploy)  # module.mlir + options + specs
        pipe.export_stablehlo(os.path.join(args.deploy, "pipeline.jaxexport"))
        print(f"exported deployment artifact -> {args.deploy}/"
              + (" (int8-PTQ)" if args.quant == "int8" else ""))
        return

    os.makedirs(args.out, exist_ok=True)

    if args.images:
        names = sorted(os.listdir(args.images))
        # one compiled pipeline per source resolution (folders can mix sizes;
        # the reference demo also recompiles nothing but crashes on none —
        # each XLA program has a fixed input shape)
        pipes: Dict[Any, InferencePipeline] = {}
        for name in names:
            frame = cv2.imread(os.path.join(args.images, name))
            if frame is None:
                continue
            hw = frame.shape[:2]
            if hw not in pipes:
                def same_res_frames():
                    n = 0
                    for other in names:
                        if n >= args.calib_frames:
                            return
                        f = cv2.imread(os.path.join(args.images, other))
                        if f is not None and f.shape[:2] == hw:
                            n += 1
                            yield cv2.cvtColor(f, cv2.COLOR_BGR2RGB)[None]
                pipes[hw] = make_pipe(1, hw, same_res_frames()
                                      if args.quant == "int8" else ())
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)[None]
            tic = time.time()
            results = pipes[hw](rgb)
            print(f"{name}: inference {1000 * (time.time() - tic):.1f} ms",
                  flush=True)
            vis = pipes[hw].visualize(results, [frame])[0]
            cv2.imwrite(os.path.join(args.out, name), vis)
        return

    if args.video:
        vid = cv2.VideoCapture(args.video)
        writer = None
        pipe = None
        frames_bgr = []

        def setup(frame, calib):
            nonlocal pipe, writer
            pipe = make_pipe(1, frame.shape[:2], calib)
            writer = cv2.VideoWriter(
                os.path.join(args.out, os.path.basename(args.video)),
                cv2.VideoWriter_fourcc(*"mp4v"), 10,
                (frame.shape[1], frame.shape[0]))

        def frame_batches():
            # with --quant int8: buffer the first --calib-frames frames to
            # calibrate activation scales, then serve them and the rest
            pending = []
            while True:
                ok, frame = vid.read()
                if not ok or frame is None:
                    break
                if pipe is None:
                    pending.append(frame)
                    need = args.calib_frames if args.quant == "int8" else 1
                    if len(pending) < need:
                        continue
                rgbs = [cv2.cvtColor(f, cv2.COLOR_BGR2RGB)[None]
                        for f in (pending or [frame])]
                if pipe is None:
                    setup(pending[0], rgbs if args.quant == "int8" else ())
                frames_bgr.extend(pending or [frame])
                pending = []
                yield from rgbs
            if pipe is None and pending:  # video shorter than calib window
                rgbs = [cv2.cvtColor(f, cv2.COLOR_BGR2RGB)[None]
                        for f in pending]
                setup(pending[0], rgbs if args.quant == "int8" else ())
                frames_bgr.extend(pending)
                yield from rgbs

        # pipelined serving: host decode + H2D of frame k+1 overlap device
        # compute of frame k (InferencePipeline.stream keeps `depth` batches
        # in flight; the reference loop syncs every frame, demo.py:167-261)
        gen = frame_batches()
        tic = time.time()
        n = 0
        # stream() needs `pipe` to exist: pull the first frame eagerly
        first = next(gen, None)
        if first is not None:
            import itertools

            for results in pipe.stream(itertools.chain([first], gen)):
                frame = frames_bgr[n]
                writer.write(pipe.visualize(results, [frame])[0])
                n += 1
                if n % 20 == 0:
                    print(f"frame {n}: running average "
                          f"{1000 * (time.time() - tic) / n:.1f} ms")
        if writer is not None:
            writer.release()
        if n:
            print(f"processed {n} frames, average "
                  f"{1000 * (time.time() - tic) / n:.1f} ms (pipelined)")
        return

    parser.error("one of --images / --video / --deploy is required")


if __name__ == "__main__":
    main()
