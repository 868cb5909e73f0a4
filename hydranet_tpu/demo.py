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
    args = parser.parse_args(argv)

    import cv2
    import jax.numpy as jnp

    from hydranet_tpu.config import load_config
    from hydranet_tpu.inference import InferencePipeline

    cfg = load_config(args.config)
    variables = load_variables(cfg, args.checkpoint)

    if args.deploy:
        pipe = InferencePipeline(cfg, variables, batch_size=args.batch,
                                 input_hw=(1080, 1920))
        pipe.export_artifact(args.deploy)  # module.mlir + options + specs
        pipe.export_stablehlo(os.path.join(args.deploy, "pipeline.jaxexport"))
        print(f"exported deployment artifact -> {args.deploy}/")
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
                pipes[hw] = InferencePipeline(cfg, variables, batch_size=1,
                                              input_hw=hw)
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

        def frame_batches():
            nonlocal pipe, writer
            while True:
                ok, frame = vid.read()
                if not ok or frame is None:
                    return
                if pipe is None:
                    pipe = InferencePipeline(cfg, variables, batch_size=1,
                                             input_hw=frame.shape[:2])
                    out_path = os.path.join(args.out,
                                            os.path.basename(args.video))
                    writer = cv2.VideoWriter(
                        out_path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (frame.shape[1], frame.shape[0]))
                frames_bgr.append(frame)
                yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)[None]

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
