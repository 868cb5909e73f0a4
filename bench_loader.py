"""Data-loader throughput bench: synthetic 1080p JPEGs through the FULL
per-sample pipeline (JPEG decode + joint affine augmentation + lane spline
encode + resize/normalize + collation) at the flagship 640x640 config.

Prints one JSON line per (batch_size, num_workers) cell, then a summary
comparing sustained loader samples/s against the measured train-step rate
(the loader must stay ahead of the TPU for the input pipeline not to be the
bottleneck — reference feeds this via torch DataLoader workers,
/root/reference/model/train.py:67-84).

Usage: python bench_loader.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

from hydranet_tpu.config import load_config, Config
from hydranet_tpu.data.dataset import MultitaskDataset
from hydranet_tpu.data.loader import DataLoader


def bench_cell(ds, batch_size: int, num_workers: int, min_seconds: float,
               warm_batches: int = 2) -> dict:
    dl = DataLoader(ds, batch_size=batch_size, shuffle=True,
                    num_workers=num_workers, num_prefetch=0, seed=0)
    try:
        n_samples = 0
        t0 = None
        done_warm = 0
        while True:
            for batch in dl:
                if done_warm < warm_batches:
                    done_warm += 1
                    continue
                if t0 is None:
                    t0 = time.perf_counter()
                    continue  # timing starts at the *end* of this batch
                n_samples += batch["image"].shape[0]
                if time.perf_counter() - t0 >= min_seconds:
                    break
            else:
                continue
            break
        dt = time.perf_counter() - t0
        return {"batch_size": batch_size, "num_workers": num_workers,
                "samples_per_s": round(n_samples / dt, 1),
                "batches_timed": n_samples // batch_size}
    finally:
        dl.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--train-rate", type=float, default=39.5,
                    help="measured train samples/s (bench_train.py bs8)")
    args = ap.parse_args()

    sys.path.insert(0, "tests")
    from synth_data import make_dataset

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    # 1080p sources like the demo footage; enough images that decode isn't
    # served from the page cache alone.
    n = 16 if args.quick else 64
    make_dataset(tmp, n_train=n, n_valid=2, size=(1080, 1920))

    cfg = load_config("configs/hydranet_joint_big_backbone.yml")
    d = cfg.to_dict()
    d["dataloader"]["data_list"] = f"{tmp}/list"
    d["dataloader"]["with_aug"] = True
    cfg = Config.from_dict(d)

    import os
    n_cpu = len(os.sched_getaffinity(0))
    ds = MultitaskDataset(cfg, mode="train", seed=0)
    d["dataloader"]["fast_decode"] = True
    ds_fast = MultitaskDataset(Config.from_dict(d), mode="train", seed=0)
    min_s = 3.0 if args.quick else 10.0
    # Worker counts that make sense for this host: inline, half the cores,
    # all cores (on a 1-core harness the pool can only demonstrate
    # correctness, not speedup — the win needs a multi-core TPU host).
    worker_counts = sorted({0, max(1, n_cpu // 2), n_cpu})

    results = []
    for dataset, fast in ((ds, False), (ds_fast, True)):
        for bs in (8, 32):
            for nw in worker_counts:
                cell = bench_cell(dataset, bs, nw, min_seconds=min_s)
                cell["fast_decode"] = fast
                results.append(cell)
                print(json.dumps(cell), flush=True)

    best = max(results, key=lambda r: r["samples_per_s"])
    print(json.dumps({
        "metric": "loader samples/s (1080p JPEG decode + full augment + "
                  "lane encode + collate, 640x640 net input)",
        "value": best["samples_per_s"],
        "unit": "samples/s",
        "n_cpu": n_cpu,
        "best_config": {k: best[k] for k in
                        ("batch_size", "num_workers", "fast_decode")},
        "vs_train_step_rate": round(best["samples_per_s"] / args.train_rate, 2),
    }))


if __name__ == "__main__":
    main()
