"""Host-memory probe for the training loop (round-3 OOM investigation).

The 40-epoch convergence run's main process grew ~3.2 GB/epoch
(~80 MB/step ~= one f32 bs16 640^2 image batch) and was OOM-killed at
epoch 38 with 123 GB anon RSS. This probe runs the same HydraTrainer
loop on tiny shapes (CPU by default) and prints, per epoch:

  - RSS of this process (smaps_rollup Anonymous)
  - number + total bytes of live jax arrays (jax.live_arrays())

If live-array count/bytes climb per epoch, our code (or JAX) retains
device buffers. If RSS climbs while live arrays stay flat, the leak is
below JAX (tunnel client / allocator) or in host-side Python objects.

Usage: [JAX_PLATFORMS=cpu] python scripts/mem_probe_trainer.py [--epochs N]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def anon_rss_mb() -> float:
    with open("/proc/self/smaps_rollup") as f:
        for line in f:
            if line.startswith("Anonymous:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def live_arrays_stat():
    import jax

    arrs = jax.live_arrays()
    return len(arrs), sum(a.nbytes for a in arrs) / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--n-train", type=int, default=16)
    ap.add_argument("--n-valid", type=int, default=4)
    args = ap.parse_args()

    import tempfile

    from hydranet_tpu.config import Config
    from hydranet_tpu.train.trainer import HydraTrainer
    from tests.synth_data import make_dataset
    from tests.test_hydranet import small_config

    tmp = tempfile.mkdtemp(prefix="memprobe_")
    root = make_dataset(os.path.join(tmp, "data"),
                        n_train=args.n_train, n_valid=args.n_valid)
    d = small_config().to_dict()
    d["dataloader"]["data_list"] = f"{root}/list"
    d["dataloader"]["with_aug"] = False
    d["train"].update(dict(epoch=args.epochs, batch_size_train=4,
                           batch_size_valid=2, lr=1e-4, fine_tuning=False,
                           precise_bn_batches=1, logs=os.path.join(tmp, "logs")))
    trainer = HydraTrainer(Config.from_dict(d), use_mesh=False)

    n0, b0 = live_arrays_stat()
    print(f"[mem] start: anon_rss={anon_rss_mb():.0f} MB "
          f"live_arrays={n0} ({b0:.1f} MB)", flush=True)
    for epoch in range(args.epochs):
        trainer.train_one_epoch(epoch)
        trainer.valid(epoch)
        n, b = live_arrays_stat()
        print(f"[mem] epoch {epoch}: anon_rss={anon_rss_mb():.0f} MB "
              f"live_arrays={n} ({b:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
