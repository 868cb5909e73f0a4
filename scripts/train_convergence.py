"""Convergence demonstration: train the small-backbone 3-head model on the
procedural driving dataset until mIoU / mAP / lane F1 are clearly above
chance (VERDICT r2 item 5; matches the capability of a real training run,
reference train.py:441-515).

Generates the dataset if absent, runs HydraTrainer.fit-style epochs, and
appends one JSON line of metrics per epoch to
artifacts/convergence_metrics.jsonl (committed as evidence with the log).

Usage: python scripts/train_convergence.py [--epochs N] [--data DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# persistent compile cache (the remote compiler takes minutes per program;
# tests already use this dir — share it so restarts are cheap)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))


def latest_checkpoint(logs_dir: str) -> str:
    """Newest epoch_N orbax checkpoint under logs_dir/model or under any
    run dir logs_dir/<timestamp>_<tag>/model — HydraTrainer nests a
    timestamped run dir under cfg.train.logs (trainer.py save_dir), so the
    direct layout alone missed every real checkpoint: auto-resume would
    silently restart from scratch and the hardware chain's demo/PTQ steps
    would run with random init. Newest run wins (mtime), then highest
    epoch. Returns '' when nothing is saved yet.

    Only exactly-'epoch_<int>' names count, and only if the dir holds a
    committed orbax manifest: a kill landing mid-save leaves an
    'epoch_N.orbax-checkpoint-tmp-*' dir (and a manifest-less epoch_N),
    which the old startswith/int() parse either crashed on or — worse —
    picked as newest so the restore failed. That is exactly the
    deadline-kill scenario --auto-resume exists to survive (ADVICE r4)."""
    cands = []
    for model_dir in [os.path.join(logs_dir, "model")] + \
            glob.glob(os.path.join(logs_dir, "*", "model")):
        if not os.path.isdir(model_dir):
            continue
        for n in os.listdir(model_dir):
            if not re.fullmatch(r"epoch_\d+", n):
                continue
            p = os.path.join(model_dir, n)
            # orbax StandardCheckpointer writes the metadata file last
            # (atomic-rename commit protocol); its absence marks a partial
            committed = (
                os.path.exists(os.path.join(p, "_CHECKPOINT_METADATA"))
                or os.path.exists(os.path.join(p, "checkpoint"))
                or glob.glob(os.path.join(p, "*", "manifest.ocdbt"))
                or glob.glob(os.path.join(p, "manifest.ocdbt")))
            if not committed:
                continue
            cands.append((os.path.getmtime(p), int(n.split("_")[1]), p))
    return max(cands)[2] if cands else ""


def seed_trainer_from_npz(trainer, npz_path: str):
    """Overlay compact-npz weights (save_compact) onto a fresh trainer:
    params + batch_stats from the npz (cast to the trainer's dtypes),
    fresh opt state, and step positioned at (meta epoch + 1) x
    steps/epoch so the LR schedule continues where the source run
    stopped. Used when a VM restore wiped the orbax tree but the
    committed compact checkpoint survives (VERDICT r4 missing #1)."""
    import jax
    import jax.numpy as jnp

    from hydranet_tpu.train.checkpoint import load_compact

    loaded = load_compact(npz_path)
    meta_path = npz_path + ".json"
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    seed_epoch = int(meta.get("epoch", -1)) + 1
    # cast each loaded leaf to the trainer's dtype (load_compact returns
    # f32 values that are exactly the bf16-rounded trained weights)
    params = jax.tree_util.tree_map(
        lambda new, old: jnp.asarray(new, old.dtype),
        loaded["params"], trainer.state.params)
    bstats = jax.tree_util.tree_map(
        lambda new, old: jnp.asarray(new, old.dtype),
        loaded["batch_stats"], trainer.state.batch_stats)
    step0 = seed_epoch * max(1, len(trainer.trainloader))
    opt_state = trainer.tx.init(params)
    # Position the LR schedule at step0: scale_by_learning_rate reads the
    # ScaleByScheduleState's INTERNAL count (not TrainState.step), and
    # tx.init resets it to 0 — without this the seeded run trains at the
    # cosine START LR (~23x the tail; observed as the epoch-44 mIoU dip
    # .944 -> .860 in the first r5ft attempt). Adam's own count stays 0 so
    # its bias correction handles the fresh moments correctly.
    import optax

    opt_state = tuple(
        s._replace(count=jnp.asarray(step0, jnp.int32))
        if isinstance(s, optax.ScaleByScheduleState) else s
        for s in opt_state)
    trainer.state = trainer.state._replace(
        params=params, batch_stats=bstats,
        opt_state=opt_state,
        step=jnp.asarray(step0, jnp.int32))
    trainer.start_epoch = seed_epoch
    print(f"seeded from {npz_path} (epoch {seed_epoch - 1} weights "
          f"-> start epoch {seed_epoch}, step {step0}, fresh opt state)",
          flush=True)
    return trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None,
                    help="override cfg.train.epoch")
    ap.add_argument("--data", default="artifacts/procedural_data")
    ap.add_argument("--n-train", type=int, default=400)
    ap.add_argument("--n-valid", type=int, default=48)
    ap.add_argument("--out", default="artifacts/convergence_metrics.jsonl")
    ap.add_argument("--config",
                    default="configs/hydranet_convergence_procedural.yml")
    ap.add_argument("--resume", default="",
                    help="orbax checkpoint dir (epoch_N) to resume from")
    ap.add_argument("--auto-resume", action="store_true",
                    help="resume from the newest epoch_N checkpoint under "
                         "the config's logs dir if one exists (restart-safe "
                         "chain steps: a killed run continues, a fresh tree "
                         "starts from scratch)")
    ap.add_argument("--logs", default="",
                    help="override cfg.train.logs (run/checkpoint tree). "
                         "Lets a corrected re-run use a fresh tree so "
                         "auto-resume/retry cannot pick up a superseded "
                         "run's checkpoints.")
    ap.add_argument("--seed-npz", default="",
                    help="compact npz checkpoint (save_compact) to seed "
                         "params/batch_stats from when no orbax checkpoint "
                         "exists. Used after a VM restore wipes the orbax "
                         "tree: the committed artifacts/trained_ckpt_r5.npz "
                         "re-seeds the converged weights, opt state starts "
                         "fresh, and step is positioned at (meta epoch+1) x "
                         "steps/epoch so the cosine schedule continues at "
                         "its tail. --auto-resume takes precedence when a "
                         "real orbax checkpoint survives.")
    ap.add_argument("--fine-tuning", action="store_true",
                    help="exercise the alternating joint -> per-head "
                         "fine-tuning schedule (reference train.py:441-515): "
                         "the tail of the run becomes epoch_tuning-long "
                         "LANE / DET / SEG phases with the other heads' "
                         "params frozen (masked updates)")
    ap.add_argument("--epoch-tuning", type=int, default=2,
                    help="epochs per per-head tuning phase")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data, "list", "train.txt")):
        from gen_procedural_dataset import generate

        print(f"generating {args.n_train}+{args.n_valid} procedural scenes "
              f"-> {args.data}")
        generate(args.data, args.n_train, args.n_valid)

    from hydranet_tpu.config import Config, load_config
    from hydranet_tpu.train.trainer import HydraTrainer

    def build_trainer(resume: str) -> "HydraTrainer":
        d = load_config(args.config).to_dict()
        if args.epochs is not None:
            d["train"]["epoch"] = args.epochs
        d["dataloader"]["data_list"] = os.path.join(args.data, "list")
        if args.logs:
            d["train"]["logs"] = args.logs
        if args.fine_tuning:
            d["train"]["fine_tuning"] = True
            d["train"]["epoch_tuning"] = args.epoch_tuning
            d["train"]["tuning_turn"] = 1
        if resume:
            d["train"]["resume_from"] = resume
        return HydraTrainer(Config.from_dict(d), cfg_path=args.config)

    resume = args.resume
    if args.auto_resume and not resume:
        from hydranet_tpu.config import load_config as _lc
        resume = latest_checkpoint(args.logs or _lc(args.config).train.logs)
        if resume:
            print(f"auto-resume from {resume}", flush=True)
    trainer = build_trainer(resume)
    if args.seed_npz and not resume:
        trainer = seed_trainer_from_npz(trainer, args.seed_npz)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    t0 = time.time()
    epoch, retries = trainer.start_epoch, 0
    while epoch < trainer.epoch:
        try:
            trainer.train_one_epoch(epoch)
            summary = trainer.valid(epoch)
        except Exception as e:  # tunnel/TPU transient: resume from last ckpt
            retries += 1
            if retries > 8:
                raise
            print(f"epoch {epoch} failed ({type(e).__name__}: {e}); "
                  f"retry {retries}/8 in 120 s from last checkpoint",
                  flush=True)
            time.sleep(120)
            ckpt = latest_checkpoint(trainer.cfg.train.logs)
            trainer = build_trainer(ckpt)
            if args.seed_npz and not ckpt:
                trainer = seed_trainer_from_npz(trainer, args.seed_npz)
            epoch = trainer.start_epoch
            continue
        row = {"epoch": epoch, "wall_s": round(time.time() - t0, 1),
               "phase": trainer._phase_mask(epoch)[1],
               **{k: round(float(v), 4) for k, v in summary.items()}}
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print("EPOCH SUMMARY:", json.dumps(row), flush=True)
        epoch += 1
    print("done")


if __name__ == "__main__":
    main()
