"""Unit tests for the convergence-run driver script (scripts/train_convergence.py):
checkpoint discovery used by its auto-resume-on-TPU-failure loop."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "train_convergence", os.path.join(REPO, "scripts",
                                          "train_convergence.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["train_convergence"] = mod
    spec.loader.exec_module(mod)
    return mod


def _committed_ckpt(model_dir, n):
    """A dir latest_checkpoint treats as a committed orbax save (it
    requires the manifest orbax's atomic-rename protocol writes last)."""
    d = model_dir / f"epoch_{n}"
    d.mkdir()
    (d / "_CHECKPOINT_METADATA").touch()
    return d


def test_latest_checkpoint_picks_highest_epoch(tmp_path):
    mod = _load()
    model = tmp_path / "logs" / "model"
    model.mkdir(parents=True)
    for n in (0, 2, 10):  # 10 after 2: numeric, not lexicographic, order
        _committed_ckpt(model, n)
    (model / "not_a_ckpt").mkdir()
    got = mod.latest_checkpoint(str(tmp_path / "logs"))
    assert got == str(model / "epoch_10")


def test_latest_checkpoint_skips_partial_saves(tmp_path):
    """A kill mid-save leaves an orbax tmp dir and/or a manifest-less
    epoch dir; auto-resume must fall back to the last COMMITTED epoch
    (ADVICE r4 medium)."""
    mod = _load()
    model = tmp_path / "logs" / "model"
    model.mkdir(parents=True)
    _committed_ckpt(model, 7)
    (model / "epoch_8").mkdir()  # manifest-less: interrupted save
    (model / "epoch_9.orbax-checkpoint-tmp-1234").mkdir()
    got = mod.latest_checkpoint(str(tmp_path / "logs"))
    assert got == str(model / "epoch_7")


def test_latest_checkpoint_empty_cases(tmp_path):
    mod = _load()
    assert mod.latest_checkpoint(str(tmp_path / "nope")) == ""
    (tmp_path / "logs" / "model").mkdir(parents=True)
    assert mod.latest_checkpoint(str(tmp_path / "logs")) == ""


def test_seed_trainer_from_npz(tmp_path):
    """Compact-npz seeding (the wipe-proof restart path): params come back
    as the bf16-rounded trained values cast to the trainer's dtypes,
    batch_stats survive in f32, opt state is re-initialized for the new
    tree, and start_epoch/step are positioned at (meta epoch + 1) so the
    LR schedule continues at its tail."""
    import json

    import jax.numpy as jnp
    import numpy as np
    import optax

    from hydranet_tpu.train.checkpoint import save_compact
    from hydranet_tpu.parallel.train_step import TrainState

    mod = _load()

    trained = {"params": {"backbone": {"w": np.full((4, 4), 1.5, np.float32)}},
               "batch_stats": {"backbone": {"mean": np.full((4,), 0.25,
                                                            np.float32)}}}
    npz = str(tmp_path / "ckpt.npz")
    save_compact(npz, trained, meta={"epoch": 39})
    assert json.load(open(npz + ".json"))["epoch"] == 39

    from hydranet_tpu.train.optimizer import make_optimizer

    class FakeTrainer:
        tx = make_optimizer(4e-4, 5e-4, total_iters=46 * 25)
        trainloader = [0] * 25  # 25 steps/epoch
        start_epoch = 0
        state = TrainState(
            params={"backbone": {"w": jnp.zeros((4, 4), jnp.float32)}},
            batch_stats={"backbone": {"mean": jnp.zeros((4,), jnp.float32)}},
            opt_state=None,
            step=jnp.zeros((), jnp.int32))

    t = mod.seed_trainer_from_npz(FakeTrainer(), npz)
    assert t.start_epoch == 40
    assert int(t.state.step) == 40 * 25
    # 1.5 and 0.25 are bf16-exact, so the round trip is exact here
    np.testing.assert_array_equal(
        np.asarray(t.state.params["backbone"]["w"]), 1.5)
    np.testing.assert_array_equal(
        np.asarray(t.state.batch_stats["backbone"]["mean"]), 0.25)
    assert t.state.opt_state is not None
    # the LR schedule must be positioned at step0: scale_by_learning_rate
    # reads the INTERNAL ScaleByScheduleState count, and leaving it at 0
    # would train the seeded run at the cosine START LR (~23x the tail)
    sched = [s for s in t.state.opt_state
             if isinstance(s, optax.ScaleByScheduleState)]
    assert sched and int(sched[0].count) == 40 * 25
    adam = [s for s in t.state.opt_state
            if isinstance(s, optax.ScaleByAdamState)]
    assert adam and int(adam[0].count) == 0  # fresh-moment bias correction
