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


def test_latest_checkpoint_picks_highest_epoch(tmp_path):
    mod = _load()
    model = tmp_path / "logs" / "model"
    model.mkdir(parents=True)
    for n in (0, 2, 10):  # 10 after 2: numeric, not lexicographic, order
        (model / f"epoch_{n}").mkdir()
    (model / "not_a_ckpt").mkdir()
    got = mod.latest_checkpoint(str(tmp_path / "logs"))
    assert got == str(model / "epoch_10")


def test_latest_checkpoint_empty_cases(tmp_path):
    mod = _load()
    assert mod.latest_checkpoint(str(tmp_path / "nope")) == ""
    (tmp_path / "logs" / "model").mkdir(parents=True)
    assert mod.latest_checkpoint(str(tmp_path / "logs")) == ""
