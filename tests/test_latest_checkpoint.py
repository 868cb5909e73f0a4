"""latest_checkpoint must find orbax epoch dirs under the trainer's real
layout (<logs>/<timestamp>_<tag>/model/epoch_N) — the direct <logs>/model
layout alone missed every checkpoint, so auto-resume restarted from
scratch and the hardware chain's demo/PTQ steps ran with random init."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from train_convergence import latest_checkpoint  # noqa: E402


def _mk(path):
    os.makedirs(path, exist_ok=True)
    if os.path.basename(path).startswith("epoch_"):
        # latest_checkpoint only trusts COMMITTED saves: orbax's atomic-
        # rename protocol writes the metadata file last (ADVICE r4)
        open(os.path.join(path, "_CHECKPOINT_METADATA"), "w").close()
    return path


def test_empty_dir(tmp_path):
    assert latest_checkpoint(str(tmp_path)) == ""
    _mk(str(tmp_path / "run_a" / "model"))  # run dir, nothing saved yet
    assert latest_checkpoint(str(tmp_path)) == ""


def test_direct_layout(tmp_path):
    m = _mk(str(tmp_path / "model"))
    _mk(os.path.join(m, "epoch_1"))
    _mk(os.path.join(m, "epoch_10"))
    assert latest_checkpoint(str(tmp_path)).endswith("model/epoch_10")


def test_trainer_run_dir_layout(tmp_path):
    m = _mk(str(tmp_path / "18_August_2026_01_01_43_convergence" / "model"))
    _mk(os.path.join(m, "epoch_2"))
    ep9 = _mk(os.path.join(m, "epoch_9"))
    got = latest_checkpoint(str(tmp_path))
    assert got == ep9


def test_newest_run_wins(tmp_path):
    old = _mk(str(tmp_path / "run_old" / "model" / "epoch_30"))
    os.utime(old, (time.time() - 1000, time.time() - 1000))
    new = _mk(str(tmp_path / "run_new" / "model" / "epoch_3"))
    # a resumed run's lower-numbered epoch supersedes the older run's
    # higher-numbered one: the resumed state already contains it
    assert latest_checkpoint(str(tmp_path)) == new
    assert old != new
