"""End-to-end HydraTrainer.fit on a synthetic on-disk dataset: one epoch of
training + validation with all three metrics and a checkpoint written."""

import glob
import os

import jax
import numpy as np
import pytest

from hydranet_tpu.config import Config
from hydranet_tpu.train.trainer import HydraTrainer
from tests.synth_data import make_dataset
from tests.test_hydranet import small_config


@pytest.mark.slow
def test_fit_one_epoch(tmp_path):
    root = make_dataset(str(tmp_path / "data"), n_train=4, n_valid=2)
    d = small_config().to_dict()
    d["dataloader"]["data_list"] = f"{root}/list"
    d["dataloader"]["with_aug"] = False
    d["train"].update(dict(epoch=1, batch_size_train=2, batch_size_valid=2,
                           lr=1e-4, fine_tuning=False,
                           precise_bn_batches=1,  # exercise precise-BN path
                           logs=str(tmp_path / "logs")))
    cfg = Config.from_dict(d)

    trainer = HydraTrainer(cfg, use_mesh=False)
    trainer.train_one_epoch(0)
    summary = trainer.valid(0)

    assert "mIoU" in summary and np.isfinite(summary["mIoU"])
    assert "lane_f1" in summary

    # valid() must start from fresh metric accumulators each epoch (the
    # reference never resets them — train.py:174,188-189 — so its reported
    # per-epoch metrics are running averages over all validations so far).
    # Poison the accumulators; a correct valid() is unaffected. precise-BN
    # is disabled for the pair so batch_stats (and thus predictions) are
    # identical across the two calls.
    trainer.precise_bn_step = None
    summary1 = trainer.valid(0)
    trainer.metric_evaluator_iou.fp += 1e6
    trainer.lane_metric.metric_handlers[0].result_record.append(
        dict(hit_num=0, pr_num=10 ** 6, gt_num=10 ** 6))
    summary2 = trainer.valid(0)
    assert summary2["mIoU"] == pytest.approx(summary1["mIoU"])
    assert summary2["lane_f1"] == pytest.approx(summary1["lane_f1"])
    # detection AP present when the synthetic GT json machinery found labels
    ckpts = glob.glob(os.path.join(trainer.model_save_dir, "epoch_0*"))
    assert ckpts, "checkpoint not written"

    # resume: a fresh trainer with train.resume_from restores the full
    # TrainState (params + opt state + step) and continues at the next epoch
    d["train"]["resume_from"] = ckpts[0]
    d["train"]["epoch"] = 2
    trainer2 = HydraTrainer(Config.from_dict(d), use_mesh=False)
    assert trainer2.start_epoch == 1
    a = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(trainer2.state.params)[0])
    np.testing.assert_array_equal(a, b)
    assert int(trainer2.state.step) == int(trainer.state.step)
    trainer2.train_one_epoch(1)  # one more epoch runs from the resumed state
    assert int(trainer2.state.step) > int(trainer.state.step)
