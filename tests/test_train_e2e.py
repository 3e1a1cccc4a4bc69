"""End-to-end golden tests (SURVEY.md section 5.2 item 6): tiny synthetic
dataset -> loss decreases; checkpoint/resume round-trips."""

import numpy as np
import pytest

import jax

from cspn_monodepth_tpu.configs import get_config
from cspn_monodepth_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    work = tmp_path_factory.mktemp("work")
    return get_config("synthetic_tiny").override(**{
        "train.checkpoint_dir": str(work),
        "train.steps_per_epoch": 6,
        "train.batch_size": 4,
        "train.lr": 0.01,
        "data.height": 32,
        "data.width": 48,
        "data.num_samples": 30,
        "data.num_workers": 2,
    })


@pytest.fixture(scope="module")
def tiny_trainer(tiny_cfg):
    """One Trainer for the module: jit caches are per-closure, so sharing
    the instance avoids recompiling ResNet-50 in every test."""
    return Trainer(tiny_cfg, workdir=tiny_cfg.train.checkpoint_dir)


def test_loss_decreases(tiny_cfg, tiny_trainer):
    trainer = tiny_trainer
    state = trainer.init_state()
    logs = []
    state, m0 = trainer.train_epoch(state, 0, log=logs.append)
    state, m3 = trainer.train_epoch(state, 1, log=logs.append)
    assert np.isfinite(m0["loss"]) and np.isfinite(m3["loss"])
    assert m3["loss"] < m0["loss"], (m0["loss"], m3["loss"])


def test_eval_metrics_finite(tiny_cfg, tiny_trainer):
    trainer = tiny_trainer
    state = trainer.init_state()
    metrics = trainer.evaluate(state, log=lambda *a: None)
    for k in ["rmse", "mae", "rel", "delta1"]:
        assert np.isfinite(metrics[k]), (k, metrics)
    assert 0.0 <= metrics["delta1"] <= 1.0


def test_checkpoint_resume(tiny_cfg, tiny_trainer, tmp_path):
    from cspn_monodepth_tpu.train.checkpoint import (
        CheckpointManager, abstract_state_of)

    trainer = tiny_trainer
    state = trainer.init_state()
    state, _ = trainer.train_epoch(state, 0, log=lambda *a: None)

    ckpt = CheckpointManager(str(tmp_path))
    step = int(jax.device_get(state.step))
    ckpt.save(step, state, extra={"epoch": 0, "best_rmse": 1.23},
              is_best=True)
    ckpt.wait()

    restored, extra = ckpt.restore(abstract_state_of(state))
    assert int(jax.device_get(restored.step)) == step
    assert extra["epoch"] == 0 and abs(extra["best_rmse"] - 1.23) < 1e-9
    assert ckpt.best_step() == step
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_full_fit_one_epoch(tmp_path):
    cfg = get_config("synthetic_tiny").override(**{
        "train.checkpoint_dir": str(tmp_path),
        "train.epochs": 1,
        "train.steps_per_epoch": 3,
        "train.batch_size": 2,
        "data.height": 32,
        "data.width": 48,
        "data.num_samples": 20,
        "data.num_workers": 2,
    })
    trainer = Trainer(cfg, workdir=str(tmp_path))
    state, best = trainer.fit(log=lambda *a: None)
    assert np.isfinite(best)
    assert (tmp_path / "train.csv").exists()
    assert (tmp_path / "test.csv").exists()
    assert (tmp_path / "best.txt").exists()


def test_mixed_dataset_training(tmp_path):
    """BASELINE config 4 capability: NYU+KITTI-style mixed-resolution
    batches interleaved into one training run (synthetic stand-ins)."""
    cfg = get_config("synthetic_tiny").override(**{
        "train.checkpoint_dir": str(tmp_path),
        "train.steps_per_epoch": 4,
        "train.batch_size": 2,
        "data.height": 32, "data.width": 48,
        "data.num_samples": 20, "data.num_workers": 2,
        "data.mix_dataset": "synthetic",
        "data.mix_height": 24, "data.mix_width": 32,
        "data.mix_max_depth": 20.0, "data.mix_every": 2,
    })
    trainer = Trainer(cfg, workdir=str(tmp_path))
    assert trainer.mix_ds is not None
    shapes = {b["rgb"].shape for b in trainer._epoch_batches(0)}
    assert shapes == {(2, 32, 48, 3), (2, 24, 32, 3)}

    state = trainer.init_state()
    state, metrics = trainer.train_epoch(state, 0, log=lambda *a: None)
    assert np.isfinite(metrics["loss"])
