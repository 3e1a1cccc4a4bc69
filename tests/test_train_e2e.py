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


def test_midepoch_checkpoint_kill_resume(tiny_cfg, tmp_path):
    """Kill-at-step-N/resume reproduces the uninterrupted loss trajectory
    (VERDICT round-1 item 5): with checkpoint_every=3 and a simulated crash
    after step 3, restoring and resuming at start_step=3 must produce
    exactly the losses the uninterrupted epoch produced at steps 3-5."""
    from cspn_monodepth_tpu.train.checkpoint import (
        CheckpointManager, abstract_state_of)

    cfg = tiny_cfg.override(**{"train.checkpoint_every": 3,
                               "train.checkpoint_dir": str(tmp_path)})
    trainer = Trainer(cfg, workdir=str(tmp_path))

    # Uninterrupted trajectory (6 steps).
    _, m_full = trainer.train_epoch(trainer.init_state(), 0,
                                    log=lambda *a: None)
    assert len(m_full["step_losses"]) == 6

    # Crash after 3 steps; the step-3 checkpoint must exist.
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    state_dead, m_part = trainer.train_epoch(
        trainer.init_state(), 0, log=lambda *a: None, ckpt=ckpt,
        max_steps=3)
    ckpt.wait()
    np.testing.assert_allclose(m_part["step_losses"],
                               m_full["step_losses"][:3], rtol=1e-6)

    restored, extra = ckpt.restore(abstract_state_of(state_dead))
    assert restored is not None and extra["epoch_step"] == 3
    assert int(jax.device_get(restored.step)) == 3

    # Resume mid-epoch: steps 3-5 replay the exact uninterrupted losses.
    _, m_resume = trainer.train_epoch(restored, 0, log=lambda *a: None,
                                      start_step=3)
    np.testing.assert_allclose(m_resume["step_losses"],
                               m_full["step_losses"][3:], rtol=1e-6)
    ckpt.close()


def test_golden_convergence_to_threshold(tmp_path):
    """Golden accuracy test (VERDICT round-1 item 1b / SURVEY.md section
    5.2 item 6): training on the synthetic completion task must reach an
    eval RMSE far below the untrained baseline (~3.8 m at this config;
    recorded trajectory reaches ~1.03 by epoch 6 at lr 0.01)."""
    cfg = get_config("synthetic_tiny").override(**{
        "train.checkpoint_dir": str(tmp_path),
        "train.steps_per_epoch": 16,
        "train.batch_size": 4,
        "train.lr": 0.01,
        "data.height": 32,
        "data.width": 48,
        "data.num_samples": 30,
        "data.num_workers": 2,
    })
    trainer = Trainer(cfg, workdir=str(tmp_path))
    state = trainer.init_state()
    best_rmse, best_delta1 = float("inf"), 0.0
    for epoch in range(7):
        state, _ = trainer.train_epoch(state, epoch, log=lambda *a: None)
        if epoch >= 5:  # eval only near the end (CI time)
            ev = trainer.evaluate(state, log=lambda *a: None,
                                  save_panels=False)
            best_rmse = min(best_rmse, ev["rmse"])
            best_delta1 = max(best_delta1, ev["delta1"])
    assert best_rmse < 1.35, best_rmse          # ~25% margin over recorded
    assert best_delta1 > 0.45, best_delta1


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


def test_encoder_lr_mult():
    """Reference recipe knob (SURVEY.md section 4.6): pretrained-encoder
    layers at a fraction of the base lr. The encoder update must be exactly
    mult x the decoder update for identical gradients."""
    import jax.numpy as jnp

    from cspn_monodepth_tpu.configs import TrainConfig
    from cspn_monodepth_tpu.train.train_state import make_optimizer

    cfg = TrainConfig(optimizer="sgd", lr=0.1, momentum=0.0,
                      weight_decay=0.0, clip_norm=0.0, encoder_lr_mult=0.1)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    params = {"encoder": {"w": jnp.ones(3)}, "decoder": {"w": jnp.ones(3)},
              "depth_head_kernel": jnp.ones(2)}
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(grads, opt_state, params)
    np.testing.assert_allclose(np.asarray(upd["encoder"]["w"]),
                               0.1 * np.asarray(upd["decoder"]["w"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["depth_head_kernel"]),
                               np.asarray(upd["decoder"]["w"][:2]),
                               rtol=1e-6)


def test_paper_exact_config_requires_pretrained(tmp_path):
    """nyu_completion_500_ref refuses to train from scratch: the published
    "8sum" norm explodes without a pretrained encoder (ops/cspn_ref.py)."""
    cfg = get_config("nyu_completion_500_ref").override(**{
        "data.dataset": "synthetic", "data.height": 32, "data.width": 48,
        "model.arch": "", "model.encoder_stages": (1, 1, 1, 1),
        "model.encoder_width": 16,
        "model.decoder_channels": (32, 24, 16, 16), "model.decoder_out": 16,
        "model.cspn_impl": "jnp", "train.batch_size": 2,
        "train.checkpoint_dir": str(tmp_path), "data.num_workers": 2,
    })
    assert cfg.model.norm_type == "8sum"
    assert cfg.train.encoder_lr_mult == 0.1
    trainer = Trainer(cfg, workdir=str(tmp_path))
    with pytest.raises(ValueError, match="pretrained"):
        trainer.init_state()


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


@pytest.mark.parametrize("impl", ["pallas", "pallas_tiled"])
def test_train_step_through_pallas_custom_vjp(tmp_path, impl):
    """One full train step (fwd + bwd + update) routed through the Pallas
    CSPN kernels' custom VJPs (interpret mode on CPU) — the path the TPU
    bench exercises — must produce a finite loss that matches the jnp
    route on the same batch. Covers the whole-plane stash adjoint and the
    tiled stash adjoint inside the real training step, not just the op."""
    base = get_config("synthetic_tiny").override(**{
        "train.checkpoint_dir": str(tmp_path),
        "train.batch_size": 2,
        "data.height": 32, "data.width": 48,
        "data.num_samples": 20, "data.num_workers": 2,
        "model.num_iters": 4,
    })
    rng_np = np.random.default_rng(0)
    batch = {
        "rgb": rng_np.random((2, 32, 48, 3), dtype=np.float32),
        "depth": rng_np.uniform(0.5, 9.5, (2, 32, 48)).astype(np.float32),
    }
    losses = {}
    for name in ("jnp", impl):
        cfg = base.override(**{"model.cspn_impl": name})
        tr = Trainer(cfg, workdir=str(tmp_path / name))
        state = tr.init_state()
        rng = jax.device_put(jax.random.key(0), tr._rep)
        _, loss, _ = tr.train_step(state, batch, rng)
        assert np.isfinite(float(loss)), name
        losses[name] = float(loss)
    np.testing.assert_allclose(losses[impl], losses["jnp"], rtol=1e-5)
