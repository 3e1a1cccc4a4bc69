"""Serving API tests: checkpoint round-trip into DepthPredictor."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cspn_monodepth_tpu.configs import get_config
from cspn_monodepth_tpu.serving import DepthPredictor
from cspn_monodepth_tpu.train.checkpoint import CheckpointManager
from cspn_monodepth_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("serve"))
    cfg = get_config("synthetic_tiny").override(**{
        "train.checkpoint_dir": work, "train.steps_per_epoch": 2,
        "train.batch_size": 2, "data.height": 32, "data.width": 48,
        "data.num_samples": 20, "data.num_workers": 2,
    })
    trainer = Trainer(cfg, workdir=work)
    state = trainer.init_state()
    state, _ = trainer.train_epoch(state, 0, log=lambda *a: None)
    ckpt = CheckpointManager(work)
    ckpt.save(int(jax.device_get(state.step)), state,
              extra={"epoch": 0}, is_best=True)
    ckpt.close()
    return work, cfg


def test_predict_from_checkpoint(trained_ckpt):
    work, cfg = trained_ckpt
    predictor = DepthPredictor.from_checkpoint(work, cfg)
    rng = np.random.default_rng(0)
    rgb = rng.random((32, 48, 3)).astype(np.float32)
    sparse = np.zeros((32, 48), np.float32)
    sparse[10, 20] = 4.0
    depth = predictor.predict(rgb, sparse)
    assert depth.shape == (32, 48)
    assert np.isfinite(depth).all()
    np.testing.assert_allclose(depth[10, 20], 4.0, rtol=1e-4)  # anchor


def test_predict_uint8_and_smaller_input(trained_ckpt):
    work, cfg = trained_ckpt
    predictor = DepthPredictor.from_checkpoint(work, cfg)
    rgb8 = np.random.default_rng(1).integers(
        0, 255, (24, 40, 3), np.uint8)  # smaller than configured 32x48
    depth = predictor.predict(rgb8)
    assert depth.shape == (24, 40)
    assert np.isfinite(depth).all()


def test_predict_batch(trained_ckpt):
    work, cfg = trained_ckpt
    predictor = DepthPredictor.from_checkpoint(work, cfg)
    rgb = np.random.default_rng(2).random((3, 32, 48, 3)).astype(np.float32)
    out = predictor.predict_batch(rgb)
    assert out.shape == (3, 32, 48)


def test_missing_checkpoint_raises(tmp_path):
    cfg = get_config("synthetic_tiny").override(**{
        "data.height": 32, "data.width": 48})
    with pytest.raises(FileNotFoundError):
        DepthPredictor.from_checkpoint(str(tmp_path), cfg)


def test_export_stablehlo_roundtrip(tmp_path, trained_ckpt):
    """Exported StableHLO artifact reproduces predict_batch exactly after
    deserialization — the portable-deployment contract."""
    from jax import export as jax_export

    work, cfg = trained_ckpt
    predictor = DepthPredictor.from_checkpoint(work, cfg)
    path = tmp_path / "model.stablehlo"
    predictor.export_stablehlo(str(path), batch=2)

    rng = np.random.default_rng(0)
    rgb = rng.random((2, cfg.data.height, cfg.data.width, 3),
                     dtype=np.float32)
    sparse = np.zeros((2, cfg.data.height, cfg.data.width), np.float32)
    sparse[:, 5, 7] = 2.5
    want = predictor.predict_batch(rgb, sparse)

    blob = path.read_bytes()
    exp = jax_export.deserialize(blob)
    x = np.concatenate([rgb, sparse[..., None]], axis=-1)
    got = np.asarray(exp.call(jnp.asarray(x)))[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
