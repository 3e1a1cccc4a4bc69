"""Inference/serving API.

The reference only exposes `--evaluate` over a dataset; a production user
needs single/multi-image prediction against a trained checkpoint. This
module provides that as a small, jit-cached predictor:

    predictor = DepthPredictor.from_checkpoint("/ckpts/run1", cfg)
    depth = predictor.predict(rgb)                  # (H, W, 3) -> (H, W)
    depth = predictor.predict(rgb, sparse_depth)    # depth completion

Design notes:
* one compiled executable per input shape (jit cache); inputs are padded
  to the configured (height, width) and the output un-padded, so arbitrary
  nearby sizes don't trigger recompiles;
* accepts numpy uint8 or float rgb; runs eval-mode BN with the
  checkpoint's running statistics;
* batching: `predict_batch` for (B, H, W, 3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cspn_monodepth_tpu.configs import Config
from cspn_monodepth_tpu.models import CSPNDepthNet
from cspn_monodepth_tpu.train.checkpoint import CheckpointManager, abstract_state_of


class DepthPredictor:
    def __init__(self, model: CSPNDepthNet, params, batch_stats,
                 height: int, width: int):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.height = height
        self.width = width

        def fwd(params, batch_stats, x):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=False)

        self._fwd = jax.jit(fwd)

    # ------------------------------------------------------------ build
    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, cfg: Config,
                        step: int | None = None,
                        prefer_best: bool = True) -> "DepthPredictor":
        from cspn_monodepth_tpu.train.loop import Trainer

        trainer = Trainer(cfg, workdir=ckpt_dir)
        state = trainer.init_state()
        ckpt = CheckpointManager(ckpt_dir)
        if step is None and prefer_best:
            step = ckpt.best_step()
        restored, _ = ckpt.restore(abstract_state_of(state), step=step)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        return cls(trainer.model, restored.params, restored.batch_stats,
                   cfg.data.height, cfg.data.width)

    @classmethod
    def from_variables(cls, cfg: Config, variables) -> "DepthPredictor":
        model = CSPNDepthNet(
            modality=cfg.model.modality, num_iters=cfg.model.num_iters,
            norm_type=cfg.model.norm_type, cspn_impl=cfg.model.cspn_impl,
            dtype=jnp.dtype(cfg.model.dtype),
            arch=cfg.model.arch or None,
            encoder_stages=tuple(cfg.model.encoder_stages),
            encoder_block=cfg.model.encoder_block,
            encoder_width=cfg.model.encoder_width,
            decoder_channels=tuple(cfg.model.decoder_channels),
            decoder_out=cfg.model.decoder_out,
            decoder_block=cfg.model.decoder_block,
            packed_tail=cfg.model.packed_tail,
            packed_stem=cfg.model.packed_stem)
        return cls(model, variables["params"], variables["batch_stats"],
                   cfg.data.height, cfg.data.width)

    # ------------------------------------------------------------ run
    def _prep_rgb(self, rgb: np.ndarray) -> np.ndarray:
        rgb = np.asarray(rgb)
        if rgb.dtype == np.uint8:
            rgb = rgb.astype(np.float32) / 255.0
        return rgb.astype(np.float32)

    def predict_batch(self, rgb: np.ndarray,
                      sparse_depth: np.ndarray | None = None) -> np.ndarray:
        """rgb (B, h, w, 3); sparse_depth optional (B, h, w). h <= height,
        w <= width (padded up and cropped back). Returns (B, h, w) meters."""
        rgb = self._prep_rgb(rgb)
        b, h, w, _ = rgb.shape
        assert h <= self.height and w <= self.width, (
            f"input {h}x{w} exceeds configured {self.height}x{self.width}")
        ph, pw = self.height - h, self.width - w
        rgb_p = np.pad(rgb, ((0, 0), (0, ph), (0, pw), (0, 0)))

        modality = self.model.modality
        if modality == "rgb":
            x = rgb_p
        else:
            if sparse_depth is None:
                sparse = np.zeros((b, self.height, self.width), np.float32)
            else:
                sparse = np.pad(np.asarray(sparse_depth, np.float32),
                                ((0, 0), (0, ph), (0, pw)))
            if modality == "d":
                x = sparse[..., None]
            else:
                x = np.concatenate([rgb_p, sparse[..., None]], axis=-1)

        out = self._fwd(self.params, self.batch_stats, jnp.asarray(x))
        return np.asarray(jax.device_get(out))[:, :h, :w, 0]

    def predict(self, rgb: np.ndarray,
                sparse_depth: np.ndarray | None = None) -> np.ndarray:
        """Single image (h, w, 3) [+ (h, w) sparse] -> (h, w) depth."""
        sp = None if sparse_depth is None else sparse_depth[None]
        return self.predict_batch(rgb[None], sp)[0]

    # ------------------------------------------------------------ export
    def export_stablehlo(self, path: str, batch: int = 1):
        """Serialize the forward pass (weights baked in, eval-mode BN) to a
        portable StableHLO artifact via jax.export.

        The artifact is loadable WITHOUT this package — any process with
        jax installed can `jax.export.deserialize(blob).call(x)` and run it
        on TPU/CPU/GPU, which is the deployment story the reference (a
        research repo with torch.save checkpoints only, SURVEY.md R13)
        never had. Input: (batch, height, width, C) float32 with C fixed by
        the modality (rgb 3 / rgbd 4 / d 1); output (batch, H, W, 1) depth.

        Returns the jax.export.Exported object.
        """
        from jax import export as jax_export

        ch = {"rgb": 3, "rgbd": 4, "d": 1}[self.model.modality]
        spec = jax.ShapeDtypeStruct(
            (batch, self.height, self.width, ch), jnp.float32)
        params, stats = self.params, self.batch_stats

        def fwd(x):
            return self.model.apply(
                {"params": params, "batch_stats": stats}, x, train=False)

        exp = jax_export.export(jax.jit(fwd))(spec)
        with open(path, "wb") as f:
            f.write(exp.serialize())
        return exp
