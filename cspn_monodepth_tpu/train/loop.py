"""Training / evaluation driver (SURVEY.md R2, section 3.1-3.2).

Mirrors the reference's `main.py: main()/train()/validate()` behavior —
epoch loop, per-batch step, metric accumulation, CSV rows, checkpoint/best
bookkeeping — redesigned TPU-first:

* ONE jit-compiled train step: device-side sparse sampling, forward
  (bf16 MXU), masked loss, backward, optimizer update, metric sums —
  state donated, no host round-trips inside an epoch.
* All arrays live on a ("data", "spatial") mesh; the batch is sharded over
  "data" (DP) and params are replicated. Gradient all-reduce and sync-BN
  are inserted by XLA automatically.
* Eval accumulates MetricSums on device (psum-reducible across hosts) and
  finalizes once per epoch on host.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cspn_monodepth_tpu.configs import Config
from cspn_monodepth_tpu.data.datasets import make_dataset
from cspn_monodepth_tpu.data.pipeline import (
    device_prefetch,
    make_eval_iterator,
    make_train_iterator,
)
from cspn_monodepth_tpu.models import CSPNDepthNet
from cspn_monodepth_tpu.ops import uniform_sparse_sample
from cspn_monodepth_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from cspn_monodepth_tpu.train.checkpoint import CheckpointManager, abstract_state_of
from cspn_monodepth_tpu.train.loss import get_loss_fn
from cspn_monodepth_tpu.train.metrics import (
    AverageMeter,
    MetricSums,
    finalize_metrics,
    metric_sums_from_batch,
)
from cspn_monodepth_tpu.train.train_state import (
    TrainState,
    create_train_state,
    make_optimizer,
)
from cspn_monodepth_tpu.utils.logging import CSVLogger

METRIC_FIELDS = ["epoch", "loss", "rmse", "mae", "rel", "lg10", "delta1",
                 "delta2", "delta3", "irmse", "imae", "lr", "images_per_sec",
                 "data_time", "step_time"]


class Trainer:
    def __init__(self, cfg: Config, mesh=None, workdir: str | None = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.workdir = workdir or cfg.train.checkpoint_dir
        self.model = CSPNDepthNet(
            modality=cfg.model.modality,
            num_iters=cfg.model.num_iters,
            norm_type=cfg.model.norm_type,
            cspn_impl=cfg.model.cspn_impl,
            dtype=jnp.dtype(cfg.model.dtype),
            arch=cfg.model.arch or None,
            encoder_stages=tuple(cfg.model.encoder_stages),
            encoder_block=cfg.model.encoder_block,
            encoder_width=cfg.model.encoder_width,
            decoder_channels=tuple(cfg.model.decoder_channels),
            decoder_out=cfg.model.decoder_out,
            decoder_block=cfg.model.decoder_block,
            packed_tail=cfg.model.packed_tail,
            packed_stem=cfg.model.packed_stem,
            spatial_mesh=self.mesh if cfg.mesh.spatial > 1 else None,
        )
        self.train_ds = make_dataset(cfg.data, "train", seed=cfg.train.seed)
        self.val_ds = make_dataset(cfg.data, "val", seed=cfg.train.seed)
        # Mixed training (configs.DataConfig.mix_*): secondary dataset
        # interleaved at batch level; the fully-convolutional model accepts
        # both resolutions (one jit cache entry per shape).
        self.mix_ds = None
        if cfg.data.mix_dataset:
            import dataclasses as _dc

            mix_cfg = _dc.replace(
                cfg.data, dataset=cfg.data.mix_dataset,
                root=cfg.data.mix_root, height=cfg.data.mix_height,
                width=cfg.data.mix_width, max_depth=cfg.data.mix_max_depth,
                rotate_deg=0.0, scale_max=1.0, mix_dataset="")
            self.mix_ds = make_dataset(mix_cfg, "train", seed=cfg.train.seed + 1)
        n = len(self.train_ds)
        self.steps_per_epoch = cfg.train.steps_per_epoch or max(
            n // cfg.train.batch_size, 1)
        self.tx, self.lr_schedule = make_optimizer(
            cfg.train, self.steps_per_epoch)
        self.loss_fn = get_loss_fn(cfg.train.loss)

        self._rep = replicated_sharding(self.mesh)
        # (B, H, W[, C]) arrays: B over "data", H over "spatial" (if used).
        self._bsh = batch_sharding(
            self.mesh, spatial_dim=1 if cfg.mesh.spatial > 1 else None)
        # (B,)-shaped per-image arrays shard over "data" only.
        self._bsh1d = batch_sharding(self.mesh)
        self._compile_steps()

    # ---------------------------------------------------------- helpers
    def _replicate(self, x):
        """Put a host value onto the mesh fully replicated — works in both
        single-process (device_put) and multi-host (every process supplies
        the same value; device_put can't target non-addressable devices)."""
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(self._rep, x)
        return jax.device_put(x, self._rep)

    def _epoch_rng(self, tag: int):
        # uint32 (legacy-style) keys so they survive np round-trips in
        # multi-host replication; all jax.random APIs accept them.
        return self._replicate(
            jax.random.PRNGKey(self.cfg.train.seed + tag))

    # ---------------------------------------------------------- model io
    @staticmethod
    def _unpack(batch):
        """Decode the compact wire format (data/pipeline.py pack_batch) on
        device: uint8 rgb -> [0,1] f32, uint16 depth -> meters f32. Float
        batches (tests, bench) pass through unchanged."""
        from cspn_monodepth_tpu.data.pipeline import DEPTH_SCALE

        out = dict(batch)
        if batch["rgb"].dtype == jnp.uint8:
            out["rgb"] = batch["rgb"].astype(jnp.float32) / 255.0
        if batch["depth"].dtype == jnp.uint16:
            out["depth"] = batch["depth"].astype(jnp.float32) / DEPTH_SCALE
        return out

    def _assemble_input(self, rgb, sparse):
        """Stack per-modality input channels (SURVEY.md section 3.1)."""
        modality = self.cfg.model.modality
        if modality == "rgb":
            return rgb
        if modality == "d":
            return sparse[..., None]
        return jnp.concatenate([rgb, sparse[..., None]], axis=-1)

    def _sample_sparse(self, rng, depth, rgb):
        cfg = self.cfg
        if cfg.data.num_samples <= 0:
            return jnp.zeros_like(depth)
        cap = cfg.data.max_depth
        if cfg.data.mix_dataset:
            # One cap for both datasets: the looser one is a no-op for
            # the shallower dataset (NYU <= 10 m is unaffected by 85 m).
            cap = max(cap, cfg.data.mix_max_depth)
        if cfg.data.sampler == "stereo":
            from cspn_monodepth_tpu.ops import stereo_sparse_sample

            return stereo_sparse_sample(rng, depth, rgb,
                                        cfg.data.num_samples, max_depth=cap)
        return uniform_sparse_sample(
            rng, depth, cfg.data.num_samples, max_depth=cap)

    # ---------------------------------------------------------- jit steps
    def _compile_steps(self):
        cfg = self.cfg

        def train_step(state: TrainState, batch, rng):
            batch = self._unpack(batch)
            rng = jax.random.fold_in(rng, state.step)
            sparse = self._sample_sparse(rng, batch["depth"], batch["rgb"])
            x = self._assemble_input(batch["rgb"], sparse)
            target = batch["depth"][..., None]

            def loss_of(params):
                pred, mut = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, mutable=["batch_stats"])
                return self.loss_fn(pred, target), (pred, mut["batch_stats"])

            (loss, (pred, new_stats)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            new_state = state.apply_gradients(self.tx, grads, new_stats)
            sums = metric_sums_from_batch(
                pred, target, protocol=cfg.train.metrics_protocol)
            return new_state, loss, sums

        def eval_step(state: TrainState, batch, rng, batch_idx):
            batch = self._unpack(batch)
            # Deterministic but i.i.d.-across-batches sparse input: fixed
            # eval seed folded with the batch index.
            rng = jax.random.fold_in(rng, batch_idx)
            sparse = self._sample_sparse(rng, batch["depth"], batch["rgb"])
            x = self._assemble_input(batch["rgb"], sparse)
            pred = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False)
            sums = metric_sums_from_batch(
                pred, batch["depth"][..., None],
                valid_image=batch["valid_image"],
                max_depth=cfg.data.eval_max_depth,
                protocol=cfg.train.metrics_protocol)
            return sums, pred

        rep, bsh = self._rep, self._bsh
        # Unjitted step functions are exposed for composition (bench.py
        # scans them to time serial chains; tests call them directly).
        self.train_step_fn = train_step
        self.eval_step_fn = eval_step
        self.train_step = jax.jit(
            train_step, donate_argnums=(0,),
            in_shardings=(rep, {"rgb": bsh, "depth": bsh}, rep),
            out_shardings=(rep, rep, rep))
        self.eval_step = jax.jit(
            eval_step,
            in_shardings=(rep, {"rgb": bsh, "depth": bsh,
                                "valid_image": self._bsh1d}, rep, rep),
            out_shardings=(rep, bsh))

    # ---------------------------------------------------------- state
    def init_state(self) -> TrainState:
        cfg = self.cfg
        if cfg.model.require_pretrained and not cfg.model.pretrained:
            raise ValueError(
                f"config {cfg.name!r} is a paper-exact recipe that is "
                "unstable from scratch: set model.pretrained to a "
                "torchvision ResNet .pth (e.g. --set model.pretrained="
                "/path/to/resnet50.pth)")
        h, w = cfg.data.height, cfg.data.width
        ch = {"rgb": 3, "rgbd": 4, "d": 1}[cfg.model.modality]
        # Dummy batch must be shardable over the "data" axis (the CSPN
        # shard_map inside apply requires it even at init time).
        dummy = jnp.zeros((self.mesh.shape["data"], h, w, ch), jnp.float32)

        def init_fn():
            # Seed closed over statically: a no-arg jit avoids passing any
            # process-local array into a multi-host computation.
            variables = self.model.init(
                jax.random.PRNGKey(cfg.train.seed), dummy, train=False)
            return create_train_state(variables, self.tx)

        state = jax.jit(init_fn, out_shardings=self._rep)()

        # Reference `pretrained=True` workflow: graft torchvision encoder
        # weights (every process loads the same file; result stays
        # replicated). Decoder/heads keep their fresh init.
        if cfg.model.pretrained:
            from cspn_monodepth_tpu.models.torch_weights import (
                load_pretrained_encoder)

            ch = {"rgb": 3, "rgbd": 4, "d": 1}[cfg.model.modality]
            variables = {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)}
            variables = load_pretrained_encoder(
                variables, cfg.model.pretrained, in_channels=ch,
                arch=cfg.model.arch or "resnet50")
            state = state.replace(
                params=jax.device_put(variables["params"], self._rep),
                batch_stats=jax.device_put(
                    variables["batch_stats"], self._rep))
        return state

    # ---------------------------------------------------------- epochs
    def _epoch_batches(self, epoch: int, start_step: int = 0):
        """Yield this epoch's device-prefetched batches from `start_step`
        on (mid-epoch resume; the sequence is a pure function of
        (seed, epoch, step)); with mixing, every mix_every-th batch comes
        from the secondary dataset."""
        cfg = self.cfg
        total = self.steps_per_epoch
        k = cfg.data.mix_every if self.mix_ds is not None else 0
        n_mix = total // k if k else 0
        # Of the first start_step global steps, start_step // k came from
        # the mix stream and the rest from the main stream.
        mix_start = start_step // k if k else 0
        it = make_train_iterator(
            self.train_ds, global_batch=cfg.train.batch_size, epoch=epoch,
            seed=cfg.train.seed, num_workers=cfg.data.num_workers,
            steps=total - n_mix, start_step=start_step - mix_start,
            process_index=jax.process_index(),
            process_count=jax.process_count())
        main = device_prefetch(it, {"*": self._bsh})
        if not n_mix:
            yield from main
            it.close()
            return
        mix_it = make_train_iterator(
            self.mix_ds, global_batch=cfg.train.batch_size, epoch=epoch,
            seed=cfg.train.seed + 1, num_workers=cfg.data.num_workers,
            steps=n_mix, start_step=mix_start,
            process_index=jax.process_index(),
            process_count=jax.process_count())
        mix = device_prefetch(mix_it, {"*": self._bsh})
        main_iter, mix_iter = iter(main), iter(mix)
        for step in range(start_step, total):
            src = mix_iter if (step % k == k - 1) else main_iter
            try:
                yield next(src)
            except StopIteration:
                break
        it.close()
        mix_it.close()

    def train_epoch(self, state: TrainState, epoch: int, log=print,
                    start_step: int = 0, ckpt=None, ckpt_extra=None,
                    max_steps: int | None = None):
        """Run one epoch (from `start_step` when resuming mid-epoch).

        With `ckpt` set and cfg.train.checkpoint_every > 0, the TrainState
        is saved every N steps with {"epoch", "epoch_step"} extras so a
        crash loses at most N steps, not the epoch (SURVEY.md section 6
        failure-detection row). `max_steps` stops the epoch early after
        that many executed steps — the fault-injection hook the
        kill-at-step-N/resume test uses to simulate a crash.
        """
        cfg = self.cfg
        rng = self._epoch_rng(17 * epoch + 1)

        meter = AverageMeter()
        sums = MetricSums.zeros(cfg.train.metrics_protocol)
        losses = []
        t_end = time.time()
        for step, batch in enumerate(self._epoch_batches(epoch, start_step),
                                     start=start_step):
            data_time = time.time() - t_end
            state, loss, s = self.train_step(state, batch, rng)
            if step % cfg.train.log_every == 0:
                loss_f = float(loss)  # sync point only every log_every
                step_time = (time.time() - t_end) - data_time
                ips = cfg.train.batch_size / max(step_time, 1e-9)
                log(f"epoch {epoch} step {step}/{self.steps_per_epoch} "
                    f"loss {loss_f:.4f} data {data_time*1000:.0f}ms "
                    f"step {step_time*1000:.0f}ms ({ips:.1f} img/s)")
            meter.update(data_time=data_time,
                         step_time=time.time() - t_end - data_time)
            losses.append(loss)
            sums = sums + s
            if (ckpt is not None and cfg.train.checkpoint_every > 0
                    and (step + 1) % cfg.train.checkpoint_every == 0
                    and step + 1 < self.steps_per_epoch):
                ckpt.save(int(jax.device_get(state.step)), state,
                          extra={**(ckpt_extra or {}), "epoch": epoch,
                                 "epoch_step": step + 1})
            if max_steps is not None and step + 1 - start_step >= max_steps:
                break
            t_end = time.time()

        metrics = finalize_metrics(sums)
        metrics["loss"] = (float(jnp.mean(jnp.stack(losses)))
                           if losses else float("nan"))
        metrics["step_losses"] = [float(x) for x in jax.device_get(losses)]
        metrics.update(meter.average())
        metrics["lr"] = float(self.lr_schedule(state.step))
        return state, metrics

    def evaluate(self, state: TrainState, log=print, epoch: int | None = None,
                 save_panels: bool = True):
        cfg = self.cfg
        it = make_eval_iterator(
            self.val_ds, global_batch=cfg.train.batch_size,
            num_workers=cfg.data.num_workers,
            process_index=jax.process_index(),
            process_count=jax.process_count())
        # Eval sparse input must be deterministic: fixed seed, not step-dep.
        rng = self._epoch_rng(9999)
        sums = MetricSums.zeros(cfg.train.metrics_protocol)
        t0 = time.time()
        batches = device_prefetch(
            it, {"valid_image": self._bsh1d, "*": self._bsh})
        # The first eval_step call pays jit compilation (tens of seconds on
        # a cold cache); exclude it from the throughput figure by fencing
        # after batch 0 and counting only the images accumulated after the
        # fence (one scalar readback, first batch only).
        n_warm = 0.0
        t_warm = t0
        for i, batch in enumerate(batches):
            s, pred = self.eval_step(state, batch, rng, self._replicate(i))
            # Accumulate on device only — a per-batch device_get here would
            # serialize host<->device every step (the image count is already
            # in sums.n_images; one readback happens in finalize_metrics).
            sums = sums + s
            if i == 0:
                n_warm = float(jax.device_get(sums.n_images))
                if save_panels and jax.process_index() == 0:
                    self._save_panel(
                        {k: np.asarray(jax.device_get(v))
                         for k, v in batch.items()}, pred, epoch)
                # Fence AFTER the one-time panel host work (device_get of
                # the whole batch + PNG encode) so that cost is charged to
                # warm-up, not the steady-state throughput window.
                t_warm = time.time()
        it.close()
        metrics = finalize_metrics(sums)
        steady_images = metrics["n_images"] - n_warm
        if steady_images > 0:
            metrics["images_per_sec"] = (
                steady_images / max(time.time() - t_warm, 1e-9))
        else:                       # single-batch eval: compile-inclusive
            metrics["images_per_sec"] = (
                metrics["n_images"] / max(time.time() - t0, 1e-9))
        log("eval " + " ".join(f"{k} {v:.4f}" for k, v in metrics.items()
                               if isinstance(v, float)))
        return metrics

    def _save_panel(self, batch, pred, epoch: int | None):
        """Save the reference-style rgb|sparse|gt|pred comparison strip
        (SURVEY.md R13) for the first few eval images."""
        from cspn_monodepth_tpu.utils.logging import merge_into_row, save_image

        from cspn_monodepth_tpu.data.pipeline import DEPTH_SCALE

        try:
            pred_np = np.asarray(jax.device_get(pred))[..., 0]
            rgb = np.asarray(batch["rgb"])
            depth = np.asarray(batch["depth"])
            if rgb.dtype == np.uint8:           # compact wire format
                rgb = rgb.astype(np.float32) / 255.0
            if depth.dtype == np.uint16:
                depth = depth.astype(np.float32) / DEPTH_SCALE
            rows = [merge_into_row(rgb[i], None, depth[i], pred_np[i])
                    for i in range(min(4, rgb.shape[0]))]
            tag = "latest" if epoch is None else f"epoch{epoch:03d}"
            strip = np.concatenate(rows, axis=0)
            save_image(strip, f"{self.workdir}/comparison_{tag}.png")
            # Exposed for TensorBoard image logging (fit) — SURVEY.md
            # section 6 metrics row: "colored depth image panels".
            self.last_panel = strip
        except Exception as e:  # visualization must never kill eval
            print(f"panel save failed: {e}")

    # ---------------------------------------------------------- fit
    def fit(self, log=print):
        cfg = self.cfg
        ckpt = CheckpointManager(self.workdir)
        state = self.init_state()
        start_epoch = 0
        start_step = 0
        best_rmse = float("inf")

        restored, extra = ckpt.restore(abstract_state_of(state))
        if restored is not None:
            state = restored
            ep = int(extra.get("epoch", -1))
            es = int(extra.get("epoch_step", 0) or 0)
            if 0 < es < self.steps_per_epoch:
                # Mid-epoch checkpoint: resume inside the epoch; the batch
                # sequence is a pure function of (seed, epoch, step).
                start_epoch, start_step = ep, es
            else:
                start_epoch, start_step = ep + 1, 0
            best_rmse = float(extra.get("best_rmse", float("inf")))
            log(f"resumed from step {int(jax.device_get(state.step))}, "
                f"epoch {start_epoch} step {start_step}")

        train_csv = CSVLogger(f"{self.workdir}/train.csv", METRIC_FIELDS)
        test_csv = CSVLogger(f"{self.workdir}/test.csv", METRIC_FIELDS)
        from cspn_monodepth_tpu.utils.tensorboard import TBWriter

        tb = TBWriter(f"{self.workdir}/tb",
                      enabled=jax.process_index() == 0)

        for epoch in range(start_epoch, cfg.train.epochs):
            state, train_metrics = self.train_epoch(
                state, epoch, log=log,
                start_step=start_step if epoch == start_epoch else 0,
                ckpt=ckpt, ckpt_extra={"best_rmse": best_rmse,
                                       "config": cfg.name})
            train_csv.append({"epoch": epoch, **{
                k: f"{v:.6f}" for k, v in train_metrics.items()
                if isinstance(v, float)}})
            tb.scalars("train", train_metrics, epoch)

            self.last_panel = None
            eval_metrics = self.evaluate(state, log=log, epoch=epoch)
            test_csv.append({"epoch": epoch, **{
                k: f"{v:.6f}" for k, v in eval_metrics.items()
                if isinstance(v, float)}})
            tb.scalars("eval", eval_metrics, epoch)
            if self.last_panel is not None:
                tb.image("eval/rgb_sparse_gt_pred", self.last_panel, epoch)
            tb.flush()

            is_best = eval_metrics["rmse"] < best_rmse
            if is_best:
                best_rmse = eval_metrics["rmse"]
                with open(f"{self.workdir}/best.txt", "w") as f:
                    f.write(f"epoch {epoch} " + " ".join(
                        f"{k}={v:.6f}" for k, v in eval_metrics.items()
                        if isinstance(v, float)))
            ckpt.save(int(jax.device_get(state.step)), state,
                      extra={"epoch": epoch, "best_rmse": best_rmse,
                             "config": cfg.name},
                      is_best=is_best)
        ckpt.close()
        return state, best_rmse
