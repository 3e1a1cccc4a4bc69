"""Headline benchmark: images/s/chip for train + CSPN-refine inference at
NYU 304x228 (BASELINE.json driver metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s/chip", "vs_baseline": N, ...}

The combined number is the throughput of a pipeline that both trains and
runs refined inference on every image: 1 / (1/train_ips + 1/infer_ips).

vs_baseline compares against the PyTorch reference implementation measured
on this host (tools/torch_baseline.py, cached in BENCH_BASELINE.json).
The reference repo published no img/s and this zero-egress environment has
no GPU, so the torch-CPU measurement is the only measurable baseline;
BENCH_BASELINE.json records the details.
"""

from __future__ import annotations

import json
import os
import time


def _timeit(fn, *args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from cspn_monodepth_tpu.configs import get_config
    from cspn_monodepth_tpu.train.loop import Trainer

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    cfg = get_config("nyu_completion_500").override(**{
        "data.dataset": "synthetic",     # bench feeds random tensors anyway
        "train.batch_size": batch,
        "train.steps_per_epoch": 1,
    })
    trainer = Trainer(cfg, workdir="/tmp/cspn_bench")
    state = trainer.init_state()

    h, w = cfg.data.height, cfg.data.width
    rng_np = __import__("numpy").random.default_rng(0)
    # Device-resident batch: the training loop overlaps host->device copies
    # with compute via device_prefetch (data/pipeline.py), so steady-state
    # throughput is compute-bound; the bench measures that path.
    host_batch = {
        "rgb": rng_np.random((batch, h, w, 3), dtype="float32"),
        "depth": rng_np.uniform(0.5, 9.5, (batch, h, w)).astype("float32"),
    }
    host_batch = {k: jax.device_put(v, trainer._bsh)
                  for k, v in host_batch.items()}
    rng = jax.device_put(jax.random.key(0), trainer._rep)

    # --- train step (fwd + bwd + update + metrics, all fused under jit).
    # The step donates `state`, so the timing loop must thread it through.
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    for _ in range(3):  # compile + warmup
        state, loss, _ = trainer.train_step(state, host_batch, rng)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = trainer.train_step(state, host_batch, rng)
    jax.block_until_ready(loss)
    t_train = (time.perf_counter() - t0) / iters
    train_ips = batch / t_train

    # --- inference step (fwd with CSPN refinement, eval mode)
    eval_batch = {**host_batch,
                  "valid_image": jax.device_put(
                      __import__("numpy").ones(batch, "float32"),
                      trainer._bsh1d)}
    t_infer = _timeit(lambda: trainer.eval_step(state, eval_batch, rng)[0],
                      iters=iters)
    infer_ips = batch / t_infer

    combined = 1.0 / (1.0 / train_ips + 1.0 / infer_ips)

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("combined_ips"):
            vs_baseline = combined / base["combined_ips"]

    print(json.dumps({
        "metric": ("train+infer images/s/chip, NYU 304x228 rgbd, "
                   "ResNet50-UNet + 24-iter CSPN"),
        "value": round(combined, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "train_images_per_sec": round(train_ips, 2),
        "infer_images_per_sec": round(infer_ips, 2),
        "batch": batch,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
