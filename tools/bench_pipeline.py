"""End-to-end host input-pipeline throughput (round-2 VERDICT item 3).

The headline bench (bench.py) deliberately times compute-only chains; this
tool proves the HOST side can feed the chip: packed memmap reader ->
native C++ augment -> pack_batch (uint8/uint16 wire) -> device_put,
measured in img/s on this host's cores, plus a short REAL (non-chained)
training loop reporting data_time vs step_time per step.

No real NYU data exists in this environment, so the tool first synthesizes
a packed-NYU-format dataset (tools/prepare_nyu.py layout: full-resolution
480x640 uint8 rgb + uint16 depth memmaps) — the read+augment work per
record is identical to the real dataset's.

Stages reported:
  reader_only_ips   - memmap slice + uint16->f32 depth decode only
  augment_ips       - + the fused native affine resample (train aug)
  pipeline_ips      - the full make_train_iterator (read+augment+pack),
                      i.e. what the training loop consumes
  pipeline_put_ips  - + device_put of every batch (the transfer the real
                      loop overlaps with compute via device_prefetch)
  train loop        - mean data_time / step_time over N real steps

Usage: python tools/bench_pipeline.py [--records 512] [--batch 32]
         [--steps 16] [--workers 8] [--train-steps 8] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_synth_packed(root: str, n: int, h: int = 480, w: int = 640):
    """Write a packed-NYU-format dataset of procedural records (memmap
    layout identical to tools/prepare_nyu.py output)."""
    idx_path = os.path.join(root, "train_index.json")
    if os.path.isfile(idx_path):
        with open(idx_path) as f:
            if json.load(f)["n"] >= n:
                return
    os.makedirs(root, exist_ok=True)
    rgb_mm = np.lib.format.open_memmap(
        os.path.join(root, "train_rgb.u8.npy"), mode="w+",
        dtype=np.uint8, shape=(n, h, w, 3))
    dep_mm = np.lib.format.open_memmap(
        os.path.join(root, "train_depth.u16.npy"), mode="w+",
        dtype=np.uint16, shape=(n, h, w))
    rng = np.random.default_rng(0)
    base_rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
    base_dep = (rng.uniform(0.5, 9.5, (h, w)) * 256).astype(np.uint16)
    for i in range(n):
        rgb_mm[i] = np.roll(base_rgb, i * 7, axis=1)
        dep_mm[i] = np.roll(base_dep, i * 7, axis=1)
    rgb_mm.flush()
    dep_mm.flush()
    for split in ("train", "val"):
        with open(os.path.join(root, f"{split}_index.json"), "w") as f:
            json.dump({"n": n, "height": h, "width": w,
                       "depth_scale": 256.0, "files": []}, f)
    # val split shares the train memmaps (bench-only dataset)
    for kind, src in (("rgb.u8", "train_rgb.u8.npy"),
                      ("depth.u16", "train_depth.u16.npy")):
        dst = os.path.join(root, f"val_{kind}.npy")
        if not os.path.exists(dst):
            os.symlink(os.path.join(root, src), dst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/nyu_packed_bench")
    ap.add_argument("--records", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--train-steps", type=int, default=8)
    ap.add_argument("--skip-train", action="store_true",
                    help="host-side stages only (no TPU)")
    args = ap.parse_args()

    from cspn_monodepth_tpu.configs import get_config
    from cspn_monodepth_tpu.data.datasets import PackedNYUDataset
    from cspn_monodepth_tpu.data.pipeline import make_train_iterator

    ensure_synth_packed(args.root, args.records)
    cfg = get_config("nyu_completion_500").override(**{
        "data.root": args.root, "train.batch_size": args.batch,
        "data.num_workers": args.workers})
    ds = PackedNYUDataset(cfg.data, "train", seed=0)
    res = {"records": args.records, "batch": args.batch,
           "workers": args.workers, "host_cores": os.cpu_count()}
    n_img = args.steps * args.batch

    # --- stage probes (single-thread per-record costs, then the pipeline)
    def time_records(fn, n=128):
        fn(0)                      # warm (page-in, lib build)
        t0 = time.perf_counter()
        for i in range(n):
            fn(i % len(ds))
        return n / (time.perf_counter() - t0)

    res["reader_only_ips_1thread"] = round(time_records(
        lambda i: (np.ascontiguousarray(ds.rgb[i]),
                   ds.depth[i].astype(np.float32) / 256.0)), 1)
    res["read_augment_ips_1thread"] = round(time_records(
        lambda i: ds.get(i, epoch=0)), 1)

    # --- full iterator (read + augment + pack across the worker pool)
    def run_iter(consume):
        it = make_train_iterator(
            ds, global_batch=args.batch, epoch=0, seed=0,
            num_workers=args.workers, steps=args.steps + 2)
        gen = iter(it)
        consume(next(gen)); consume(next(gen))      # warm workers/pages
        t0 = time.perf_counter()
        for batch in gen:
            consume(batch)
        dt = time.perf_counter() - t0
        it.close()
        return n_img / dt

    res["pipeline_ips"] = round(run_iter(lambda b: None), 1)

    if not args.skip_train:
        import jax
        import jax.numpy as jnp

        from cspn_monodepth_tpu.train.loop import Trainer

        dev = jax.devices()[0]

        def put(b):
            return {k: jax.device_put(v, dev) for k, v in b.items()}

        res["pipeline_put_ips"] = round(run_iter(put), 1)

        # --- short REAL training loop (non-chained dispatches): data_time
        # is time blocked waiting on the iterator; step_time is dispatch +
        # any wait for the previous step's slot. With device_prefetch and
        # async dispatch, data_time << the ~170 ms compute step means the
        # host pipeline is NOT the bottleneck.
        trainer = Trainer(cfg, workdir="/tmp/cspn_pipe_bench")
        state = trainer.init_state()
        rng = trainer._epoch_rng(1)
        from cspn_monodepth_tpu.data.pipeline import device_prefetch

        it = make_train_iterator(
            ds, global_batch=args.batch, epoch=0, seed=0,
            num_workers=args.workers, steps=args.train_steps + 2)
        data_times, gap_times = [], []
        t_end = None
        loss = None
        for i, batch in enumerate(device_prefetch(it, {"*": trainer._bsh})):
            t0 = time.perf_counter()
            if t_end is not None:
                data_times.append(t0 - t_end)
            state, loss, _ = trainer.train_step(state, batch, rng)
            if i == 0:
                jax.block_until_ready(loss)   # absorb compile
            t_end = time.perf_counter()
            if t_end - t0 > 0.001 and i > 0:
                gap_times.append(t_end - t0)
        total_t0 = time.perf_counter()
        loss_f = float(loss)                  # drain the async queue
        drain = time.perf_counter() - total_t0
        it.close()
        assert np.isfinite(loss_f)
        res["train_loop_data_ms_mean"] = round(
            float(np.mean(data_times)) * 1e3, 1)
        res["train_loop_data_ms_max"] = round(
            float(np.max(data_times)) * 1e3, 1)
        res["train_loop_drain_s"] = round(drain, 2)
        res["train_loop_steps"] = args.train_steps
        res["train_loop_wall_ips"] = round(
            args.train_steps * args.batch
            / (sum(data_times) + sum(gap_times) + drain), 1)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
