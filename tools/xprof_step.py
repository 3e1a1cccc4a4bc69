"""Op-level TPU time breakdown of the train step via jax.profiler.

The marginal-chain tools time whole components; this captures a device
trace of real train steps and aggregates the "XLA Ops" lane of the
xplane by op/fusion name — the ground truth for where the step time
goes (BN vs conv vs CSPN vs optimizer), unaffected by the tunnel's
host-side dispatch latency because the timestamps are device-side.

Usage: python tools/xprof_step.py [--batch 32] [--steps 3] [--top 40]
       [--config nyu_completion_500] [--eval]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xla_ops(trace_dir: str):
    """Yield (op_name, duration_ms) from the newest xplane in trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane found under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                yield name, ev.duration_ps / 1e9


def main():
    import jax
    import numpy as np

    from cspn_monodepth_tpu.configs import get_config
    from cspn_monodepth_tpu.train.loop import Trainer

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--config", default="nyu_completion_500")
    ap.add_argument("--eval", action="store_true",
                    help="trace the eval (inference) step instead")
    ap.add_argument("--out", default="/tmp/cspn_xprof")
    args = ap.parse_args()

    cfg = get_config(args.config).override(**{
        "data.dataset": "synthetic", "train.batch_size": args.batch,
        "mesh.data": 1, "mesh.spatial": 1})
    trainer = Trainer(cfg, workdir="/tmp/cspn_xprof_wd")
    state = trainer.init_state()

    h, w = cfg.data.height, cfg.data.width
    rng_np = np.random.default_rng(0)
    batch = {
        "rgb": jax.device_put(
            rng_np.random((args.batch, h, w, 3), dtype="float32"),
            trainer._bsh),
        "depth": jax.device_put(
            rng_np.uniform(0.5, 9.5, (args.batch, h, w)).astype("float32"),
            trainer._bsh),
    }
    rng = trainer._epoch_rng(0)

    if args.eval:
        ebatch = dict(batch, valid_image=jax.device_put(
            np.ones((args.batch,), np.float32), trainer._bsh1d))
        idx = trainer._replicate(0)

        def run():
            s, pred = trainer.eval_step(state, ebatch, rng, idx)
            return s.n_images
    else:
        def run():
            nonlocal state
            state, loss, _ = trainer.train_step(state, batch, rng)
            return loss

    # compile + warm outside the trace
    _ = float(jax.device_get(run()))
    _ = float(jax.device_get(run()))

    with jax.profiler.trace(args.out):
        last = None
        for _ in range(args.steps):
            last = run()
        # force execution before the trace stops (the tunnel acks
        # dispatches asynchronously; a device_get is the only real sync)
        _ = float(jax.device_get(last))

    total = collections.Counter()
    count = collections.Counter()
    for name, ms in parse_xla_ops(args.out):
        total[name] += ms
        count[name] += 1
    grand = sum(total.values())
    kind = "eval" if args.eval else "train"
    print(f"\n{kind} step, batch {args.batch}, {h}x{w}; traced device op "
          f"time {grand:.1f} ms over {args.steps} steps "
          f"(~{grand / args.steps:.1f} ms/step)\n")

    # Category rollup: op names carry the fusion ROOT; classify by the
    # root op kind + result shape so the flat profile becomes actionable
    # ("how much is BN-reduce vs conv vs copies" at a glance).
    def category(name: str) -> str:
        # classify by the RESULT side only — input operand text routinely
        # mentions %custom-call / fusion names of other categories.
        name = name.split(" fusion(")[0].split(" custom-call(")[0]
        if "custom-call" in name or "CSPNDepthNet" in name:
            return "cspn custom calls"
        if name.startswith(("%copy", "%reshape", "%bitcast", "%transpose",
                            "%slice_bitcast", "%copy_bitcast")):
            return "layout copies / reshapes"
        if "convert_reduce_fusion" in name or "multiply_reduce" in name:
            return "reductions (BN stats/grads, norms)"
        if "convolution" in name or (" fusion(" in name and (
                "bf16[3,3," in name or "bf16[5,5," in name
                or "f32[3,3," in name or "f32[5,5," in name)):
            return "convolutions (incl. weight grads)"
        if "multiply_add_fusion" in name:
            return "optimizer/elementwise chains"
        if "fusion" in name:
            return "other fusions (conv/elementwise mix)"
        return "misc"

    cats = collections.Counter()
    for name, ms in total.items():
        cats[category(name)] += ms
    print(f"{'ms/step':>9} {'%':>5}  category")
    for c, ms in cats.most_common():
        print(f"{ms / args.steps:9.3f} {100 * ms / grand:5.1f}  {c}")
    print()
    print(f"{'ms/step':>9} {'%':>5} {'calls':>6}  op")
    for name, ms in total.most_common(args.top):
        print(f"{ms / args.steps:9.3f} {100 * ms / grand:5.1f} "
              f"{count[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
