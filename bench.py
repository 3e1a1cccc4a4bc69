"""Headline benchmark: images/s/chip for train + CSPN-refine inference at
NYU 304x228 (BASELINE.json driver metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s/chip", "vs_baseline": N, ...}

Measurement methodology — MARGINAL serial chaining: two chains of N and
5N serially-dependent steps each run as one lax.scan inside a single jit,
the wall clock closing only after a SCALAR device->host readback of the
final loss. The device cannot produce that scalar before all steps
complete, so the timing is honest even when the PJRT transport
acknowledges dispatches asynchronously (this environment's tunneled TPU
does — naive block_until_ready timing overreports throughput by >10x).
The per-step time is the DIFFERENCE (t_5N - t_N) / 4N: the tunnel also
adds a large, run-varying fixed latency per dispatch (5-25 ms round-trip
measured), which a single chain at N=10 would smear into every step as
RTT/N; differencing two chain lengths cancels it in expectation (each
chain is timed as a min over several repetitions, bounding the residual
by the latency spread; a non-positive difference is treated as a
measurement failure — retried with more repetitions, then raised, never
clamped). A real training loop pays that latency once, not per step
(dispatches pipeline).

The combined number is the throughput of a pipeline that both trains and
runs refined inference on every image: 1 / (1/train_ips + 1/infer_ips).
Input transfers are excluded: the training loop overlaps host->device
copies with compute (data/pipeline.py device_prefetch).

vs_baseline compares against the PyTorch reference implementation measured
on this host (tools/torch_baseline.py -> BENCH_BASELINE.json); the
reference published no img/s and this environment has no GPU.
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cspn_monodepth_tpu.configs import get_config
    from cspn_monodepth_tpu.train.loop import Trainer

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_chain = int(os.environ.get("BENCH_ITERS", "10"))

    # Gradient-parity gate (SURVEY.md §5.2-3): the bench numbers depend on
    # the Pallas CSPN kernels + their hand adjoints every step, and the
    # CPU test suite only covers them in interpret mode. Compile-and-assert
    # parity on this backend BEFORE timing, and embed the errors in the
    # recorded JSON so every BENCH_r*.json archives the check. The gate is
    # keyed to the config so it checks the kernels the timed numbers
    # actually route to: NYU -> whole-plane kernel + adjoint at 228x304;
    # KITTI -> H-tiled kernel + tiled adjoint at 352x1216. Both also
    # compile the PRENORM slab kernel + prenorm adjoint (the per-shard hot
    # path of a real multi-chip run, otherwise interpret-only) and assert
    # the VMEM-budget routing decisions (free, pure Python). Opt out with
    # BENCH_PARITY=0 (e.g. for quick smoke runs).
    config_name = os.environ.get("BENCH_CONFIG", "nyu_completion_500")
    parity = None
    if (os.environ.get("BENCH_PARITY", "1") != "0"
            and jax.default_backend() not in ("cpu",)):
        from cspn_monodepth_tpu.ops.parity import (
            cspn_parity_check,
            prenorm_parity_check,
            vmem_routing_check,
        )

        parity = {"vmem_routing": vmem_routing_check()}
        if "kitti" in config_name:
            from cspn_monodepth_tpu.ops.cspn_pallas import (
                cspn_propagate_pallas_tiled)

            parity["tiled_352x1216"] = cspn_parity_check(
                norms=("8sum_clamp",), batch=2, h=352, w=1216,
                op=cspn_propagate_pallas_tiled)
            # KITTI 4-way-spatial slab: 352/4 interior + 2*8 halo rows.
            parity["prenorm_104x1216"] = prenorm_parity_check(
                batch=2, h=104, w=1216, num_iters=8)
        else:
            # Two norms keep the cold-cache compile cost bounded:
            # 8sum_clamp is the training default (exercises the hand
            # adjoint the train numbers depend on), 8sum_abs the
            # absolute-scale control. The full 3-norm sweep is
            # tools/tpu_parity_check.py.
            parity["whole_plane_228x304"] = cspn_parity_check(
                norms=("8sum_clamp", "8sum_abs"), batch=2)
            parity["prenorm_96x304"] = prenorm_parity_check(
                batch=2, h=96, w=304, num_iters=8)
    # BENCH_CONFIG selects any named config (e.g. kitti_1216); the mesh is
    # clamped to the available devices so the KITTI config's 2x4 mesh runs
    # single-chip (spatial sharding itself is covered by tests/CPU mesh).
    n_dev = jax.device_count()
    cfg = get_config(config_name).override(**{
        "data.dataset": "synthetic",     # bench feeds random tensors anyway
        "train.batch_size": batch,
        "train.steps_per_epoch": 1,
        "mesh.data": min(get_config(config_name).mesh.data, n_dev),
        "mesh.spatial": 1 if n_dev == 1 else get_config(config_name).mesh.spatial,
    })
    trainer = Trainer(cfg, workdir="/tmp/cspn_bench")
    state = trainer.init_state()

    h, w = cfg.data.height, cfg.data.width
    rng_np = np.random.default_rng(0)
    dev_batch = {
        "rgb": jax.device_put(
            rng_np.random((batch, h, w, 3), dtype="float32"), trainer._bsh),
        "depth": jax.device_put(
            rng_np.uniform(0.5, 9.5, (batch, h, w)).astype("float32"),
            trainer._bsh),
    }
    rng = jax.device_put(jax.random.key(0), trainer._rep)

    # Fold EVERY leaf of the on-device metric sums into the timed carry:
    # a chain that drops them lets XLA dead-code-eliminate the RMSE/MAE/
    # REL/delta reductions the real train and eval loops pay every step,
    # silently inflating the recorded number — the same DCE failure mode
    # that once deleted the hand adjoint from a microbenchmark
    # (docs/ARCHITECTURE.md "kernel design"). 1e-12 keeps the consumed
    # value numerically irrelevant without being a zero XLA could fold.
    def consume_sums(sums):
        return sum(jnp.sum(x) for x in jax.tree.leaves(sums)) * 1e-12

    # --- train chain: serial full train steps (fwd+bwd+update+metrics)
    def make_train_chain(length):
        @jax.jit
        def train_chain(state, b, r):
            def body(st, i):
                st, loss, sums = trainer.train_step_fn(
                    st, b, jax.random.fold_in(r, i))
                return st, loss + consume_sums(sums)
            st, losses = jax.lax.scan(body, state, jnp.arange(length))
            return st, losses[-1]
        return train_chain

    def timed(fn, *args, reps=2):
        out = fn(*args)                 # warm (compile) + sync
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            # scalar readback closes the clock
            _ = float(jnp.sum(jax.tree.leaves(out)[-1].ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best, out

    def marginal(short_fn, long_fn, *args):
        """Per-step seconds + (t_short, short output). A non-positive
        chain difference means the run-varying dispatch latency swamped
        the signal: retry with more repetitions, then raise — clamping
        would print an absurdly inflated images/s with no error."""
        reps, t_short, t_long = 2, 0.0, 0.0
        for _attempt in range(3):
            t_short, out_short = timed(short_fn, *args, reps=reps)
            t_long, _ = timed(long_fn, *args, reps=reps)
            if t_long > t_short:
                return (t_long - t_short) / (4 * n_chain), t_short, out_short
            reps += 2
        raise RuntimeError(
            f"marginal timing failed: t_5n={t_long:.4f}s <= "
            f"t_n={t_short:.4f}s after 3 attempts; increase BENCH_ITERS")

    short_chain = make_train_chain(n_chain)
    long_chain = make_train_chain(5 * n_chain)
    t_train, t_short, (state2, loss) = marginal(
        short_chain, long_chain, state, dev_batch, rng)
    assert bool(jnp.isfinite(loss)), float(loss)
    dispatch_ms = max(t_short - n_chain * t_train, 0.0) * 1e3
    train_ips = batch / t_train

    # --- inference chain: serial eval forwards with refined CSPN
    eval_batch = {**dev_batch,
                  "valid_image": jax.device_put(
                      np.ones(batch, "float32"), trainer._bsh1d)}

    def make_infer_chain(length):
        @jax.jit
        def infer_chain(state, b, r):
            def body(acc, i):
                sums, pred = trainer.eval_step_fn(state, b, r, i)
                # serial dependence: fold the previous output into the
                # acc; consume the full metric sums (see consume_sums).
                return acc + jnp.mean(pred) * 1e-9 + consume_sums(sums), ()
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(length))
            return acc
        return infer_chain

    t_infer, _, _ = marginal(make_infer_chain(n_chain),
                             make_infer_chain(5 * n_chain),
                             state2, eval_batch, rng)
    infer_ips = batch / t_infer

    combined = 1.0 / (1.0 / train_ips + 1.0 / infer_ips)

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if "nyu" not in config_name:
        base_path = ""                  # baseline was measured at NYU shape
    if base_path and os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("combined_ips"):
            vs_baseline = combined / base["combined_ips"]

    label = ("NYU 304x228" if "nyu" in config_name else
             f"{config_name} {cfg.data.width}x{cfg.data.height}")
    print(json.dumps({
        "metric": (f"train+infer images/s/chip, {label} rgbd, "
                   "ResNet50-UNet + 24-iter CSPN"),
        "value": round(combined, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "train_images_per_sec": round(train_ips, 2),
        "infer_images_per_sec": round(infer_ips, 2),
        "batch": batch,
        "chain_len": n_chain,
        "dispatch_overhead_ms": round(dispatch_ms, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "parity": parity,
    }))


if __name__ == "__main__":
    main()
