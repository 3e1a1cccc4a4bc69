"""Account for the train-step time OUTSIDE encoder/decoder/CSPN.

tools/profile_components.py covers the three compute blocks; at round 3
they sum to ~80 ms of a 137 ms train step (batch 32, NYU). This times the
remaining pieces with the same marginal-chain methodology:

  sampler   - uniform_sparse_sample (PRNG scores + top_k over H*W)
  heads     - the packed f32 head conv + interleave
  loss      - masked MSE
  metrics   - MetricSums.from_batch accumulation
  clip_opt  - global-norm clip + SGD-momentum update on the param tree

Usage: python tools/profile_step_parts.py [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_components import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cspn_monodepth_tpu.ops.sparse import uniform_sparse_sample

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    b, h, w = args.batch, 228, 304
    res = {"batch": b, "hw": f"{h}x{w}"}

    key = jax.random.key(0)
    depth = jax.random.uniform(key, (b, h, w), jnp.float32, 0.1, 10.0)

    # --- sampler
    def samp(carry, _):
        d, k = carry
        k, sub = jax.random.split(k)
        sp = uniform_sparse_sample(sub, d, num_samples=500)
        return (d + sp * 1e-9, k), None

    t = chain_time(lambda c, p: samp(c, p)[0], (depth, key), args.iters)
    res["sampler_ms"] = round(t * 1e3, 3)
    print(json.dumps(res), flush=True)

    # --- loss + metric sums
    from cspn_monodepth_tpu.train.loss import masked_mse_loss
    from cspn_monodepth_tpu.train.metrics import metric_sums_from_batch

    pred = depth * 1.01

    def lm(carry, _):
        p = carry
        loss = masked_mse_loss(p, depth)
        sums = metric_sums_from_batch(p, depth)
        return p + (loss + sums.n_images) * 1e-12, None

    t = chain_time(lambda c, p: lm(c, p)[0], pred, args.iters)
    res["loss_metrics_ms"] = round(t * 1e3, 3)
    print(json.dumps(res), flush=True)

    # --- clip + SGD-momentum update at model scale
    from cspn_monodepth_tpu.configs import get_config
    from cspn_monodepth_tpu.train.loop import Trainer

    cfg = get_config("nyu_completion_500").override(**{
        "data.dataset": "synthetic", "train.batch_size": b,
        "mesh.data": 1, "mesh.spatial": 1})
    trainer = Trainer(cfg, workdir="/tmp/profile_parts")
    state = trainer.init_state()
    params = state.params

    import optax

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.sgd(1e-2, momentum=0.9))
    opt_state = tx.init(params)

    def upd(carry, pp):
        p, os_ = carry
        grads = jax.tree.map(lambda a: a * 1e-8, p)   # stand-in gradients
        updates, os_ = tx.update(grads, os_, p)
        return (optax.apply_updates(p, updates), os_), None

    t = chain_time(lambda c, pp: upd(c, pp)[0], (params, opt_state),
                   args.iters)
    res["clip_opt_ms"] = round(t * 1e3, 3)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
