"""HONEST CSPN backward benchmark: Pallas adjoint vs jnp-scan VJP.

The round-3 lesson (see use_pallas_adjoint): a chain whose body consumes
only the depth gradient lets XLA dead-code-eliminate the scan VJP's
8-plane guidance-gradient accumulation, biasing the comparison against
the opaque Pallas kernel. Here ALL THREE gradients feed back into the
chain carry, so both paths compute the full adjoint.

Usage: CSPN_PALLAS_ADJOINT=1 python tools/bench_cspn_vjp.py   (adjoint)
       CSPN_PALLAS_ADJOINT=0 python tools/bench_cspn_vjp.py   (scan VJP)
       BENCH_SHAPE=kitti ... python tools/bench_cspn_vjp.py
           (batch 8 x 352x1216 through the H-TILED kernel + tiled adjoint)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cspn_monodepth_tpu.ops.cspn_pallas import (
    cspn_propagate_pallas,
    cspn_propagate_pallas_tiled,
    use_pallas_adjoint,
)
from cspn_monodepth_tpu.utils.profiling import marginal_chain

kitti = os.environ.get("BENCH_SHAPE", "nyu") == "kitti"
b, h, w, T = (8, 352, 1216, 24) if kitti else (32, 228, 304, 24)
op = cspn_propagate_pallas_tiled if kitti else cspn_propagate_pallas
rng = np.random.default_rng(0)
guid = jnp.asarray(rng.normal(size=(b, h, w, 8)).astype(np.float32))
blur = jnp.asarray(rng.uniform(0.5, 9.5, (b, h, w)).astype(np.float32))
sp = jnp.asarray(blur * (rng.random((b, h, w)) < 0.01))
cot = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))


def loss(g, d, s):
    return jnp.vdot(op(g, d, s, num_iters=T, norm_type="8sum_clamp"), cot)


def step(carry, _):
    g, d, s = carry
    dg, dd, ds = jax.grad(loss, (0, 1, 2))(g, d, s)
    # consume EVERY gradient so none of the adjoint can be DCE'd
    return (g + dg * 1e-12, d + dd * 1e-12, s + ds * 1e-12)


t, _ = marginal_chain(step, (guid, blur, sp), None, n=10)
print(json.dumps({
    "adjoint": use_pallas_adjoint(),
    "fwd_plus_full_bwd_ms": round(t * 1e3, 3),
    "shape": f"{b}x{h}x{w}", "iters": T,
    "op": "tiled" if kitti else "whole-plane",
}))
