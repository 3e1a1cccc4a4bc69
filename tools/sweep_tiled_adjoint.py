"""Sweep the tiled-adjoint (k, VMEM budget) surface at the KITTI shape.

Round-4 chose k=8 over k=12 from a single pair of runs, and
pick_tile_h_bwd's 12 MiB budget is deliberately conservative — this tool
measures the stash-fwd + full-backward pair (all three gradients
consumed, same honest methodology as tools/bench_cspn_vjp.py) across the
(CSPN_TILED_BWD_K, CSPN_TILED_BWD_BUDGET_MB) grid so the choice is a
recorded surface, not a point sample (round-4 verdict item 4).

Usage (TPU, solo client, background — each combo recompiles the pair):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu \
        python tools/sweep_tiled_adjoint.py [k:budget ...]
Default grid: 8:12 8:16 8:20 12:12 12:16 4:12
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Default grid chosen by tile arithmetic at H=352, W=1216 (pick_tile_h_bwd):
#   (8, 12) -> tile 64 (the shipped r4 point, 6 tiles, pad 384)
#   (8, 16) -> tile 88 (EXACT 4 tiles of 352, zero pad rows)
#   (8, 30) -> tile 176 (exact 2 tiles; may OOM the 32 MiB scoped cap —
#              an error here is a data point)
#   (12, 16) / (12, 12) / (4, 12) -> halo sensitivity around the winner
COMBOS = [tuple(int(v) for v in a.split(":")) for a in sys.argv[1:]] or [
    (8, 12), (8, 16), (8, 30), (12, 12), (12, 16), (4, 12)]

b, h, w, T = 8, 352, 1216, 24
rng = np.random.default_rng(0)
guid = jnp.asarray(rng.normal(size=(b, h, w, 8)).astype(np.float32))
blur = jnp.asarray(rng.uniform(0.5, 9.5, (b, h, w)).astype(np.float32))
sp = jnp.asarray(blur * (rng.random((b, h, w)) < 0.01))
cot = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))

results = []
for k, budget in COMBOS:
    os.environ["CSPN_TILED_BWD_K"] = str(k)
    os.environ["CSPN_TILED_BWD_BUDGET_MB"] = str(budget)
    # Fresh import state not needed: the env is read at trace time and
    # marginal_chain builds new jits per call, forcing a retrace.
    from cspn_monodepth_tpu.ops.cspn_pallas import (
        cspn_propagate_pallas_tiled,
        pick_tile_h_bwd,
    )
    from cspn_monodepth_tpu.utils.profiling import marginal_chain

    def loss(g, d, s):
        return jnp.vdot(cspn_propagate_pallas_tiled(
            g, d, s, num_iters=T, norm_type="8sum_clamp"), cot)

    def step(carry, _):
        g, d, s = carry
        dg, dd, ds = jax.grad(loss, (0, 1, 2))(g, d, s)
        # consume EVERY gradient so none of the adjoint can be DCE'd
        return (g + dg * 1e-12, d + dd * 1e-12, s + ds * 1e-12)

    tile_h = pick_tile_h_bwd(h, w, k)
    try:
        t, _ = marginal_chain(step, (guid, blur, sp), None, n=10)
        row = {"k": k, "budget_mb": budget, "tile_h": tile_h,
               "fwd_plus_full_bwd_ms": round(t * 1e3, 3)}
    except Exception as e:  # OOM at aggressive budgets is a data point
        row = {"k": k, "budget_mb": budget, "tile_h": tile_h,
               "error": str(e)[:200]}
    results.append(row)
    print(json.dumps(row), flush=True)

ok = [r for r in results if "fwd_plus_full_bwd_ms" in r]
if ok:
    best = min(ok, key=lambda r: r["fwd_plus_full_bwd_ms"])
    print(json.dumps({"best": best, "shape": f"{b}x{h}x{w}", "iters": T}))
