"""Guard the adjoint's empirically-tuned VMEM budgets (VERDICT r3 weak #5).

The whole-plane adjoint's 26 MB/44-plane budget (`_bwd_fits_vmem`) and
the 32 MiB `vmem_limit_bytes` encode measured Mosaic stack overheads; a
jax/Mosaic upgrade could shift them and silently OOM the default path or
silently de-route the headline shape to the slow fallback. This check
makes both regressions loud:

  1. routing: the headline NYU shape must take the Pallas adjoint (stash
     residual present) and a just-over-budget shape must route to the
     scan-VJP fallback (stash None) — checked at the custom-VJP fwd rule.
  2. execution on this backend: grad at the headline shape (adjoint
     kernel compiles + runs, finite), grad at the just-over-budget shape
     (fallback compiles + runs, finite, matches reference), and grad
     through the TILED adjoint at a KITTI-class shape.

Run on TPU (the verify skill / before recording bench numbers):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu python tools/vmem_guard_check.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cspn_monodepth_tpu.ops.cspn_pallas as cp
from cspn_monodepth_tpu.ops.cspn_ref import cspn_propagate_ref

assert jax.default_backend() != "cpu", jax.default_backend()
assert cp.use_pallas_adjoint(), "set CSPN_PALLAS_ADJOINT=1 for this check"

results = {}

# --- 1. routing decisions (pure Python, no compile) ---------------------
# Shared with the bench gate: bench.py runs vmem_routing_check before
# every timed run, so a budget regression fails the bench, not a future
# debugging session.
from cspn_monodepth_tpu.ops.parity import (  # noqa: E402
    prenorm_parity_check,
    vmem_routing_check,
)

OVER_H, OVER_W = 320, 512            # 164k px: fwd fits (10MB/13-plane
                                     # budget ~201k px), bwd does not
                                     # (26MB/44-plane budget ~155k px)
results["routing"] = vmem_routing_check()


def _grad_check(h, w, op, label, tol=5e-4):
    rng = np.random.default_rng(1)
    guid = jnp.asarray(rng.normal(size=(1, h, w, 8)).astype(np.float32))
    blur = jnp.asarray(rng.uniform(0.5, 9.5, (1, h, w)).astype(np.float32))
    sp = jnp.asarray(blur * (rng.random((1, h, w)) < 0.01))
    cot = jnp.asarray(rng.normal(size=(1, h, w)).astype(np.float32))

    def f(g, d, s):
        return jnp.vdot(op(g, d, s, num_iters=24, norm_type="8sum_clamp"),
                        cot)

    def fr(g, d, s):
        return jnp.vdot(cspn_propagate_ref(
            g, d, s, num_iters=24, norm_type="8sum_clamp"), cot)

    gp = jax.jit(jax.grad(f, (0, 1, 2)))(guid, blur, sp)
    gr = jax.jit(jax.grad(fr, (0, 1, 2)))(guid, blur, sp)
    rel = max(float(jnp.abs(x - y).max()) / max(1.0, float(jnp.abs(y).max()))
              for x, y in zip(gp, gr))
    assert all(bool(jnp.isfinite(x).all()) for x in gp), label
    assert rel < tol, (label, rel)
    results[label] = {"grad_maxrel": rel}


# --- 2. both paths compile and run on this backend ----------------------
# headline: the stash-fwd + adjoint kernel pair (VMEM-cap regression
# would OOM here, loudly).
_grad_check(228, 304, cp.cspn_propagate_pallas, "headline_adjoint")
# just-over-budget: the scan-VJP fallback must engage without error.
out, res = cp._fwd(
    jnp.zeros((1, OVER_H, OVER_W, 8)), jnp.ones((1, OVER_H, OVER_W)),
    jnp.zeros((1, OVER_H, OVER_W)), 24, "8sum_clamp", True, False)
assert res[3] is None, "over-budget shape must carry no stash residual"
_grad_check(OVER_H, OVER_W, cp.cspn_propagate_pallas, "over_budget_fallback")
# KITTI-class: the tiled adjoint (its own VMEM sizing via pick_tile_h_bwd).
_grad_check(352, 1216, cp.cspn_propagate_pallas_tiled, "kitti_tiled_adjoint")
# Prenorm slab kernel + prenorm adjoint at the KITTI 4-shard slab shape
# (the multi-chip per-shard hot path; its own 26 MiB-class budget at
# _prenorm_bwd_fits_vmem).
results["kitti_slab_prenorm"] = prenorm_parity_check(batch=2, h=104, w=1216)

print(json.dumps(results, indent=1))
print("VMEM guard OK")
