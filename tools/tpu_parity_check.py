"""TPU-compiled pallas-vs-jnp parity check (forward + gradients).

Run after any CSPN op change (verify skill): the CPU test suite runs the
kernel in interpret mode only; this compiles it on the real chip.

Measurement note: with UNTRAINED random N(0,1) guidance the signed-gate
propagation is expansive (row abs sums ~2), so 24 iterations amplify
values to ~1e9 and f32 ordering differences to ~1e3 ABSOLUTE — that is
the dynamics, not a kernel bug (the real model's zero-init heads start at
the identity map; docs/ARCHITECTURE.md "stability"). Parity must
therefore be judged RELATIVE to the output magnitude; `8sum_abs`
(non-expansive by construction, row sums exactly 1) doubles as the
absolute-scale control.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cspn_monodepth_tpu.ops.cspn_ref import cspn_propagate_ref
from cspn_monodepth_tpu.ops.cspn_pallas import cspn_propagate_pallas

assert jax.default_backend() != "cpu", jax.default_backend()
rng = np.random.default_rng(0)
b, h, w, T = 4, 228, 304, 24
results = {}
for norm in ("8sum_clamp", "8sum", "8sum_abs"):
    guid = jnp.asarray(rng.normal(size=(b, h, w, 8)).astype(np.float32))
    blur = jnp.asarray(rng.uniform(0.5, 9.5, (b, h, w)).astype(np.float32))
    sp = jnp.asarray(blur * (rng.random((b, h, w)) < 0.01))
    cot = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))

    def fp(g, d, s, norm=norm):
        return cspn_propagate_pallas(g, d, s, num_iters=T, norm_type=norm)

    def fr(g, d, s, norm=norm):
        return cspn_propagate_ref(g, d, s, num_iters=T, norm_type=norm)

    out_p = np.asarray(jax.jit(fp)(guid, blur, sp))
    out_r = np.asarray(jax.jit(fr)(guid, blur, sp))
    fwd_rel = float(np.abs(out_p - out_r).max()
                    / max(1.0, np.abs(out_r).max()))
    assert fwd_rel < 2e-5, (norm, fwd_rel)

    gp = jax.jit(jax.grad(
        lambda g, d, s: jnp.vdot(fp(g, d, s), cot), (0, 1, 2)))(
        guid, blur, sp)
    gr = jax.jit(jax.grad(
        lambda g, d, s: jnp.vdot(fr(g, d, s), cot), (0, 1, 2)))(
        guid, blur, sp)
    grad_rel = max(
        float(jnp.abs(x - y).max()) / max(1.0, float(jnp.abs(y).max()))
        for x, y in zip(gp, gr))
    assert grad_rel < 2e-4, (norm, grad_rel)
    results[norm] = {"fwd_maxrel": fwd_rel, "grad_maxrel": grad_rel,
                     "out_mag": float(np.abs(out_r).max())}

print(json.dumps(results, indent=1))
print("TPU parity OK")
