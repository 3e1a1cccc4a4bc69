"""Compiled pallas-vs-jnp CSPN parity check (forward + gradients).

The CPU test suite exercises the kernels in interpret mode only; this
module compiles them on the actual backend and asserts parity, so a
Mosaic/lowering regression can never silently ship wrong numbers: the
bench entry (bench.py) runs it before timing and embeds the result in
the recorded JSON (SURVEY.md §5.2-3 per-backend parity).

Measurement note: with untrained random N(0,1) guidance the signed-gate
propagation is expansive (row abs sums ~2), so T=24 iterations amplify
values to ~1e9 and f32 ordering differences to ~1e3 ABSOLUTE — that is
the dynamics, not a kernel bug (the real model's zero-init heads start
at the identity map; docs/ARCHITECTURE.md "stability"). Parity is
therefore judged RELATIVE to the output magnitude; `8sum_abs`
(non-expansive by construction, row sums exactly 1) doubles as the
absolute-scale control.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cspn_monodepth_tpu.ops.cspn_ref import cspn_propagate_ref

FWD_TOL = 2e-5
GRAD_TOL = 2e-4


def cspn_parity_check(
    norms: tuple[str, ...] = ("8sum_clamp", "8sum", "8sum_abs"),
    batch: int = 4,
    h: int = 228,
    w: int = 304,
    num_iters: int = 24,
    op=None,
) -> dict:
    """Compile fwd + grad of the pallas op and the jnp reference on the
    current default backend; assert relative parity. Returns the per-norm
    error dict (raises AssertionError on violation).

    op: the pallas entry to check (default: whole-plane
    cspn_propagate_pallas; pass cspn_propagate_pallas_tiled to cover the
    tiled kernel + tiled adjoint).
    """
    if op is None:
        from cspn_monodepth_tpu.ops.cspn_pallas import cspn_propagate_pallas
        op = cspn_propagate_pallas

    rng = np.random.default_rng(0)
    results = {}
    for norm in norms:
        guid = jnp.asarray(rng.normal(size=(batch, h, w, 8)).astype(np.float32))
        blur = jnp.asarray(
            rng.uniform(0.5, 9.5, (batch, h, w)).astype(np.float32))
        sp = jnp.asarray(blur * (rng.random((batch, h, w)) < 0.01))
        cot = jnp.asarray(rng.normal(size=(batch, h, w)).astype(np.float32))

        def fp(g, d, s, norm=norm):
            return op(g, d, s, num_iters=num_iters, norm_type=norm)

        def fr(g, d, s, norm=norm):
            return cspn_propagate_ref(
                g, d, s, num_iters=num_iters, norm_type=norm)

        out_p = np.asarray(jax.jit(fp)(guid, blur, sp))
        out_r = np.asarray(jax.jit(fr)(guid, blur, sp))
        fwd_rel = float(np.abs(out_p - out_r).max()
                        / max(1.0, np.abs(out_r).max()))
        assert fwd_rel < FWD_TOL, (norm, fwd_rel)

        gp = jax.jit(jax.grad(
            lambda g, d, s: jnp.vdot(fp(g, d, s), cot), (0, 1, 2)))(
            guid, blur, sp)
        gr = jax.jit(jax.grad(
            lambda g, d, s: jnp.vdot(fr(g, d, s), cot), (0, 1, 2)))(
            guid, blur, sp)
        grad_rel = max(
            float(jnp.abs(x - y).max()) / max(1.0, float(jnp.abs(y).max()))
            for x, y in zip(gp, gr))
        assert grad_rel < GRAD_TOL, (norm, grad_rel)
        results[norm] = {"fwd_maxrel": fwd_rel, "grad_maxrel": grad_rel,
                         "out_mag": float(np.abs(out_r).max())}
    return results
