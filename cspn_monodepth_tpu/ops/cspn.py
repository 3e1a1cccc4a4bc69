"""CSPN propagation dispatcher.

`cspn_propagate` is the public op used by models. It dispatches between:

* the fused multi-iteration Pallas TPU kernel (`cspn_pallas.py`) — the hot
  path mandated by BASELINE.json (state resident in VMEM across iterations);
* the pure-jnp `lax.scan` reference (`cspn_ref.py`) — used on CPU, in tests,
  and as the autodiff rule for the kernel's custom VJP.

Both are numerically equivalent (see tests/test_cspn_pallas.py).
"""

from __future__ import annotations

import jax

from cspn_monodepth_tpu.ops.cspn_ref import cspn_propagate_ref


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# The fused kernel keeps ~13 (H, W) f32 planes resident in VMEM (8 raw
# gates in the input window, 8 normalized + center + depth pad + sparse +
# mask as values). Above this budget (e.g. KITTI 1216x352) route to the
# H-tiled multi-launch kernel (cspn_propagate_pallas_tiled), which fuses
# halo_k iterations per launch on (tile_h + 2k)-row slabs; the
# spatially-sharded path (parallel/halo.py) shrinks per-device planes
# back under the whole-plane budget.
_VMEM_PLANE_BUDGET_BYTES = 10 * 1024 * 1024


def _fits_vmem(h: int, w: int) -> bool:
    return 13 * 4 * h * w <= _VMEM_PLANE_BUDGET_BYTES


def cspn_propagate(
    guidance: jax.Array,
    blur_depth: jax.Array,
    sparse_depth: jax.Array | None = None,
    *,
    num_iters: int = 24,
    norm_type: str = "8sum",
    impl: str = "auto",
    guidance_layout: str = "NHWC",
) -> jax.Array:
    """Refine blur_depth by CSPN propagation. See cspn_propagate_ref.

    impl: "auto" (on TPU: whole-plane pallas kernel when the image fits the
    VMEM budget, H-tiled pallas kernel otherwise; jnp on other backends),
    "pallas", "pallas_tiled", or "jnp".

    guidance_layout: "NHWC" (B, H, W, 8) or "NCHW" (B, 8, H, W) —
    plane-major guidance skips the kernel's entry transpose (the packed
    head emits it with one rearrange; models/cspn_net.py).
    """
    if impl == "auto":
        if guidance_layout == "NCHW":
            h, w = guidance.shape[2:4]
        else:
            h, w = guidance.shape[1:3]
        if _on_tpu():
            impl = "pallas" if _fits_vmem(h, w) else "pallas_tiled"
        else:
            impl = "jnp"
    if impl == "pallas":
        from cspn_monodepth_tpu.ops.cspn_pallas import cspn_propagate_pallas

        return cspn_propagate_pallas(
            guidance, blur_depth, sparse_depth,
            num_iters=num_iters, norm_type=norm_type,
            guidance_layout=guidance_layout,
        )
    if impl == "pallas_tiled":
        from cspn_monodepth_tpu.ops.cspn_pallas import (
            cspn_propagate_pallas_tiled,
        )

        return cspn_propagate_pallas_tiled(
            guidance, blur_depth, sparse_depth,
            num_iters=num_iters, norm_type=norm_type,
            guidance_layout=guidance_layout,
        )
    if impl == "jnp":
        import jax.numpy as jnp

        if guidance_layout == "NCHW":
            guidance = jnp.moveaxis(guidance, 1, -1)
        return cspn_propagate_ref(
            guidance, blur_depth, sparse_depth,
            num_iters=num_iters, norm_type=norm_type,
        )
    raise ValueError(f"unknown impl: {impl!r}")
