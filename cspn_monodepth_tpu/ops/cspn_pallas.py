"""Fused multi-iteration CSPN Pallas TPU kernel.

BASELINE.json core requirement (SURVEY.md N5): one kernel performs affinity
normalization + T iterations of the 8-neighbor stencil + per-iteration
sparse anchor replacement, with the depth plane and all 9 gate planes
resident in VMEM across iterations.

Why this is speed-of-light: the op is memory-bound (~10 f32 planes
touched). The fused kernel's HBM traffic is ONE read of guidance (8
planes) + blur + sparse and ONE write of the result — independent of T —
versus ~10 planes read + 1 written *per iteration* for a naive
implementation (XLA fuses each scan body but must round-trip the carried
depth plane and re-read the 8 gate planes every iteration).

Grid: one program per batch element; the whole (H, W) image lives in VMEM
(fine for NYU 228x304: ~3 MB of planes; for KITTI-sized images use the
spatially-sharded path in parallel/halo.py, which shrinks the per-device
working set below VMEM limits and can call this kernel per shard).

The backward pass uses a custom VJP whose rule is the VJP of the jnp
`lax.scan` reference (rematerialized forward) — numerically identical
(tests/test_cspn_pallas.py) while XLA handles the adjoint stencil.

Layout note: the kernel wants gate planes as (8, H, W) so each plane is a
natively-tileable (sublane=H, lane=W) 2D array; the public channels-last
guidance is transposed on entry (one cheap copy vs T iterations of wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cspn_monodepth_tpu.ops.cspn_ref import NEIGHBOR_OFFSETS, cspn_propagate_ref


def _cspn_kernel(guid_ref, blur_ref, sparse_ref, out_ref, dpad_ref, *,
                 num_iters: int, norm_type: str, has_sparse: bool,
                 eps: float = 1e-8):
    """One batch element: guid (8, H, W), blur/sparse/out (H, W).

    dpad_ref: (H+2, W+2) VMEM scratch holding the zero-padded depth plane
    carried across iterations.
    """
    h, w = blur_ref.shape

    g = guid_ref[...]                       # (8, H, W)
    if norm_type == "8sum_abs":
        g = jnp.abs(g)
    abs_sum = jnp.sum(jnp.abs(g), axis=0)   # (H, W)
    floor = 1.0 if norm_type == "8sum_clamp" else eps
    inv = 1.0 / jnp.maximum(abs_sum, floor)
    gates = g * inv[None]                   # (8, H, W), signed
    gate_center = 1.0 - jnp.sum(gates, axis=0)

    d0 = blur_ref[...]
    if has_sparse:
        sp = sparse_ref[...]
        m = (sp > 0).astype(d0.dtype)
        d0 = (1.0 - m) * d0 + m * sp        # anchor d^0 (matches jnp ref)

    dpad_ref[...] = jnp.zeros((h + 2, w + 2), d0.dtype)
    dpad_ref[1:h + 1, 1:w + 1] = d0

    def body(_, carry):
        # Group the 9 taps by lane shift (dx): one lane-offset slice per
        # column of the 3x3 stencil, then cheap sublane-offset slices for
        # the rows — 3 lane shifts/iteration instead of 9.
        dl = dpad_ref[:, 0:w]          # d[., j-1]
        dc = dpad_ref[:, 1:w + 1]      # d[., j]
        dr = dpad_ref[:, 2:w + 2]      # d[., j+1]
        # NEIGHBOR_OFFSETS order: (-1,-1)(-1,0)(-1,1)(0,-1)(0,1)(1,-1)(1,0)(1,1)
        new = gate_center * dc[1:h + 1]
        new += gates[0] * dl[0:h] + gates[3] * dl[1:h + 1] + gates[5] * dl[2:h + 2]
        new += gates[1] * dc[0:h] + gates[6] * dc[2:h + 2]
        new += gates[2] * dr[0:h] + gates[4] * dr[1:h + 1] + gates[7] * dr[2:h + 2]
        if has_sparse:
            new = (1.0 - m) * new + m * sp
        dpad_ref[1:h + 1, 1:w + 1] = new
        return carry

    lax.fori_loop(0, num_iters, body, 0, unroll=False)
    out_ref[...] = dpad_ref[1:h + 1, 1:w + 1]


def _cspn_pallas_fwd_impl(guidance, blur, sparse, num_iters: int,
                          norm_type: str, has_sparse: bool, interpret: bool):
    """guidance: (B, H, W, 8); blur/sparse: (B, H, W) -> (B, H, W)."""
    b, h, w, _ = guidance.shape
    guid_t = jnp.moveaxis(guidance, -1, 1)  # (B, 8, H, W)

    kernel = functools.partial(
        _cspn_kernel, num_iters=num_iters, norm_type=norm_type,
        has_sparse=has_sparse)

    flops = (b * h * w * num_iters) * 19    # 9 mul + 9 add + anchor lerp
    bytes_accessed = 4 * b * h * w * 11     # 8 gates + blur + sparse + out

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(guid_t.astype(jnp.float32), blur.astype(jnp.float32),
      sparse.astype(jnp.float32))


# Squeeze the per-element block dim inside the kernel: BlockSpec (1, ...)
# yields refs with a leading 1; wrap to drop it for readability.
def _squeeze_kernel(fn):
    @functools.wraps(fn)
    def wrapped(guid_ref, blur_ref, sparse_ref, out_ref, dpad_ref, **kw):
        return fn(guid_ref.at[0], blur_ref.at[0], sparse_ref.at[0],
                  out_ref.at[0], dpad_ref, **kw)
    return wrapped


_cspn_kernel = _squeeze_kernel(_cspn_kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _cspn_pallas(guidance, blur, sparse, num_iters, norm_type, has_sparse,
                 interpret):
    return _cspn_pallas_fwd_impl(
        guidance, blur, sparse, num_iters, norm_type, has_sparse, interpret)


def _fwd(guidance, blur, sparse, num_iters, norm_type, has_sparse, interpret):
    out = _cspn_pallas(guidance, blur, sparse, num_iters, norm_type,
                       has_sparse, interpret)
    return out, (guidance, blur, sparse)


def _bwd(num_iters, norm_type, has_sparse, interpret, residuals, g_out):
    guidance, blur, sparse = residuals

    def ref(gd, bl, sp):
        return cspn_propagate_ref(
            gd, bl, sp if has_sparse else None,
            num_iters=num_iters, norm_type=norm_type)

    _, vjp = jax.vjp(ref, guidance, blur, sparse)
    d_guid, d_blur, d_sparse = vjp(g_out)
    if not has_sparse:
        d_sparse = jnp.zeros_like(sparse)
    return d_guid, d_blur, d_sparse


_cspn_pallas.defvjp(_fwd, _bwd)


def cspn_propagate_pallas(
    guidance: jax.Array,
    blur_depth: jax.Array,
    sparse_depth: jax.Array | None = None,
    *,
    num_iters: int = 24,
    norm_type: str = "8sum",
    interpret: bool | None = None,
) -> jax.Array:
    """Public fused-kernel entry; same contract as cspn_propagate_ref."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = blur_depth.ndim == 4
    d0 = blur_depth[..., 0] if squeeze else blur_depth
    has_sparse = sparse_depth is not None
    if has_sparse:
        sp = sparse_depth[..., 0] if sparse_depth.ndim == 4 else sparse_depth
    else:
        sp = jnp.zeros_like(d0)

    out = _cspn_pallas(guidance, d0, sp, num_iters, norm_type, has_sparse,
                       interpret)
    out = out.astype(d0.dtype)
    return out[..., None] if squeeze else out
