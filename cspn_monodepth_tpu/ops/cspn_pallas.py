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

The backward pass is a hand-written Pallas adjoint (stash forward +
gather-formulation adjoint-stencil kernel, default ON — see
use_pallas_adjoint for the measurement history): whole-plane for shapes
within the VMEM budget, H-tiled (same recompute-in-halo amortization as
the tiled forward) beyond it. CSPN_PALLAS_ADJOINT=0 opts out to the VJP
of the jnp `lax.scan` reference. All paths are numerically identical to
jax.vjp of the reference (tests/test_cspn_pallas.py).

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

from cspn_monodepth_tpu.ops.cspn_ref import (
    NEIGHBOR_OFFSETS,
    cspn_propagate_prenorm_ref,
    cspn_propagate_ref,
)


def _normalize_gates(g, norm_type: str, eps: float = 1e-8):
    """Raw affinities (8, H, W) -> (gates (8, H, W), gate_center (H, W))."""
    if norm_type == "8sum_abs":
        g = jnp.abs(g)
    abs_sum = jnp.sum(jnp.abs(g), axis=0)   # (H, W)
    floor = 1.0 if norm_type == "8sum_clamp" else eps
    inv = 1.0 / jnp.maximum(abs_sum, floor)
    gates = g * inv[None]                   # (8, H, W), signed
    gate_center = 1.0 - jnp.sum(gates, axis=0)
    return gates, gate_center


def _stencil_step(dpad_ref, gate_center, gates, sp, m, h: int, w: int,
                  has_sparse: bool):
    """One stencil iteration's new interior, read from dpad_ref ((h+2, w+2),
    zero-bordered). Taps are grouped by lane shift (dx): one lane-offset
    slice per column of the 3x3 stencil, then cheap sublane-offset slices
    for the rows — 3 lane shifts/iteration instead of 9."""
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
    return new


def _run_stencil(dpad_ref, gate_center, gates, sp, m, h: int, w: int,
                 num_iters: int, has_sparse: bool):
    """num_iters in-VMEM stencil iterations on dpad_ref ((h+2, w+2),
    zero-bordered); gates (8, h, w), gate_center (h, w), sp/m (h, w)."""

    def body(_, carry):
        dpad_ref[1:h + 1, 1:w + 1] = _stencil_step(
            dpad_ref, gate_center, gates, sp, m, h, w, has_sparse)
        return carry

    lax.fori_loop(0, num_iters, body, 0, unroll=False)


def _cspn_kernel(guid_ref, blur_ref, sparse_ref, out_ref, dpad_ref, *,
                 num_iters: int, norm_type: str, has_sparse: bool):
    """One batch element: guid (8, H, W), blur/sparse/out (H, W).

    dpad_ref: (H+2, W+2) VMEM scratch holding the zero-padded depth plane
    carried across iterations.
    """
    h, w = blur_ref.shape

    gates, gate_center = _normalize_gates(guid_ref[...], norm_type)

    d0 = blur_ref[...]
    sp = m = None
    if has_sparse:
        sp = sparse_ref[...]
        m = (sp > 0).astype(d0.dtype)
        d0 = (1.0 - m) * d0 + m * sp        # anchor d^0 (matches jnp ref)

    dpad_ref[...] = jnp.zeros((h + 2, w + 2), d0.dtype)
    dpad_ref[1:h + 1, 1:w + 1] = d0

    _run_stencil(dpad_ref, gate_center, gates, sp, m, h, w, num_iters,
                 has_sparse)
    out_ref[...] = dpad_ref[1:h + 1, 1:w + 1]


def _cspn_pallas_fwd_impl(guidance, blur, sparse, num_iters: int,
                          norm_type: str, has_sparse: bool, interpret: bool,
                          channels_first: bool = False):
    """guidance: (B, H, W, 8) — or (B, 8, H, W) when channels_first, which
    skips the entry transpose (the packed head can emit plane-major
    directly); blur/sparse: (B, H, W) -> (B, H, W)."""
    b, h, w = blur.shape
    guid_t = guidance if channels_first else jnp.moveaxis(guidance, -1, 1)

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
        # The Mosaic stack (stencil temporaries + double-buffered blocks)
        # runs ~2.3x the 13 explicit planes; under the default 16 MiB
        # scoped-vmem cap that OOMs from ~140k px up — inside the
        # dispatcher's 10 MiB/13-plane budget (caught by
        # tools/vmem_guard_check.py). 32 MiB is known-safe on v5e.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
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


# --------------------------------------------------------------------------
# Hand-written adjoint (training hot path).
#
# The VJP used to re-run the jnp lax.scan under autodiff (~3x the jnp
# forward: rematerialized forward + T-step backward, each re-reading ~11
# planes per iteration from HBM). Instead:
#   * the custom-VJP forward runs a stash variant of the fused kernel that
#     writes each pre-iteration depth plane d^t to an HBM stash
#     (T extra plane-writes — the only extra traffic);
#   * the backward kernel keeps the gradient accumulators and gates in
#     VMEM, streams d^t back from the stash one plane per iteration, and
#     applies the adjoint stencil (the transposed gather: products
#     gate_k * lambda scattered by the flipped offsets) plus the affinity
#     normalization chain rule, all in one launch.
# Gradients match jax.vjp of the jnp reference (tests/test_cspn_pallas.py).
#
# Mosaic requires manual-DMA slices to be lane-aligned, so this path pads
# W to a multiple of 128 (zero gates keep pad columns inert; cotangents
# are zero-padded and gradients cropped).
# --------------------------------------------------------------------------


def _cspn_kernel_stash(guid_ref, blur_ref, sparse_ref, out_ref, stash_ref,
                       dpad_ref, dcur_ref, sem, *,
                       num_iters: int, norm_type: str, has_sparse: bool):
    """Forward + stash: like _cspn_kernel, but writes d^t (the depth plane
    each iteration STARTS from) to stash_ref[b, t] in HBM.

    guid (1, 8, H, W) / blur / sparse / out (1, H, W) VMEM blocks;
    stash_ref (B, T, H, W) in ANY/HBM. dcur is the DMA staging plane.
    """
    b = pl.program_id(0)
    h, w = blur_ref.shape[1:]

    gates, gate_center = _normalize_gates(guid_ref[0], norm_type)

    d0 = blur_ref[0]
    sp = m = None
    if has_sparse:
        sp = sparse_ref[0]
        m = (sp > 0).astype(d0.dtype)
        d0 = (1.0 - m) * d0 + m * sp

    dpad_ref[...] = jnp.zeros((h + 2, w + 2), d0.dtype)
    dpad_ref[1:h + 1, 1:w + 1] = d0

    def body(t, carry):
        dcur_ref[...] = dpad_ref[1:h + 1, 1:w + 1]      # d^t
        cp = pltpu.make_async_copy(dcur_ref, stash_ref.at[b, t], sem)
        cp.start()
        dl = dpad_ref[:, 0:w]
        dc = dpad_ref[:, 1:w + 1]
        dr = dpad_ref[:, 2:w + 2]
        new = gate_center * dc[1:h + 1]
        new += gates[0] * dl[0:h] + gates[3] * dl[1:h + 1] + gates[5] * dl[2:h + 2]
        new += gates[1] * dc[0:h] + gates[6] * dc[2:h + 2]
        new += gates[2] * dr[0:h] + gates[4] * dr[1:h + 1] + gates[7] * dr[2:h + 2]
        if has_sparse:
            new = (1.0 - m) * new + m * sp
        cp.wait()                    # dcur must land before next overwrite
        dpad_ref[1:h + 1, 1:w + 1] = new
        return carry

    lax.fori_loop(0, num_iters, body, 0, unroll=False)
    out_ref[0] = dpad_ref[1:h + 1, 1:w + 1]


def _cspn_bwd_kernel(guid_hbm, sparse_ref, lam_ref, stash_ref,
                     dguid_hbm, dblur_ref, dsparse_ref,
                     dg_vmem, gpad_vmem, upad, dpad2, dcur_ref,
                     g0acc_ref, sem_g, sem_d, sem_o, *,
                     num_iters: int, norm_type: str, has_sparse: bool,
                     eps: float = 1e-8):
    """Adjoint of the propagation for one batch element.

    The 8-plane guidance input and gradient output go through HBM with
    manual single-buffered DMA (automatic block pipelining would
    double-buffer them — 32 extra planes of VMEM); guidance is staged
    through dg_vmem, which only becomes the gradient accumulator after
    the normalized gates have been extracted into gpad_vmem.

    The adjoint stencil is computed as a pure GATHER over
    iteration-invariant zero-PADDED gate planes:
        lam'(j) = g0(j)*lam_u(j) + sum_k (g_k*lam_u)(j - off_k)
    reading gpad_k and the padded lam_u plane at the flipped offsets and
    accumulating in registers — an earlier scatter formulation paid 8
    read-modify-write passes over a padded accumulator per iteration
    (plus re-zeroing it). Padded borders of upad/dpad2 are zeroed once;
    only interiors are rewritten per iteration. Streams d^t from
    stash_ref in reverse; accumulates dL/dgate_k in dg_vmem (converted
    to raw-affinity grads at the end) and dL/dgate_center in g0acc_ref.
    lam_ref holds dL/d(output).
    """
    h, w = lam_ref.shape[1:]
    b = pl.program_id(0)

    cp_g = pltpu.make_async_copy(guid_hbm.at[b], dg_vmem, sem_g)
    cp_g.start()

    # Only the complement mask om = 1 - (sp > 0) is kept live across the
    # loop; the masked term m*lam is recovered as lam - om*lam, saving one
    # (H, W) plane of scoped VMEM (the kernel sits within ~1% of the
    # scoped limit at the NYU headline shape).
    om = None
    if has_sparse:
        om = 1.0 - (sparse_ref[0] > 0).astype(jnp.float32)

    cp_g.wait()

    s = jnp.abs(dg_vmem[0])
    for k in range(1, 8):
        s += jnp.abs(dg_vmem[k])
    floor = 1.0 if norm_type == "8sum_clamp" else eps
    inv_d = 1.0 / jnp.maximum(s, floor)
    active = (s > floor).astype(jnp.float32)

    # Iteration-invariant SIGNED stored gates, zero-padded: stored_k =
    # raw_k * inv_d. The propagation gate is stored_k for the signed norms
    # and |stored_k| for 8sum_abs; sign(stored_k) == sign(raw_k) recovers
    # the normalization chain rule at the end (inv_d > 0), so the raw
    # guidance staging can be released to the gradient accumulator.
    def gate_of(stored):
        return jnp.abs(stored) if norm_type == "8sum_abs" else stored

    gpad_vmem[...] = jnp.zeros((8, h + 2, w + 2), jnp.float32)
    gsum = jnp.zeros((h, w), jnp.float32)
    for k in range(8):
        stored = dg_vmem[k] * inv_d
        gpad_vmem[k, 1:h + 1, 1:w + 1] = stored
        gsum += gate_of(stored)
    gate_center = 1.0 - gsum

    dg_vmem[...] = jnp.zeros((8, h, w), jnp.float32)
    g0acc_ref[...] = jnp.zeros((h, w), jnp.float32)
    dsparse_ref[...] = jnp.zeros((1, h, w), jnp.float32)
    upad[...] = jnp.zeros((h + 2, w + 2), jnp.float32)
    dpad2[...] = jnp.zeros((h + 2, w + 2), jnp.float32)

    def body(i, lam):
        t = num_iters - 1 - i
        cp = pltpu.make_async_copy(stash_ref.at[b, t], dcur_ref, sem_d)
        cp.start()
        if has_sparse:
            lam_u = om * lam
            dsparse_ref[0] += lam - lam_u
        else:
            lam_u = lam
        upad[1:h + 1, 1:w + 1] = lam_u
        cp.wait()
        d = dcur_ref[...]                   # d^t

        # Gate gradients: G_k += lam_u * shift_k(d), G_0 += lam_u * d.
        g0acc_ref[...] += lam_u * d
        dpad2[1:h + 1, 1:w + 1] = d

        acc = gate_center * lam_u
        for k, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            dg_vmem[k] += lam_u * dpad2[1 + dy:1 + dy + h,
                                        1 + dx:1 + dx + w]
            # Gather term (g_{k2}*lam_u)(j + (dy, dx)) for the neighbor
            # k2 with off_{k2} = (-dy, -dx); the offset set is symmetric,
            # so looping all 8 (dy, dx) covers every k2 exactly once.
            k2 = NEIGHBOR_OFFSETS.index((-dy, -dx))
            acc += (gate_of(gpad_vmem[k2, 1 + dy:1 + dy + h,
                                      1 + dx:1 + dx + w])
                    * upad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w])
        return acc

    lam0 = lax.fori_loop(0, num_iters, body, lam_ref[0], unroll=True)

    if has_sparse:
        dbl = om * lam0
        dblur_ref[0] = dbl
        dsparse_ref[0] += lam0 - dbl
    else:
        dblur_ref[0] = lam0

    # Normalization chain rule: G_hat_k = G_k - G_0;
    # c1 = sum_k G_hat_k * gate_k; grads w.r.t. raw affinities:
    #   signed:  (G_hat_l - [s > floor] * sign(g_l) * c1) / max(s, floor)
    #   abs:     sign(g_l) * (G_hat_l - [s > floor] * c1) / max(s, floor)
    g0 = g0acc_ref[...]
    c1 = jnp.zeros((h, w), jnp.float32)
    for k in range(8):
        c1 += (dg_vmem[k] - g0) * gate_of(gpad_vmem[k, 1:h + 1, 1:w + 1])
    for k in range(8):
        ghat = dg_vmem[k] - g0
        sgn = jnp.sign(gpad_vmem[k, 1:h + 1, 1:w + 1])
        if norm_type == "8sum_abs":
            dg_vmem[k] = sgn * (ghat - active * c1) * inv_d
        else:
            dg_vmem[k] = (ghat - sgn * (active * c1)) * inv_d

    cp_o = pltpu.make_async_copy(dg_vmem, dguid_hbm.at[b], sem_o)
    cp_o.start()
    cp_o.wait()


def _pad_hw(x, hp, wp):
    """Zero-pad the last two dims (H, W) to (hp, wp) — Mosaic DMA slices
    must be sublane (8) and lane (128) aligned; zero gates keep the pad
    region inert."""
    if x.shape[-1] == wp and x.shape[-2] == hp:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, hp - x.shape[-2])
    pad[-1] = (0, wp - x.shape[-1])
    return jnp.pad(x, pad)


def _cspn_pallas_stash_fwd(guidance, blur, sparse, num_iters, norm_type,
                           has_sparse, interpret, channels_first=False):
    """Run the stash forward; returns (out (B,H,W), stash (B,T,Hp,Wp))."""
    b, h, w = blur.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    guid_t = guidance if channels_first else jnp.moveaxis(guidance, -1, 1)
    guid_t = _pad_hw(guid_t, hp, wp).astype(jnp.float32)
    blur_p = _pad_hw(blur, hp, wp).astype(jnp.float32)
    sp_p = _pad_hw(sparse, hp, wp).astype(jnp.float32)

    kernel = functools.partial(
        _cspn_kernel_stash, num_iters=num_iters, norm_type=norm_type,
        has_sparse=has_sparse)
    out, stash = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, num_iters, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hp + 2, wp + 2), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * hp * wp * num_iters * 19,
            bytes_accessed=4 * b * hp * wp * (11 + num_iters),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(guid_t, blur_p, sp_p)
    return out[:, :h, :w], stash


def _cspn_pallas_bwd_impl(guidance, sparse, stash, g_out, num_iters,
                          norm_type, has_sparse, interpret,
                          channels_first=False):
    b, h, w = sparse.shape
    hp, wp = stash.shape[-2:]
    guid_t = guidance if channels_first else jnp.moveaxis(guidance, -1, 1)
    guid_t = _pad_hw(guid_t, hp, wp).astype(jnp.float32)
    sp_p = _pad_hw(sparse, hp, wp).astype(jnp.float32)
    lam_p = _pad_hw(g_out, hp, wp).astype(jnp.float32)

    kernel = functools.partial(
        _cspn_bwd_kernel, num_iters=num_iters, norm_type=norm_type,
        has_sparse=has_sparse)
    dguid, dblur, dsparse = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # guid (manual DMA)
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # stash
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # dguid (manual DMA)
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, hp, wp), jnp.float32),        # guid staging /
                                                         #   grad accumulator
            pltpu.VMEM((8, hp + 2, wp + 2), jnp.float32),  # padded gates
            pltpu.VMEM((hp + 2, wp + 2), jnp.float32),   # upad (lam_u)
            pltpu.VMEM((hp + 2, wp + 2), jnp.float32),   # dpad2 (d^t)
            pltpu.VMEM((hp, wp), jnp.float32),          # dcur
            pltpu.VMEM((hp, wp), jnp.float32),          # g0 accumulator
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * hp * wp * num_iters * 40,
            bytes_accessed=4 * b * hp * wp * (20 + num_iters),
            transcendentals=0),
        # The scratch planes + Mosaic stack temporaries exceed the 16 MiB
        # default scoped-vmem limit by ~1% at the NYU headline shape; the
        # v5e has 128 MiB of physical VMEM, so raise the cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(guid_t, sp_p, lam_p, stash)
    dguid = dguid[:, :, :h, :w]
    if not channels_first:
        dguid = jnp.moveaxis(dguid, 1, -1)
    return dguid, dblur[:, :h, :w], dsparse[:, :h, :w]


# VMEM budget for the backward kernel: ~28 explicit scratch/block planes
# (grad accumulator 8 — doubling as the guidance staging — + padded gate
# planes 8 + upad/dpad2 pads + 4 double-buffered small blocks + streaming
# planes) plus Mosaic stack temporaries (~30% on top, measured), at the
# 128-lane-padded width under the raised 32 MiB scoped-vmem cap.
_BWD_VMEM_PLANE_BUDGET_BYTES = 26 * 1024 * 1024


def _bwd_fits_vmem(h: int, w: int) -> bool:
    wp = -(-w // 128) * 128
    return 44 * 4 * h * wp <= _BWD_VMEM_PLANE_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _cspn_pallas(guidance, blur, sparse, num_iters, norm_type, has_sparse,
                 interpret, channels_first=False):
    return _cspn_pallas_fwd_impl(
        guidance, blur, sparse, num_iters, norm_type, has_sparse, interpret,
        channels_first)


def use_pallas_adjoint() -> bool:
    """Whether the custom VJP uses the hand-written Pallas adjoint.

    DEFAULT ON (opt out with CSPN_PALLAS_ADJOINT=0). History: the adjoint
    was deleted mid-round-3 after a chained microbenchmark measured it at
    8.0 ms vs 6.3 ms for XLA's scan VJP — but that comparison was
    apples-to-oranges: its chain body consumed only the depth gradient,
    so XLA dead-code-eliminated the expensive 8-plane guidance-gradient
    accumulation from the SCAN side while the opaque Pallas custom call
    always paid full cost. An op-level device trace of the real train
    step (tools/xprof_step.py) showed the full scan VJP at ~30 ms/step
    (21% of the step); the resurrected gather-formulation adjoint runs
    the same math in ~8 ms. docs/ARCHITECTURE.md "kernel design".
    """
    import os

    return os.environ.get("CSPN_PALLAS_ADJOINT", "1") != "0"


def _fwd(guidance, blur, sparse, num_iters, norm_type, has_sparse, interpret,
         channels_first=False):
    h, w = blur.shape[1:3]
    if _bwd_fits_vmem(h, w) and use_pallas_adjoint():
        out, stash = _cspn_pallas_stash_fwd(
            guidance, blur, sparse, num_iters, norm_type, has_sparse,
            interpret, channels_first)
        return out, (guidance, blur, sparse, stash)
    out = _cspn_pallas(guidance, blur, sparse, num_iters, norm_type,
                       has_sparse, interpret, channels_first)
    return out, (guidance, blur, sparse, None)


def _bwd(num_iters, norm_type, has_sparse, interpret, channels_first,
         residuals, g_out):
    guidance, blur, sparse, stash = residuals
    if stash is not None:
        d_guid, d_blur, d_sparse = _cspn_pallas_bwd_impl(
            guidance, sparse, stash, g_out, num_iters, norm_type,
            has_sparse, interpret, channels_first)
        if not has_sparse:
            d_sparse = jnp.zeros_like(sparse)
        return d_guid, d_blur, d_sparse

    # Fallback (shape exceeds the adjoint's VMEM budget, or opted out):
    # the VJP of the jnp lax.scan reference, forward rematerialized.
    def ref(gd, bl, sp):
        if channels_first:
            gd = jnp.moveaxis(gd, 1, -1)
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
    guidance_layout: str = "NHWC",
) -> jax.Array:
    """Public fused-kernel entry; same contract as cspn_propagate_ref.

    guidance_layout "NCHW" accepts plane-major (B, 8, H, W) guidance and
    skips the entry transpose — the layout the kernel wants, and the one
    the packed prediction head can emit with a single rearrange
    (models/cspn_net.py)."""
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
                       interpret, guidance_layout == "NCHW")
    out = out.astype(d0.dtype)
    return out[..., None] if squeeze else out


# --------------------------------------------------------------------------
# Tiled multi-launch path for images beyond the whole-plane VMEM budget
# (KITTI 1216x352 on a single chip). The image is tiled along H; each
# launch fuses `halo_k` iterations per tile on a (tile_h + 2k)-row slab
# (recompute-in-halo, same amortization as parallel/halo.py), and a short
# Python loop of launches covers all T iterations. HBM traffic is
# ~ceil(T/k) x 11 planes instead of the jnp scan's T x 11.
#
# Overlapping slabs cannot be expressed with BlockSpec index maps (offsets
# are block-aligned), so inputs stay in HBM (memory_space ANY) and each
# program DMAs its own halo'd slab into VMEM scratch.
# --------------------------------------------------------------------------


def _cspn_tiled_kernel(gates9_ref, d_ref, sp_ref, out_ref,
                       g_vmem, d_vmem, sp_vmem, dpad_ref,
                       sem_g, sem_d, sem_sp, *,
                       iters: int, k: int, tile_h: int, w: int,
                       has_sparse: bool):
    """Program (b, t): DMA a (tile_h + 2k)-row slab at row t*tile_h from the
    k-padded HBM inputs, run `iters` stencil iterations in VMEM, write back
    the tile interior.

    gates9_ref: (B, 9, Ht+2k, W) HBM — prenormalized [center, 8 neighbors],
    zero in all pad rows (so pad rows stay zero through iterations, matching
    the global zero-padding semantics). d_ref/sp_ref: (B, Ht+2k, W) HBM.
    out_ref: (1, tile_h, W) VMEM block. Scratches g_vmem (9, slab, W),
    d_vmem/sp_vmem (slab, W), dpad (slab+2, W+2).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    slab = tile_h + 2 * k
    row0 = t * tile_h                       # in padded coords: interior - k

    cp_g = pltpu.make_async_copy(
        gates9_ref.at[b, :, pl.ds(row0, slab), :], g_vmem, sem_g)
    cp_d = pltpu.make_async_copy(
        d_ref.at[b, pl.ds(row0, slab), :], d_vmem, sem_d)
    cp_g.start()
    cp_d.start()
    if has_sparse:
        cp_sp = pltpu.make_async_copy(
            sp_ref.at[b, pl.ds(row0, slab), :], sp_vmem, sem_sp)
        cp_sp.start()
        cp_sp.wait()
    cp_g.wait()
    cp_d.wait()

    gates9 = g_vmem[...]
    gate_center, gates = gates9[0], gates9[1:]
    sp = m = None
    if has_sparse:
        sp = sp_vmem[...]
        m = (sp > 0).astype(jnp.float32)
        # d^0 arrives pre-anchored from the host-side launch loop.

    dpad_ref[...] = jnp.zeros((slab + 2, w + 2), jnp.float32)
    dpad_ref[1:slab + 1, 1:w + 1] = d_vmem[...]
    _run_stencil(dpad_ref, gate_center, gates, sp, m, slab, w, iters,
                 has_sparse)
    out_ref[0] = dpad_ref[1 + k:1 + k + tile_h, 1:w + 1]


def _tiled_launch(gates9_pad, d, sp_pad, *, iters, k, tile_h, has_sparse,
                  interpret):
    """One round: d (B, Ht, W) -> (B, Ht, W) after `iters` iterations."""
    b, ht, w = d.shape
    n_tiles = ht // tile_h
    slab = tile_h + 2 * k
    d_pad = jnp.pad(d, ((0, 0), (k, k), (0, 0)))

    kernel = functools.partial(
        _cspn_tiled_kernel, iters=iters, k=k, tile_h=tile_h, w=w,
        has_sparse=has_sparse)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ht, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9, slab, w), jnp.float32),
            pltpu.VMEM((slab, w), jnp.float32),
            pltpu.VMEM((slab, w), jnp.float32),
            pltpu.VMEM((slab + 2, w + 2), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * ht * w * iters * 19,
            bytes_accessed=4 * b * w * (9 * n_tiles * slab + 2 * ht),
            transcendentals=0),
        interpret=interpret,
    )(gates9_pad, d_pad, sp_pad)


def _prenorm_gates9(guidance, norm_type: str, channels_first: bool = False):
    """(B, H, W, 8) raw guidance (or (B, 8, H, W) when channels_first) ->
    (B, 9, H, W) prenormalized [center, 8 neighbors] gates. Pointwise per
    pixel, XLA-fused — also the function whose jax.vjp supplies the
    normalization chain rule for the tiled adjoint."""
    g = guidance.astype(jnp.float32)
    if not channels_first:
        g = jnp.moveaxis(g, -1, 1)                         # (B, 8, H, W)
    if norm_type == "8sum_abs":
        g = jnp.abs(g)
    abs_sum = jnp.sum(jnp.abs(g), axis=1, keepdims=True)
    floor = 1.0 if norm_type == "8sum_clamp" else 1e-8
    gates = g / jnp.maximum(abs_sum, floor)
    gate_center = 1.0 - jnp.sum(gates, axis=1, keepdims=True)
    return jnp.concatenate([gate_center, gates], axis=1)


def _tiled_rounds(num_iters: int, k: int) -> list[int]:
    rounds = [k] * (num_iters // k)
    if num_iters % k:
        rounds.append(num_iters % k)
    return rounds


def _tiled_pad_inputs(guidance, blur, sparse, norm_type, has_sparse, k,
                      tile_h, channels_first=False):
    """Shared fwd/bwd preprocessing: W-pad to a lane multiple, prenormalize
    gates, row-pad gates/sparse with [k halo top] + [bottom-fill + k halo].

    Returns (gates9_pad, d0 (B,Ht,W) anchored, sp_pad, guid_wp, h, ht, wp).
    Zero gates (including the center) keep every pad row/column at exactly
    0 through all iterations — identical to the unsharded op's
    per-iteration zero pad.
    """
    b, h, w = blur.shape
    ht = -(-h // tile_h) * tile_h           # round H up to a tile multiple
    # Mosaic requires DMA slices of tiled HBM memrefs to be lane-aligned:
    # pad W to a multiple of 128.
    wp = -(-w // 128) * 128
    if wp != w:
        gpad = (((0, 0), (0, 0), (0, 0), (0, wp - w)) if channels_first
                else ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        guidance = jnp.pad(guidance, gpad)
        blur = jnp.pad(blur, ((0, 0), (0, 0), (0, wp - w)))
        sparse = jnp.pad(sparse, ((0, 0), (0, 0), (0, wp - w)))

    gates9 = _prenorm_gates9(guidance, norm_type, channels_first)
    gates9_pad = jnp.pad(gates9, ((0, 0), (0, 0), (k, ht - h + k), (0, 0)))

    d = blur.astype(jnp.float32)
    sp_pad = jnp.zeros((b, ht + 2 * k, wp), jnp.float32)
    if has_sparse:
        sp = sparse.astype(jnp.float32)
        m = (sp > 0).astype(jnp.float32)
        d = (1.0 - m) * d + m * sp          # anchor d^0 (matches jnp ref)
        sp_pad = jnp.pad(sp, ((0, 0), (k, ht - h + k), (0, 0)))
    d = jnp.pad(d, ((0, 0), (0, ht - h), (0, 0)))
    return gates9_pad, d, sp_pad, guidance, h, ht, wp


def _cspn_pallas_tiled_fwd_impl(guidance, blur, sparse, num_iters: int,
                                norm_type: str, has_sparse: bool,
                                interpret: bool, halo_k: int, tile_h: int,
                                channels_first: bool = False):
    # Round the clamped halo back up to a multiple of 4: the min against
    # num_iters can undo the public entry's rounding (e.g. num_iters=6),
    # and slab = tile_h + 2k must stay sublane-aligned for the Mosaic
    # DMAs. A halo larger than the per-launch iteration count is still
    # exact — it only wastes recompute rows.
    k = -(-min(halo_k, num_iters) // 4) * 4
    gates9_pad, d, sp_pad, _, h, _, _ = _tiled_pad_inputs(
        guidance, blur, sparse, norm_type, has_sparse, k, tile_h,
        channels_first)
    for r in _tiled_rounds(num_iters, k):
        d = _tiled_launch(gates9_pad, d, sp_pad, iters=r, k=k,
                          tile_h=tile_h, has_sparse=has_sparse,
                          interpret=interpret)
    return d[:, :h, :blur.shape[-1]]


# --------------------------------------------------------------------------
# Tiled stash forward + tiled adjoint (training at KITTI-class shapes).
#
# The whole-plane hand adjoint (above) is limited by its VMEM plane budget
# (_bwd_fits_vmem): at KITTI 1216x352 it used to fall back to the jnp scan
# VJP — the same ~T x 11-plane HBM traffic the NYU adjoint eliminated.
# This path removes that cliff by tiling the adjoint along H with the same
# recompute-in-halo amortization as the forward:
#
#   * forward: a stash variant of the tiled kernel additionally writes, at
#     every iteration t, each tile's interior +-1-row slab of d^t to an HBM
#     stash (laid out per (b, t, tile) so the backward reads are aligned).
#   * backward: a Python loop over the SAME rounds in reverse; each launch
#     DMAs a k-halo'd lambda slab, streams the d^t slabs back from the
#     stash, runs `iters` reverse iterations of the adjoint gather stencil
#     (lambda contamination shrinks inward exactly like the forward halo),
#     and accumulates the gate/center/sparse gradients on tile interiors —
#     accumulators live in HBM across rounds via input_output_aliases.
#   * the affinity-normalization chain rule is pointwise, so it runs as
#     plain XLA ops afterwards: jax.vjp of _prenorm_gates9 applied to the
#     accumulated [d gate_center, d gates] cotangents.
#
# HBM traffic ~ rounds x (9 gates + 16 dG + 2 lambda) + T stash planes vs
# the scan VJP's ~2T x 11 planes (rematerialized forward + backward).
# Gradients match jax.vjp of the jnp reference (tests/test_cspn_pallas.py).
# --------------------------------------------------------------------------


def _cspn_tiled_stash_kernel(gates9_ref, d_ref, sp_ref, stash_in_ref,
                             out_ref, stash_ref,
                             g_vmem, d_vmem, sp_vmem, dpad_ref, dcur_ref,
                             sem_g, sem_d, sem_sp, sem_st, *,
                             iters: int, t0: int, k: int, tile_h: int,
                             w: int, has_sparse: bool):
    """Like _cspn_tiled_kernel, but stashes each iteration's starting depth:
    stash[b, t0+j, tile, :tile_h+2] = d^{t0+j} rows
    [interior-1, interior+tile_h+1).

    Those rows sit at slab distance >= k - j >= 1 from the slab edge when
    iteration j starts, so they are uncontaminated. stash_in_ref is the
    aliased input buffer (earlier rounds' writes persist through it).
    The stash plane is tile_h + 8 rows (Mosaic DMA slices must be
    sublane-aligned; the last 6 rows are zeroed, never read).
    """
    del stash_in_ref
    b = pl.program_id(0)
    t = pl.program_id(1)
    slab = tile_h + 2 * k
    row0 = t * tile_h

    cp_g = pltpu.make_async_copy(
        gates9_ref.at[b, :, pl.ds(row0, slab), :], g_vmem, sem_g)
    cp_d = pltpu.make_async_copy(
        d_ref.at[b, pl.ds(row0, slab), :], d_vmem, sem_d)
    cp_g.start()
    cp_d.start()
    if has_sparse:
        cp_sp = pltpu.make_async_copy(
            sp_ref.at[b, pl.ds(row0, slab), :], sp_vmem, sem_sp)
        cp_sp.start()
        cp_sp.wait()
    cp_g.wait()
    cp_d.wait()

    gates9 = g_vmem[...]
    gate_center, gates = gates9[0], gates9[1:]
    sp = m = None
    if has_sparse:
        sp = sp_vmem[...]
        m = (sp > 0).astype(jnp.float32)

    dpad_ref[...] = jnp.zeros((slab + 2, w + 2), jnp.float32)
    dpad_ref[1:slab + 1, 1:w + 1] = d_vmem[...]
    dcur_ref[...] = jnp.zeros((tile_h + 8, w), jnp.float32)

    def body(j, carry):
        # Stage this iteration's d^t slab and DMA it out while the stencil
        # computes; wait before dcur is overwritten next iteration.
        dcur_ref[0:tile_h + 2] = dpad_ref[k:k + tile_h + 2, 1:w + 1]
        cp = pltpu.make_async_copy(dcur_ref, stash_ref.at[b, t0 + j, t],
                                   sem_st)
        cp.start()
        new = _stencil_step(dpad_ref, gate_center, gates, sp, m, slab, w,
                            has_sparse)
        cp.wait()
        dpad_ref[1:slab + 1, 1:w + 1] = new
        return carry

    lax.fori_loop(0, iters, body, 0, unroll=False)
    out_ref[0] = dpad_ref[1 + k:1 + k + tile_h, 1:w + 1]


def _tiled_stash_launch(gates9_pad, d, sp_pad, stash, *, iters, t0, k,
                        tile_h, has_sparse, interpret):
    b, ht, w = d.shape
    n_tiles = ht // tile_h
    slab = tile_h + 2 * k
    d_pad = jnp.pad(d, ((0, 0), (k, k), (0, 0)))

    kernel = functools.partial(
        _cspn_tiled_stash_kernel, iters=iters, t0=t0, k=k, tile_h=tile_h,
        w=w, has_sparse=has_sparse)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[
            pl.BlockSpec((1, tile_h, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ht, w), jnp.float32),
            jax.ShapeDtypeStruct(stash.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, slab, w), jnp.float32),
            pltpu.VMEM((slab, w), jnp.float32),
            pltpu.VMEM((slab, w), jnp.float32),
            pltpu.VMEM((slab + 2, w + 2), jnp.float32),
            pltpu.VMEM((tile_h + 8, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={3: 1},
        cost_estimate=pl.CostEstimate(
            flops=b * ht * w * iters * 19,
            bytes_accessed=4 * b * w * (9 * n_tiles * slab + 2 * ht
                                        + iters * n_tiles * (tile_h + 2)),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(gates9_pad, d_pad, sp_pad, stash)


def _tiled_bwd_k(halo_k: int, num_iters: int) -> int:
    """Halo for the stash-fwd + tiled-adjoint PAIR — must be computed
    identically on both sides (the stash layout depends on it via
    pick_tile_h_bwd). Clamped at 8 by default (the r4/r5 sweeps: k=12 is
    best for the fwd-only kernel but the pair's smaller tiles and larger
    lambda halos eat the gain); CSPN_TILED_BWD_K overrides for sweeps
    (tools/sweep_tiled_adjoint.py). Rounded to a multiple of 4 for slab
    sublane alignment."""
    import os

    cap = int(os.environ.get("CSPN_TILED_BWD_K", "8"))
    return -(-min(halo_k, num_iters, cap) // 4) * 4


def pick_tile_h_bwd(h: int, w: int, halo_k: int,
                    vmem_budget_bytes: int | None = None) -> int:
    """Tile height for the tiled adjoint (shared by its stash forward).

    Explicit scratch ≈ 34*tile_h + 40*k rows of (w_padded + 2) f32 lanes
    (gates slab x9 + padded gates x8 + lambda/sparse slabs + padded
    lambda/d planes + 8-plane gradient accumulator + small planes), plus
    ~30% Mosaic stack temporaries — budgeted against 16 MiB under the
    raised 32 MiB scoped-vmem cap (CSPN_TILED_BWD_BUDGET_MB overrides for
    sweeps). Multiple of 8 (output block sublane constraint).

    The 16 MiB default is the r5 sweep winner (tools/sweep_tiled_adjoint
    .py, KITTI 8x352x1216 T=24 fwd+full-bwd): tile 80 at 11.6-11.9 ms vs
    tile 56 at 12.2 ms for the old 12 MiB budget; 30 MiB (tile 168) fails
    TPU compilation outright, so the surface is a shallow bowl with its
    measured optimum here. k (8 vs 12) is within noise at this budget."""
    if vmem_budget_bytes is None:
        import os

        vmem_budget_bytes = int(os.environ.get(
            "CSPN_TILED_BWD_BUDGET_MB", "16")) * 1024 * 1024
    wp = -(-w // 128) * 128
    rows = vmem_budget_bytes // (4 * (wp + 2))
    tile = (rows - 40 * halo_k - 24) // 34 // 8 * 8
    return int(max(8, min(tile, -(-h // 8) * 8)))


def _cspn_tiled_stash_fwd_impl(guidance, blur, sparse, num_iters, norm_type,
                               has_sparse, interpret, halo_k,
                               channels_first=False):
    # The adjoint path clamps its halo at 8: the r4 sweep measured k=12
    # best for the FWD-ONLY kernel (3.90 -> 3.50 ms at KITTI) but k=8
    # best for the stash-fwd + reverse-sweep pair (11.95 vs 12.12 ms) —
    # the backward's smaller tiles and larger lambda halos eat the fwd
    # gain. The bwd impl below makes the same choice (its iteration
    # grouping is independent of the forward's, so consistency is not
    # required for correctness — only each side's own k/tile math).
    k = _tiled_bwd_k(halo_k, num_iters)
    tile_h = pick_tile_h_bwd(blur.shape[1], blur.shape[-1], k)
    gates9_pad, d, sp_pad, _, h, ht, wp = _tiled_pad_inputs(
        guidance, blur, sparse, norm_type, has_sparse, k, tile_h,
        channels_first)
    n_tiles = ht // tile_h
    # One zero-fill pass (rows never written are the global-border halos,
    # which must read as the zero padding).
    stash = jnp.zeros((blur.shape[0], num_iters, n_tiles, tile_h + 8, wp),
                      jnp.float32)
    t0 = 0
    for r in _tiled_rounds(num_iters, k):
        d, stash = _tiled_stash_launch(
            gates9_pad, d, sp_pad, stash, iters=r, t0=t0, k=k,
            tile_h=tile_h, has_sparse=has_sparse, interpret=interpret)
        t0 += r
    return d[:, :h, :blur.shape[-1]], stash


def _cspn_tiled_bwd_kernel(gates9_ref, sp_ref, lam_ref, stash_ref,
                           dgi_ref, g0i_ref, dspi_ref,
                           lamo_ref, dgo_ref, g0o_ref, dspo_ref,
                           g_vmem, gpad_vmem, sp_vmem, lam_vmem, upad,
                           dcur_ref, dpad2, dg_vmem, g0_vmem, dsp_vmem,
                           sem_g, sem_l, sem_sp, sem_d, sem_a, sem_o, *,
                           iters: int, t0: int, k: int, tile_h: int,
                           w: int, has_sparse: bool):
    """Adjoint of `iters` propagation iterations [t0, t0+iters) for one
    (batch, tile) program.

    lam_ref (B, Ht+2k, W): k-halo'd dL/d d^{t0+iters}; the reverse sweep's
    contamination shrinks inward 1 row/iteration, so the tile interior
    stays valid through all `iters` <= k steps (mirror of the forward
    recompute-in-halo argument). Gate/center/sparse gradients accumulate
    on tile interiors only, into HBM accumulators that alias their inputs
    (dgi/g0i/dspi -> dgo/g0o/dspo) so they persist across rounds.

    The adjoint stencil is the pure GATHER over iteration-invariant
    zero-padded gate planes (same formulation as _cspn_bwd_kernel):
        lam'(j) = g0(j) lam_u(j) + sum_k (g_k lam_u)(j - off_k).
    """
    del dgi_ref, g0i_ref, dspi_ref        # aliased to the output refs
    b = pl.program_id(0)
    tl = pl.program_id(1)
    slab = tile_h + 2 * k
    row0 = tl * tile_h

    cp_g = pltpu.make_async_copy(
        gates9_ref.at[b, :, pl.ds(row0, slab), :], g_vmem, sem_g)
    cp_l = pltpu.make_async_copy(
        lam_ref.at[b, pl.ds(row0, slab), :], lam_vmem, sem_l)
    cp_dg = pltpu.make_async_copy(
        dgo_ref.at[b, :, pl.ds(row0, tile_h), :], dg_vmem, sem_a)
    cp_g0 = pltpu.make_async_copy(
        g0o_ref.at[b, pl.ds(row0, tile_h), :], g0_vmem, sem_o)
    cp_g.start()
    cp_l.start()
    cp_dg.start()
    cp_g0.start()
    if has_sparse:
        cp_sp = pltpu.make_async_copy(
            sp_ref.at[b, pl.ds(row0, slab), :], sp_vmem, sem_sp)
        cp_dsp = pltpu.make_async_copy(
            dspo_ref.at[b, pl.ds(row0, tile_h), :], dsp_vmem, sem_d)
        cp_sp.start()
        cp_dsp.start()
        cp_sp.wait()
        cp_dsp.wait()
    cp_g.wait()
    cp_l.wait()
    cp_dg.wait()
    cp_g0.wait()

    om = None
    if has_sparse:
        om = 1.0 - (sp_vmem[...] > 0).astype(jnp.float32)

    gpad_vmem[...] = jnp.zeros((8, slab + 2, w + 2), jnp.float32)
    for kk in range(8):
        gpad_vmem[kk, 1:slab + 1, 1:w + 1] = g_vmem[kk + 1]
    upad[...] = jnp.zeros((slab + 2, w + 2), jnp.float32)
    dpad2[...] = jnp.zeros((tile_h + 2, w + 2), jnp.float32)

    def body(i, carry):
        j = iters - 1 - i
        cp_d = pltpu.make_async_copy(
            stash_ref.at[b, t0 + j, tl], dcur_ref, sem_d)
        cp_d.start()
        lam = lam_vmem[...]
        if has_sparse:
            lam_u = om * lam
            dsp_vmem[...] += (lam - lam_u)[k:k + tile_h]
        else:
            lam_u = lam
        upad[1:slab + 1, 1:w + 1] = lam_u
        cp_d.wait()
        d = dcur_ref[0:tile_h + 2]          # d^{t0+j}, rows interior +-1
        lam_u_int = lam_u[k:k + tile_h]
        g0_vmem[...] += lam_u_int * d[1:tile_h + 1]
        dpad2[0:tile_h + 2, 1:w + 1] = d
        acc = g_vmem[0] * lam_u
        for kk, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            dg_vmem[kk] += lam_u_int * dpad2[1 + dy:1 + dy + tile_h,
                                             1 + dx:1 + dx + w]
            # Gather term (g_{k2} lam_u)(j + (dy, dx)) for the neighbor k2
            # with off_{k2} = (-dy, -dx) — the offset set is symmetric, so
            # looping all 8 (dy, dx) covers every k2 exactly once.
            k2 = NEIGHBOR_OFFSETS.index((-dy, -dx))
            acc += (gpad_vmem[k2, 1 + dy:1 + dy + slab, 1 + dx:1 + dx + w]
                    * upad[1 + dy:1 + dy + slab, 1 + dx:1 + dx + w])
        lam_vmem[...] = acc
        return carry

    lax.fori_loop(0, iters, body, 0, unroll=True)

    lamo_ref[0] = lam_vmem[k:k + tile_h]
    cp1 = pltpu.make_async_copy(
        dg_vmem, dgo_ref.at[b, :, pl.ds(row0, tile_h), :], sem_a)
    cp2 = pltpu.make_async_copy(
        g0_vmem, g0o_ref.at[b, pl.ds(row0, tile_h), :], sem_o)
    cp1.start()
    cp2.start()
    if has_sparse:
        cp3 = pltpu.make_async_copy(
            dsp_vmem, dspo_ref.at[b, pl.ds(row0, tile_h), :], sem_sp)
        cp3.start()
        cp3.wait()
    cp1.wait()
    cp2.wait()


def _tiled_bwd_launch(gates9_pad, sp_pad, lam_pad, stash, dg, g0a, dspa, *,
                      iters, t0, k, tile_h, has_sparse, interpret):
    b, _, ht, w = dg.shape
    n_tiles = ht // tile_h
    slab = tile_h + 2 * k

    kernel = functools.partial(
        _cspn_tiled_bwd_kernel, iters=iters, t0=t0, k=k, tile_h=tile_h,
        w=w, has_sparse=has_sparse)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=[
            pl.BlockSpec((1, tile_h, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ht, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, ht, w), jnp.float32),
            jax.ShapeDtypeStruct((b, ht, w), jnp.float32),
            jax.ShapeDtypeStruct((b, ht, w), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, slab, w), jnp.float32),       # gates slab
            pltpu.VMEM((8, slab + 2, w + 2), jnp.float32),  # padded gates
            pltpu.VMEM((slab, w), jnp.float32),          # sparse slab
            pltpu.VMEM((slab, w), jnp.float32),          # lambda slab
            pltpu.VMEM((slab + 2, w + 2), jnp.float32),  # upad (lam_u)
            pltpu.VMEM((tile_h + 8, w), jnp.float32),    # dcur (d^t rows
                                                         #   [0, tile_h+2))
            pltpu.VMEM((tile_h + 2, w + 2), jnp.float32),  # dpad2
            pltpu.VMEM((8, tile_h, w), jnp.float32),     # dG accumulator
            pltpu.VMEM((tile_h, w), jnp.float32),        # g0 accumulator
            pltpu.VMEM((tile_h, w), jnp.float32),        # dsp accumulator
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 1, 5: 2, 6: 3},
        cost_estimate=pl.CostEstimate(
            flops=b * ht * w * iters * 40,
            bytes_accessed=4 * b * w * n_tiles * (
                (9 + 2) * slab + 18 * tile_h + iters * (tile_h + 2)),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(gates9_pad, sp_pad, lam_pad, stash, dg, g0a, dspa)


def _cspn_tiled_adjoint_bwd_impl(guidance, blur, sparse, stash, g_out,
                                 num_iters, norm_type, has_sparse,
                                 interpret, halo_k, channels_first=False):
    b, h, w = blur.shape
    n_tiles, tile_h = stash.shape[2], stash.shape[3] - 8
    # MUST match _cspn_tiled_stash_fwd_impl's k exactly (stash layout).
    k = _tiled_bwd_k(halo_k, num_iters)
    ht = n_tiles * tile_h
    wp = stash.shape[-1]

    guid_wp = guidance
    sp_wp = sparse
    if wp != w:
        gpad = (((0, 0), (0, 0), (0, 0), (0, wp - w)) if channels_first
                else ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        guid_wp = jnp.pad(guidance, gpad)
        sp_wp = jnp.pad(sparse, ((0, 0), (0, 0), (0, wp - w)))

    gates9, vjp_norm = jax.vjp(
        functools.partial(_prenorm_gates9, norm_type=norm_type,
                          channels_first=channels_first), guid_wp)
    gates9_pad = jnp.pad(gates9, ((0, 0), (0, 0), (k, ht - h + k), (0, 0)))
    if has_sparse:
        sp_pad = jnp.pad(sp_wp.astype(jnp.float32),
                         ((0, 0), (k, ht - h + k), (0, 0)))
    else:
        sp_pad = jnp.zeros((b, ht + 2 * k, wp), jnp.float32)

    lam = jnp.pad(g_out.astype(jnp.float32),
                  ((0, 0), (0, ht - h), (0, wp - w)))
    dg = jnp.zeros((b, 8, ht, wp), jnp.float32)
    g0a = jnp.zeros((b, ht, wp), jnp.float32)
    dspa = jnp.zeros((b, ht, wp), jnp.float32)

    rounds = _tiled_rounds(num_iters, k)
    t0s = []
    acc = 0
    for r in rounds:
        t0s.append(acc)
        acc += r
    for r, t0 in reversed(list(zip(rounds, t0s))):
        lam_pad = jnp.pad(lam, ((0, 0), (k, k), (0, 0)))
        lam, dg, g0a, dspa = _tiled_bwd_launch(
            gates9_pad, sp_pad, lam_pad, stash, dg, g0a, dspa,
            iters=r, t0=t0, k=k, tile_h=tile_h, has_sparse=has_sparse,
            interpret=interpret)

    lam0 = lam[:, :h, :w]                       # dL/d d^0 (anchored)
    # Pointwise normalization chain rule via XLA.
    dgates9 = jnp.concatenate([g0a[:, None], dg], axis=1)[:, :, :h]
    (d_guid,) = vjp_norm(dgates9)
    if wp != w:
        d_guid = (d_guid[..., :w] if channels_first else d_guid[:, :, :w])
    if has_sparse:
        m = (sparse > 0).astype(jnp.float32)
        d_blur = (1.0 - m) * lam0
        d_sparse = dspa[:, :h, :w] + m * lam0
    else:
        d_blur = lam0
        d_sparse = jnp.zeros_like(sparse)
    return (d_guid.astype(guidance.dtype), d_blur.astype(blur.dtype),
            d_sparse.astype(sparse.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _cspn_pallas_tiled(guidance, blur, sparse, num_iters, norm_type,
                       has_sparse, interpret, halo_k, tile_h,
                       channels_first=False):
    return _cspn_pallas_tiled_fwd_impl(
        guidance, blur, sparse, num_iters, norm_type, has_sparse, interpret,
        halo_k, tile_h, channels_first)


def _tiled_fwd(guidance, blur, sparse, num_iters, norm_type, has_sparse,
               interpret, halo_k, tile_h, channels_first=False):
    if use_pallas_adjoint():
        out, stash = _cspn_tiled_stash_fwd_impl(
            guidance, blur, sparse, num_iters, norm_type, has_sparse,
            interpret, halo_k, channels_first)
        return out, (guidance, blur, sparse, stash)
    out = _cspn_pallas_tiled(guidance, blur, sparse, num_iters, norm_type,
                             has_sparse, interpret, halo_k, tile_h,
                             channels_first)
    return out, (guidance, blur, sparse, None)


def _tiled_bwd(num_iters, norm_type, has_sparse, interpret, halo_k, tile_h,
               channels_first, residuals, g_out):
    guidance, blur, sparse, stash = residuals
    if stash is not None:
        return _cspn_tiled_adjoint_bwd_impl(
            guidance, blur, sparse, stash, g_out, num_iters, norm_type,
            has_sparse, interpret, halo_k, channels_first)
    return _bwd(num_iters, norm_type, has_sparse, interpret, channels_first,
                (guidance, blur, sparse, None), g_out)


_cspn_pallas_tiled.defvjp(_tiled_fwd, _tiled_bwd)


def pick_tile_h(h: int, w: int, halo_k: int,
                vmem_budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Largest tile height whose ~13 f32 slab planes fit the VMEM budget.

    Rounded down to a multiple of 8: the TPU lowering requires the output
    block's sublane dimension to divide by 8 (unless it spans the array).
    The budget is deliberately ~1/3 of VMEM: on top of the explicit
    scratches, Mosaic stack-allocates the stencil temporaries and
    double-buffers the output block (a 6 MiB budget measured ~9 MiB total
    at KITTI width; 8 MiB OOM'd the 16 MiB v5e VMEM).
    """
    slab_max = vmem_budget_bytes // (13 * 4 * w)
    tile = max(8, (slab_max - 2 * halo_k) // 8 * 8)
    return min(tile, h)


def cspn_propagate_pallas_tiled(
    guidance: jax.Array,
    blur_depth: jax.Array,
    sparse_depth: jax.Array | None = None,
    *,
    num_iters: int = 24,
    norm_type: str = "8sum",
    halo_k: int = 12,
    tile_h: int | None = None,
    interpret: bool | None = None,
    guidance_layout: str = "NHWC",
) -> jax.Array:
    """Fused-tile CSPN for images beyond the whole-plane VMEM budget.

    Same contract as cspn_propagate_ref; numerically identical (the k-row
    recompute halo makes every tile interior exact — tests/test_cspn_pallas.py).
    guidance_layout "NCHW" accepts plane-major (B, 8, H, W) guidance.

    tile_h tunes the INFERENCE / fallback forward only: when the Pallas
    adjoint is enabled (default), any differentiated call routes to the
    stash forward, which sizes its own tiles via pick_tile_h_bwd so the
    backward's larger VMEM working set (gates + accumulators + stash
    streams) fits its budget — a caller-supplied tile_h is ignored there.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret:
        # Mosaic DMA slices must be sublane-aligned: the slab height
        # tile_h + 2k must divide by 8, so on the compiled path halo_k is
        # rounded up to a multiple of 4 (tile_h is always a multiple of 8).
        halo_k = -(-halo_k // 4) * 4
    squeeze = blur_depth.ndim == 4
    d0 = blur_depth[..., 0] if squeeze else blur_depth
    has_sparse = sparse_depth is not None
    if has_sparse:
        sp = sparse_depth[..., 0] if sparse_depth.ndim == 4 else sparse_depth
    else:
        sp = jnp.zeros_like(d0)

    h, w = d0.shape[1:]
    if tile_h is None:
        tile_h = pick_tile_h(h, w, halo_k)
    out = _cspn_pallas_tiled(guidance, d0, sp, num_iters, norm_type,
                             has_sparse, interpret, halo_k, tile_h,
                             guidance_layout == "NCHW")
    out = out.astype(d0.dtype)
    return out[..., None] if squeeze else out


# --------------------------------------------------------------------------
# Prenormalized fused kernel for the spatially-sharded path.
#
# parallel/halo.py normalizes affinities per shard (pointwise), exchanges
# gate/sparse halos once and depth halos every k iterations, then runs k
# stencil iterations on an (H_loc + 2k)-row slab. Sharding shrinks the
# per-device planes back under the whole-plane VMEM budget, which is
# exactly when the fused kernel wins — so the slab body dispatches here
# instead of the jnp lax.scan whenever the slab fits VMEM
# (SURVEY.md §2.2 N2+N5 composition).
#
# Contract differs from the public kernels: gates arrive pre-normalized as
# (B, 9, H, W) (channel 0 = center), and d^0 is NOT anchored on entry (the
# caller anchors once; anchoring is idempotent across rounds). Matches
# cspn_propagate_prenorm_ref, whose VJP is the backward rule.
# --------------------------------------------------------------------------


def _cspn_prenorm_kernel(gates9_ref, d_ref, sp_ref, out_ref, dpad_ref, *,
                         num_iters: int, has_sparse: bool):
    """One batch element: gates9 (9, H, W) prenormalized, d/sp/out (H, W)."""
    h, w = d_ref.shape[1:]
    gates9 = gates9_ref[0]
    gate_center, gates = gates9[0], gates9[1:]
    sp = m = None
    if has_sparse:
        sp = sp_ref[0]
        m = (sp > 0).astype(jnp.float32)
    dpad_ref[...] = jnp.zeros((h + 2, w + 2), jnp.float32)
    dpad_ref[1:h + 1, 1:w + 1] = d_ref[0]
    _run_stencil(dpad_ref, gate_center, gates, sp, m, h, w, num_iters,
                 has_sparse)
    out_ref[0] = dpad_ref[1:h + 1, 1:w + 1]


def _cspn_prenorm_fwd_impl(gates9, d0, sp, num_iters: int, has_sparse: bool,
                           interpret: bool):
    b, _, h, w = gates9.shape
    kernel = functools.partial(
        _cspn_prenorm_kernel, num_iters=num_iters, has_sparse=has_sparse)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 9, h, w), lambda i: (i, 0, 0, 0),
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
            flops=b * h * w * num_iters * 19,
            bytes_accessed=4 * b * h * w * 12, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(gates9.astype(jnp.float32), d0.astype(jnp.float32),
      sp.astype(jnp.float32))


# --- prenorm hand adjoint (stash forward + gather adjoint stencil) -------
# On a real multi-chip KITTI run the slab backward is the per-shard
# training hot path; without this it re-runs the jnp scan VJP per shard
# (the same T x 11-plane traffic the single-chip adjoints eliminate).
# Simpler than the whole-plane adjoint: gates arrive prenormalized, so
# there is NO normalization chain rule in-kernel — dL/d(gates9) is
# returned directly and XLA backprops the pointwise normalization that
# parallel/halo.py applied outside. d^0 is not anchored (caller anchors),
# so dL/d(d0) = lambda^0 with no anchor masking.


def _cspn_prenorm_stash_kernel(gates9_ref, d_ref, sp_ref, out_ref, stash_ref,
                               dpad_ref, dcur_ref, sem, *,
                               num_iters: int, has_sparse: bool):
    """Forward + stash of each iteration's starting depth plane."""
    b = pl.program_id(0)
    h, w = d_ref.shape[1:]
    gates9 = gates9_ref[0]
    gate_center, gates = gates9[0], gates9[1:]
    sp = m = None
    if has_sparse:
        sp = sp_ref[0]
        m = (sp > 0).astype(jnp.float32)
    dpad_ref[...] = jnp.zeros((h + 2, w + 2), jnp.float32)
    dpad_ref[1:h + 1, 1:w + 1] = d_ref[0]

    def body(t, carry):
        dcur_ref[...] = dpad_ref[1:h + 1, 1:w + 1]      # d^t
        cp = pltpu.make_async_copy(dcur_ref, stash_ref.at[b, t], sem)
        cp.start()
        new = _stencil_step(dpad_ref, gate_center, gates, sp, m, h, w,
                            has_sparse)
        cp.wait()
        dpad_ref[1:h + 1, 1:w + 1] = new
        return carry

    lax.fori_loop(0, num_iters, body, 0, unroll=False)
    out_ref[0] = dpad_ref[1:h + 1, 1:w + 1]


def _cspn_prenorm_stash_fwd(gates9, d0, sp, num_iters, has_sparse,
                            interpret):
    """Returns (out (B, H, W), stash (B, T, Hp, Wp))."""
    b, _, h, w = gates9.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    g_p = _pad_hw(gates9, hp, wp).astype(jnp.float32)
    d_p = _pad_hw(d0, hp, wp).astype(jnp.float32)
    sp_p = _pad_hw(sp, hp, wp).astype(jnp.float32)

    kernel = functools.partial(
        _cspn_prenorm_stash_kernel, num_iters=num_iters,
        has_sparse=has_sparse)
    out, stash = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 9, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, num_iters, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hp + 2, wp + 2), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * hp * wp * num_iters * 19,
            bytes_accessed=4 * b * hp * wp * (12 + num_iters),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(g_p, d_p, sp_p)
    return out[:, :h, :w], stash


def _cspn_prenorm_bwd_kernel(gates9_ref, sp_ref, lam_ref, stash_ref,
                             dg9_ref, dblur_ref, dsp_ref,
                             gpad_vmem, upad, dpad2, dcur_ref, sem_d, *,
                             num_iters: int, has_sparse: bool):
    """Adjoint for one batch element; dg9_ref (1, 9, H, W) doubles as the
    gradient accumulator (channel 0 = center gate)."""
    h, w = lam_ref.shape[1:]
    b = pl.program_id(0)

    om = None
    if has_sparse:
        om = 1.0 - (sp_ref[0] > 0).astype(jnp.float32)

    gpad_vmem[...] = jnp.zeros((8, h + 2, w + 2), jnp.float32)
    for k in range(8):
        gpad_vmem[k, 1:h + 1, 1:w + 1] = gates9_ref[0, k + 1]
    gc = gates9_ref[0, 0]

    dg9_ref[...] = jnp.zeros((1, 9, h, w), jnp.float32)
    dsp_ref[...] = jnp.zeros((1, h, w), jnp.float32)
    upad[...] = jnp.zeros((h + 2, w + 2), jnp.float32)
    dpad2[...] = jnp.zeros((h + 2, w + 2), jnp.float32)

    def body(i, lam):
        t = num_iters - 1 - i
        cp = pltpu.make_async_copy(stash_ref.at[b, t], dcur_ref, sem_d)
        cp.start()
        if has_sparse:
            lam_u = om * lam
            dsp_ref[0] += lam - lam_u
        else:
            lam_u = lam
        upad[1:h + 1, 1:w + 1] = lam_u
        cp.wait()
        d = dcur_ref[...]                   # d^t
        dg9_ref[0, 0] += lam_u * d
        dpad2[1:h + 1, 1:w + 1] = d
        acc = gc * lam_u
        for k, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            dg9_ref[0, k + 1] += lam_u * dpad2[1 + dy:1 + dy + h,
                                               1 + dx:1 + dx + w]
            k2 = NEIGHBOR_OFFSETS.index((-dy, -dx))
            acc += (gpad_vmem[k2, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                    * upad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w])
        return acc

    lam0 = lax.fori_loop(0, num_iters, body, lam_ref[0], unroll=True)
    dblur_ref[0] = lam0                     # d^0 is not anchored here


def _cspn_prenorm_bwd_impl(gates9, sp, stash, g_out, num_iters, has_sparse,
                           interpret):
    b, _, h, w = gates9.shape
    hp, wp = stash.shape[-2:]
    g_p = _pad_hw(gates9, hp, wp).astype(jnp.float32)
    sp_p = _pad_hw(sp, hp, wp).astype(jnp.float32)
    lam_p = _pad_hw(g_out, hp, wp).astype(jnp.float32)

    kernel = functools.partial(
        _cspn_prenorm_bwd_kernel, num_iters=num_iters,
        has_sparse=has_sparse)
    dg9, dblur, dsp = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 9, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # stash
        ],
        out_specs=[
            pl.BlockSpec((1, 9, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 9, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, hp + 2, wp + 2), jnp.float32),  # padded gates
            pltpu.VMEM((hp + 2, wp + 2), jnp.float32),     # upad
            pltpu.VMEM((hp + 2, wp + 2), jnp.float32),     # dpad2
            pltpu.VMEM((hp, wp), jnp.float32),             # dcur
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * hp * wp * num_iters * 40,
            bytes_accessed=4 * b * hp * wp * (22 + num_iters),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(g_p, sp_p, lam_p, stash)
    return (dg9[:, :, :h, :w], dblur[:, :h, :w], dsp[:, :h, :w])


# ~32 planes live (gates block 9 + dg9 block 9 + padded gates 8 + pads +
# streaming) plus Mosaic stack; same class of budget as the whole-plane
# adjoint.
def _prenorm_bwd_fits_vmem(h: int, w: int) -> bool:
    wp = -(-w // 128) * 128
    return 44 * 4 * h * wp <= _BWD_VMEM_PLANE_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _cspn_prenorm(gates9, d0, sp, num_iters, has_sparse, interpret):
    return _cspn_prenorm_fwd_impl(gates9, d0, sp, num_iters, has_sparse,
                                  interpret)


def _prenorm_fwd(gates9, d0, sp, num_iters, has_sparse, interpret):
    h, w = d0.shape[1:3]
    if _prenorm_bwd_fits_vmem(h, w) and use_pallas_adjoint():
        out, stash = _cspn_prenorm_stash_fwd(
            gates9, d0, sp, num_iters, has_sparse, interpret)
        return out, (gates9, d0, sp, stash)
    out = _cspn_prenorm(gates9, d0, sp, num_iters, has_sparse, interpret)
    return out, (gates9, d0, sp, None)


def _prenorm_bwd(num_iters, has_sparse, interpret, residuals, g_out):
    gates9, d0, sp, stash = residuals
    if stash is not None:
        dg9, dd, dsp = _cspn_prenorm_bwd_impl(
            gates9, sp, stash, g_out, num_iters, has_sparse, interpret)
        if not has_sparse:
            dsp = jnp.zeros_like(sp)
        return dg9, dd, dsp

    def ref(g9, d, s):
        return cspn_propagate_prenorm_ref(
            g9, d, s if has_sparse else None, num_iters=num_iters)

    _, vjp = jax.vjp(ref, gates9, d0, sp)
    dg9, dd, dsp = vjp(g_out)
    if not has_sparse:
        dsp = jnp.zeros_like(sp)
    return dg9, dd, dsp


_cspn_prenorm.defvjp(_prenorm_fwd, _prenorm_bwd)


# VMEM use of the prenorm kernel: 9 gate planes + d + sp + dpad + the
# double-buffered in/out blocks and Mosaic stencil temporaries — budget as
# ~16 lane-padded planes against a conservative 10 MiB.
def prenorm_fits_vmem(h: int, w: int) -> bool:
    wp = -(-w // 128) * 128
    return 16 * 4 * h * wp <= 10 * 1024 * 1024


def cspn_propagate_prenorm_pallas(
    gates9: jax.Array,
    d0: jax.Array,
    sparse_depth: jax.Array | None = None,
    *,
    num_iters: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused prenormalized propagation (see cspn_propagate_prenorm_ref)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_sparse = sparse_depth is not None
    sp = sparse_depth if has_sparse else jnp.zeros_like(d0)
    out = _cspn_prenorm(gates9, d0, sp, num_iters, has_sparse, interpret)
    return out.astype(d0.dtype)
