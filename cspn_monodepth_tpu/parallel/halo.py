"""Spatially-sharded CSPN propagation with ICI halo exchange.

SURVEY.md section 2.2 N2 / section 6 "long-context": for large resolutions
(KITTI 1216x352) the H dimension of the depth/guidance maps is sharded over
the "spatial" mesh axis. The 3x3 propagation stencil needs 1 row of halo
per iteration, so a `shard_map` wrapper exchanges halos with
`jax.lax.ppermute` over ICI.

Amortization: exchanging every iteration is latency-bound, so we exchange a
k-row halo every k fused iterations (halo_k). Each shard then iterates k
times on an (H_loc + 2k)-row slab; after iteration j the outer j rows are
contaminated by the slab's zero padding, so after k iterations exactly the
k halo rows are invalid and the center H_loc rows are bit-exact vs the
unsharded op. Affinity gates and sparse anchors are iteration-invariant, so
their halos are exchanged once up front.

ppermute conveniently yields zeros on devices that receive nothing, which
matches the op's zero-padding at the global image border.

The whole thing is differentiable: XLA transposes ppermute to the inverted
permutation in the backward pass, and the body is the jnp reference body.

Slab execution (SURVEY.md §2.2 N2+N5 composition): sharding shrinks the
per-device planes back under the whole-plane VMEM budget — exactly when
the fused Pallas kernel wins — so the k-iteration slab body dispatches to
the prenormalized fused kernel (`cspn_propagate_prenorm_pallas`) whenever
the slab fits VMEM, falling back to the jnp `lax.scan` body otherwise
(`impl="auto"`; both paths equivalence-tested in tests/test_sharding.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cspn_monodepth_tpu.ops.cspn_ref import (
    cspn_propagate_prenorm_ref,
    normalize_affinity,
)


def _exchange_halo(x: jax.Array, k: int, axis_name: str) -> tuple[jax.Array, jax.Array]:
    """Return (rows from the shard above, rows from the shard below).

    x: (B, H_loc, W, ...). "Above" = lower global row index (previous shard).
    Devices at the global top/bottom receive zeros (== zero padding).
    """
    n = lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]   # shard i -> shard i+1
    up = [(i + 1, i) for i in range(n - 1)]     # shard i+1 -> shard i
    from_above = lax.ppermute(x[:, -k:], axis_name, down)  # my top halo
    from_below = lax.ppermute(x[:, :k], axis_name, up)     # my bottom halo
    return from_above, from_below


def _propagate_slab(gates9, d, sp, num_iters: int, impl: str):
    """Run num_iters CSPN iterations on a local slab with zero padding.

    gates9: (B, 9, H, W) — channel 0 is the center gate, 1..8 the neighbors
    in NEIGHBOR_OFFSETS order. d/sp: (B, H, W); sp may be None.
    """
    if impl == "pallas":
        from cspn_monodepth_tpu.ops.cspn_pallas import (
            cspn_propagate_prenorm_pallas,
        )

        return cspn_propagate_prenorm_pallas(gates9, d, sp,
                                             num_iters=num_iters)
    return cspn_propagate_prenorm_ref(gates9, d, sp, num_iters=num_iters)


def cspn_propagate_spatial(
    guidance: jax.Array,
    blur_depth: jax.Array,
    sparse_depth: jax.Array | None = None,
    *,
    mesh: Mesh,
    num_iters: int = 24,
    norm_type: str = "8sum",
    halo_k: int = 4,
    impl: str = "auto",
) -> jax.Array:
    """CSPN propagation with H sharded over the mesh's "spatial" axis.

    guidance: (B, H, W, 8); blur/sparse: (B, H, W) or (B, H, W, 1).
    Output matches `cspn_propagate_ref` exactly (tested in
    tests/test_sharding.py) while running on B/"data" x H/"spatial" shards.

    impl: "auto" (fused Pallas slab kernel when the halo'd slab fits its
    VMEM budget, jnp lax.scan otherwise), "pallas", or "jnp".
    """
    squeeze = blur_depth.ndim == 4
    d0 = blur_depth[..., 0] if squeeze else blur_depth
    sp = None
    if sparse_depth is not None:
        sp = sparse_depth[..., 0] if sparse_depth.ndim == 4 else sparse_depth

    halo_k = min(halo_k, num_iters)
    n_spatial = mesh.shape["spatial"]
    h_in = d0.shape[1]
    # Non-divisible H (SURVEY.md §8 hard parts: NYU 228 on a spatial=8
    # mesh): zero-pad H up to the next shard multiple and crop on exit.
    # Zero guidance rows normalize to zero neighbor gates (center gate
    # absorbs the slack), so padded rows hold exactly 0 through every
    # iteration and the last real row reads 0 from them — identical to
    # the unsharded op's zero border (tests/test_sharding.py).
    h = -(-h_in // n_spatial) * n_spatial
    if h != h_in:
        guidance = jnp.pad(
            guidance, ((0, 0), (0, h - h_in), (0, 0), (0, 0)))
        d0 = jnp.pad(d0, ((0, 0), (0, h - h_in), (0, 0)))
        if sp is not None:
            sp = jnp.pad(sp, ((0, 0), (0, h - h_in), (0, 0)))
    assert h // n_spatial >= halo_k, (
        f"halo_k={halo_k} exceeds local shard height {h // n_spatial}; "
        "halos only reach the immediate neighbor")
    # Round up to a whole number of k-sized rounds (extra iterations would
    # change semantics, so instead split: full rounds of k + remainder).
    rounds = [halo_k] * (num_iters // halo_k)
    if num_iters % halo_k:
        rounds.append(num_iters % halo_k)

    if impl == "auto":
        from cspn_monodepth_tpu.ops.cspn_pallas import prenorm_fits_vmem

        slab_h = h // n_spatial + 2 * halo_k
        slab_impl = ("pallas" if prenorm_fits_vmem(slab_h, d0.shape[-1])
                     else "jnp")
    elif impl in ("pallas", "jnp"):
        slab_impl = impl
    else:
        raise ValueError(f"unknown impl: {impl!r}")

    in_specs = (
        P("data", "spatial"),                     # guidance (B,H,W,8)
        P("data", "spatial"),                     # d0
        P("data", "spatial") if sp is not None else None,  # sparse
    )
    out_spec = P("data", "spatial")

    def sharded(guid, d, sp_):
        # Normalization is pointwise => valid on local shards.
        gate, gate_center = normalize_affinity(guid, norm_type)
        gates9 = jnp.concatenate([gate_center, gate], axis=-1)  # (B,H,W,9)

        if sp_ is not None:
            mask = (sp_ > 0).astype(d.dtype)
            d = (1.0 - mask) * d + mask * sp_     # anchor d^0 (matches ref)

        k = halo_k
        # Iteration-invariant halos: gates + sparse, exchanged once. The
        # anchor mask is pointwise (sp > 0), so it needs no exchange of its
        # own: ppermute's zero fill at the global border gives sp = 0 there,
        # hence mask = 0, matching the unsharded op.
        g_above, g_below = _exchange_halo(gates9, k, "spatial")
        gates_slab = jnp.moveaxis(
            jnp.concatenate([g_above, gates9, g_below], axis=1), -1, 1)
        # (B, 9, H_loc + 2k, W)

        if sp_ is not None:
            sp_above, sp_below = _exchange_halo(sp_, k, "spatial")
            sp_slab = jnp.concatenate([sp_above, sp_, sp_below], axis=1)
        else:
            sp_slab = None

        h_loc = d.shape[1]
        for r in rounds:
            d_above, d_below = _exchange_halo(d, k, "spatial")
            slab = jnp.concatenate([d_above, d, d_below], axis=1)
            slab = _propagate_slab(gates_slab, slab, sp_slab, r, slab_impl)
            d = slab[:, k:k + h_loc]
        return d

    if sp is None:
        fn = shard_map(
            lambda g, d: sharded(g, d, None), mesh=mesh,
            in_specs=in_specs[:2], out_specs=out_spec, check_vma=False)
        out = fn(guidance, d0)
    else:
        fn = shard_map(
            sharded, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
            check_vma=False)
        out = fn(guidance, d0, sp)
    out = out[:, :h_in]
    return out[..., None] if squeeze else out
