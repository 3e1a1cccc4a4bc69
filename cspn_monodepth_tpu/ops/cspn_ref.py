"""Pure-jnp reference implementation of CSPN spatial propagation.

This is the binding algorithmic contract from SURVEY.md section 4.1-4.2
(Cheng, Wang, Yang - "Learning Depth with Convolutional Spatial Propagation
Network", TPAMI 2019, arXiv:1810.02695, Eq. 1-5). The reference repo's
equivalent is `cspn.py: Affinity_Propagate.forward` (per-iteration torch
elementwise ops); here the whole loop is a single differentiable
`lax.scan` so XLA can fuse each iteration and autodiff stays O(1) memory
with rematerialization.

Layout convention: channels-last (NHWC). guidance is (B, H, W, 8), depth
maps are (B, H, W). The 8 neighbor channels are ordered row-major over the
3x3 neighborhood with the center removed (see NEIGHBOR_OFFSETS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# (dy, dx) offsets of the 8 neighbors, row-major, center excluded.
# Channel k of the guidance map weights the neighbor at (i+dy_k, j+dx_k)
# — a *gather* stencil: the affinity at the output pixel weights its
# neighbors' values (SURVEY.md section 4.2 note).
NEIGHBOR_OFFSETS: tuple[tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1),           (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def normalize_affinity(guidance: jax.Array, norm_type: str = "8sum",
                       eps: float = 1e-8):
    """Affinity normalization, SURVEY.md section 4.1 [P, Eq. 2-3].

    Args:
      guidance: raw affinities g-hat, shape (..., 8).
      norm_type:
        "8sum": signed, divide by abs-sum — the paper/reference norm.
        "8sum_abs": non-negative, use |g-hat|.
        "8sum_clamp": signed, divide by max(abs-sum, 1). Identical to
          "8sum" whenever sum|g-hat| >= 1; below that the raw affinities
          pass through unscaled, so g-hat -> 0 gives a smooth identity
          propagation with unit-scale gradients. This is the framework's
          training default: "8sum" with a zero/small-init guidance head
          either explodes (gate = g/eps) or is expansive under random
          signed gates, which is why the reference needs a pretrained
          encoder to train stably; "8sum_clamp" trains from scratch.
      eps: guard for the abs-sum denominator (upstream divides
        unconditionally; we clamp at eps).

    Returns:
      (gate, gate_center): gate (..., 8) with sum_k |gate_k| <= 1 and
      gate_center (..., 1) = 1 - sum_k gate_k, so that the full 9-weight row
      sums to exactly 1 => the propagation is a stable diffusion
      (spectral norm <= 1) [P, Thm. 1].
    """
    if norm_type == "8sum_abs":
        guidance = jnp.abs(guidance)
    elif norm_type not in ("8sum", "8sum_clamp"):
        raise ValueError(f"unknown norm_type: {norm_type!r}")
    abs_sum = jnp.sum(jnp.abs(guidance), axis=-1, keepdims=True)
    floor = 1.0 if norm_type == "8sum_clamp" else eps
    gate = guidance / jnp.maximum(abs_sum, floor)
    gate_center = 1.0 - jnp.sum(gate, axis=-1, keepdims=True)
    return gate, gate_center


def _shift(d: jax.Array, dy: int, dx: int) -> jax.Array:
    """Return d shifted so out[i, j] = d[i+dy, j+dx], zero-padded at borders.

    d: (B, H, W).
    """
    h, w = d.shape[-2], d.shape[-1]
    padded = jnp.pad(d, ((0, 0), (1, 1), (1, 1)))
    return padded[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


@functools.partial(jax.jit, static_argnames=("num_iters", "norm_type"))
def cspn_propagate_ref(
    guidance: jax.Array,
    blur_depth: jax.Array,
    sparse_depth: jax.Array | None = None,
    *,
    num_iters: int = 24,
    norm_type: str = "8sum",
) -> jax.Array:
    """CSPN propagation, SURVEY.md section 4.2 [P, Eq. 1].

    d^{t+1}(i,j) = g0(i,j) d^t(i,j) + sum_{(a,b) in N8} g_ab(i,j) d^t(i+a,j+b)
    with zero padding at image borders; if sparse_depth is given, each
    iteration ends with anchor replacement
    d <- (1-m) d + m d_sparse, m = (d_sparse > 0).

    Args:
      guidance: (B, H, W, 8) raw (unnormalized) affinities.
      blur_depth: (B, H, W) or (B, H, W, 1) initial depth d^0.
      sparse_depth: optional (B, H, W) or (B, H, W, 1) sparse anchors.
      num_iters: T, the number of propagation iterations (12 or 24 headline).
      norm_type: see normalize_affinity.

    Returns:
      refined depth with the same shape as blur_depth.
    """
    squeeze = blur_depth.ndim == 4
    d0 = blur_depth[..., 0] if squeeze else blur_depth
    sp = None
    if sparse_depth is not None:
        sp = sparse_depth[..., 0] if sparse_depth.ndim == 4 else sparse_depth

    gate, gate_center = normalize_affinity(guidance, norm_type)
    # (8, B, H, W) for cheap per-neighbor indexing inside the scan body.
    gates = jnp.moveaxis(gate, -1, 0)
    g0 = gate_center[..., 0]

    if sp is not None:
        mask = (sp > 0).astype(d0.dtype)
        # Anchor d^0 as well so iteration 1 already sees the sparse points.
        d0 = (1.0 - mask) * d0 + mask * sp

    h, w = d0.shape[-2], d0.shape[-1]

    def body(d, _):
        padded = jnp.pad(d, ((0, 0), (1, 1), (1, 1)))
        new = g0 * d
        for k, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            new = new + gates[k] * padded[:, 1 + dy:1 + dy + h,
                                          1 + dx:1 + dx + w]
        if sp is not None:
            new = (1.0 - mask) * new + mask * sp
        return new, None

    d_final, _ = lax.scan(body, d0, None, length=num_iters)
    return d_final[..., None] if squeeze else d_final


def cspn_propagate_prenorm_ref(
    gates9: jax.Array,
    d0: jax.Array,
    sparse_depth: jax.Array | None = None,
    *,
    num_iters: int,
) -> jax.Array:
    """Propagation with PRE-normalized gates and NO d^0 anchoring.

    The building block of the spatially-sharded halo-exchange path
    (parallel/halo.py): normalization is pointwise so it runs per shard
    before the halo exchange, and d^0 arrives already anchored from the
    caller (anchoring is idempotent across rounds). Semantics otherwise
    match cspn_propagate_ref's iteration body: zero border padding, anchor
    replacement after every iteration.

    Args:
      gates9: (B, 9, H, W) — channel 0 is the center gate, 1..8 the
        neighbor gates in NEIGHBOR_OFFSETS order.
      d0: (B, H, W) starting depth.
      sparse_depth: optional (B, H, W) anchors (0 = no anchor).
      num_iters: iterations to run.
    """
    h, w = d0.shape[-2], d0.shape[-1]
    mask = None
    if sparse_depth is not None:
        mask = (sparse_depth > 0).astype(d0.dtype)

    def body(d, _):
        padded = jnp.pad(d, ((0, 0), (1, 1), (1, 1)))
        new = gates9[:, 0] * d
        for k, (dy, dx) in enumerate(NEIGHBOR_OFFSETS):
            new = new + gates9[:, k + 1] * padded[:, 1 + dy:1 + dy + h,
                                                  1 + dx:1 + dx + w]
        if mask is not None:
            new = (1.0 - mask) * new + mask * sparse_depth
        return new, None

    d_final, _ = lax.scan(body, d0, None, length=num_iters)
    return d_final
