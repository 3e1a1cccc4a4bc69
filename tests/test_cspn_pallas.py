"""Pallas-vs-jnp parity (SURVEY.md section 5.2 item 3).

On CPU the kernel runs in interpreter mode — same kernel code, same
numerics path as the TPU lowering modulo float ordering, so tolerances are
tight. TPU-compiled parity is additionally exercised by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cspn_monodepth_tpu.ops import cspn_propagate_ref, uniform_sparse_sample
from cspn_monodepth_tpu.ops.cspn_pallas import cspn_propagate_pallas




def _assert_close(got, want, rtol=1e-5):
    """allclose with atol scaled to the field magnitude: random signed
    gates are expansive (values reach 1e4+ by T=12), so a fixed atol is
    meaningless — what matters is error relative to the largest value."""
    got, want = np.asarray(got), np.asarray(want)
    scale = max(1.0, float(np.max(np.abs(want))))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * scale)

def _problem(key, b, h, w, n_sparse=30):
    kg, kd, ks = jax.random.split(key, 3)
    guidance = jax.random.normal(kg, (b, h, w, 8), jnp.float32)
    blur = jax.random.uniform(kd, (b, h, w), jnp.float32, 0.1, 10.0)
    dense = jax.random.uniform(ks, (b, h, w), jnp.float32, 0.1, 10.0)
    sparse = uniform_sparse_sample(ks, dense, num_samples=n_sparse)
    return guidance, blur, sparse


@pytest.mark.parametrize("num_iters", [1, 5, 12])
@pytest.mark.parametrize("with_sparse", [True, False])
def test_pallas_matches_ref(num_iters, with_sparse):
    guidance, blur, sparse = _problem(jax.random.key(num_iters), 2, 16, 24)
    sp = sparse if with_sparse else None
    want = cspn_propagate_ref(guidance, blur, sp, num_iters=num_iters)
    got = cspn_propagate_pallas(guidance, blur, sp, num_iters=num_iters)
    _assert_close(got, want)


@pytest.mark.parametrize("hw", [(13, 17), (28, 30), (57, 76)])
def test_pallas_odd_sizes(hw):
    """Non-tile-aligned shapes (SURVEY.md section 8 'hard parts')."""
    h, w = hw
    guidance, blur, sparse = _problem(jax.random.key(7), 1, h, w)
    want = cspn_propagate_ref(guidance, blur, sparse, num_iters=6)
    got = cspn_propagate_pallas(guidance, blur, sparse, num_iters=6)
    _assert_close(got, want)


def test_pallas_norm_abs():
    guidance, blur, sparse = _problem(jax.random.key(9), 1, 12, 16)
    want = cspn_propagate_ref(guidance, blur, sparse, num_iters=8,
                              norm_type="8sum_abs")
    got = cspn_propagate_pallas(guidance, blur, sparse, num_iters=8,
                                norm_type="8sum_abs")
    _assert_close(got, want)


def test_pallas_channel_dim():
    guidance, blur, sparse = _problem(jax.random.key(11), 2, 10, 12)
    got = cspn_propagate_pallas(guidance, blur[..., None],
                                sparse[..., None], num_iters=3)
    want = cspn_propagate_ref(guidance, blur, sparse, num_iters=3)
    assert got.shape == blur.shape + (1,)
    _assert_close(got[..., 0], want)


@pytest.mark.parametrize("with_sparse", [True, False])
def test_pallas_grads_match_ref(with_sparse):
    """Custom-VJP gradients == autodiff through the jnp reference."""
    guidance, blur, sparse = _problem(jax.random.key(13), 1, 10, 14)
    sp = sparse if with_sparse else None

    def loss_pallas(g, d):
        return jnp.sum(cspn_propagate_pallas(g, d, sp, num_iters=5) ** 2)

    def loss_ref(g, d):
        return jnp.sum(cspn_propagate_ref(g, d, sp, num_iters=5) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(guidance, blur)
    gr = jax.grad(loss_ref, argnums=(0, 1))(guidance, blur)
    for a, b in zip(gp, gr):
        _assert_close(a, b, rtol=1e-4)


# ---------------------------------------------------------------- tiled
# H-tiled multi-launch kernel (KITTI-size images beyond the whole-plane
# VMEM budget): k-row recompute halo per launch must make every tile
# interior exact vs the unsharded reference.

from cspn_monodepth_tpu.ops.cspn_pallas import (  # noqa: E402
    cspn_propagate_pallas_tiled,
    pick_tile_h,
)


@pytest.mark.parametrize("num_iters", [1, 5, 24])
@pytest.mark.parametrize("with_sparse", [True, False])
def test_tiled_matches_ref(num_iters, with_sparse):
    guidance, blur, sparse = _problem(jax.random.key(num_iters), 2, 37, 48)
    sp = sparse if with_sparse else None
    want = cspn_propagate_ref(guidance, blur, sp, num_iters=num_iters)
    got = cspn_propagate_pallas_tiled(guidance, blur, sp,
                                      num_iters=num_iters, halo_k=4,
                                      tile_h=16)
    _assert_close(got, want)


@pytest.mark.parametrize("hw,tile_h,k", [
    ((13, 17), 8, 2),     # last tile mostly padding
    ((33, 30), 11, 4),    # H an exact multiple of tile_h
    ((57, 76), 57, 3),    # single tile (degenerate tiling)
])
def test_tiled_odd_sizes(hw, tile_h, k):
    h, w = hw
    guidance, blur, sparse = _problem(jax.random.key(7), 1, h, w)
    want = cspn_propagate_ref(guidance, blur, sparse, num_iters=6)
    got = cspn_propagate_pallas_tiled(guidance, blur, sparse, num_iters=6,
                                      halo_k=k, tile_h=tile_h)
    _assert_close(got, want)


def test_tiled_norm_types_and_channel_dim():
    guidance, blur, sparse = _problem(jax.random.key(9), 1, 20, 16)
    for norm in ("8sum", "8sum_abs", "8sum_clamp"):
        want = cspn_propagate_ref(guidance, blur, sparse, num_iters=8,
                                  norm_type=norm)
        got = cspn_propagate_pallas_tiled(guidance, blur[..., None],
                                          sparse[..., None], num_iters=8,
                                          norm_type=norm, halo_k=4,
                                          tile_h=8)
        assert got.shape == blur.shape + (1,)
        _assert_close(got[..., 0], want)


@pytest.mark.parametrize("with_sparse", [True, False])
def test_tiled_grads_match_ref(with_sparse):
    guidance, blur, sparse = _problem(jax.random.key(13), 1, 18, 14)
    sp = sparse if with_sparse else None

    def loss_tiled(g, d):
        return jnp.sum(cspn_propagate_pallas_tiled(
            g, d, sp, num_iters=5, halo_k=3, tile_h=6) ** 2)

    def loss_ref(g, d):
        return jnp.sum(cspn_propagate_ref(g, d, sp, num_iters=5) ** 2)

    gp = jax.grad(loss_tiled, argnums=(0, 1))(guidance, blur)
    gr = jax.grad(loss_ref, argnums=(0, 1))(guidance, blur)
    for a, b in zip(gp, gr):
        _assert_close(a, b, rtol=1e-4)


@pytest.mark.parametrize("norm", ["8sum", "8sum_clamp", "8sum_abs"])
@pytest.mark.parametrize("with_sparse", [True, False])
def test_tiled_adjoint_matches_ref_multitile(monkeypatch, norm, with_sparse):
    """The TILED Pallas adjoint (stash forward + per-tile reverse sweep,
    default backward for beyond-whole-plane-VMEM shapes): gradients must
    match jax.vjp of the reference with multiple tiles, halo'd lambda
    slabs, a remainder round (T=10, k=3 -> rounds 3+3+3+1), and bottom
    tile padding (h=50 not a tile multiple)."""
    import cspn_monodepth_tpu.ops.cspn_pallas as cp

    monkeypatch.setattr(cp, "pick_tile_h_bwd", lambda h, w, k, **kw: 16)
    guidance, blur, sparse = _problem(jax.random.key(31), 2, 50, 40)
    sp = sparse if with_sparse else None
    cot = jax.random.normal(jax.random.key(32), blur.shape, jnp.float32)

    def f_tiled(g, d, s):
        return jnp.vdot(cspn_propagate_pallas_tiled(
            g, d, s, num_iters=10, norm_type=norm, halo_k=3), cot)

    def f_ref(g, d, s):
        return jnp.vdot(cspn_propagate_ref(
            g, d, s, num_iters=10, norm_type=norm), cot)

    argnums = (0, 1) + ((2,) if with_sparse else ())
    gp = jax.grad(f_tiled, argnums)(guidance, blur, sp)
    gr = jax.grad(f_ref, argnums)(guidance, blur, sp)
    for a, b in zip(gp, gr):
        _assert_close(a, b, rtol=1e-4)


def test_tiled_scan_vjp_fallback_matches_ref(monkeypatch):
    """CSPN_PALLAS_ADJOINT=0 routes the tiled path's gradients through the
    jnp-scan VJP fallback; values and gradients must be unchanged."""
    monkeypatch.setenv("CSPN_PALLAS_ADJOINT", "0")
    guidance, blur, sparse = _problem(jax.random.key(33), 1, 24, 20)
    cot = jax.random.normal(jax.random.key(34), blur.shape, jnp.float32)

    def f_tiled(g, d, s):
        return jnp.vdot(cspn_propagate_pallas_tiled(
            g, d, s, num_iters=7, halo_k=3, tile_h=8), cot)

    def f_ref(g, d, s):
        return jnp.vdot(cspn_propagate_ref(g, d, s, num_iters=7), cot)

    gp = jax.grad(f_tiled, (0, 1, 2))(guidance, blur, sparse)
    gr = jax.grad(f_ref, (0, 1, 2))(guidance, blur, sparse)
    for a, b in zip(gp, gr):
        _assert_close(a, b, rtol=1e-4)


@pytest.mark.parametrize("with_sparse", [True, False])
def test_prenorm_adjoint_matches_ref(with_sparse):
    """The prenormalized slab kernel's hand adjoint (the spatially-sharded
    path's backward): dL/d(gates9) is returned directly — no normalization
    chain rule — and must match jax.vjp of cspn_propagate_prenorm_ref."""
    from cspn_monodepth_tpu.ops.cspn_pallas import (
        cspn_propagate_prenorm_pallas,
    )
    from cspn_monodepth_tpu.ops.cspn_ref import (
        cspn_propagate_prenorm_ref,
        normalize_affinity,
    )

    guidance, blur, sparse = _problem(jax.random.key(41), 2, 26, 30)
    gate, gc = normalize_affinity(guidance, "8sum_clamp")
    gates9 = jnp.moveaxis(jnp.concatenate([gc, gate], -1), -1, 1)
    sp = sparse if with_sparse else None
    cot = jax.random.normal(jax.random.key(42), blur.shape, jnp.float32)

    def f_p(g9, d, s):
        return jnp.vdot(cspn_propagate_prenorm_pallas(
            g9, d, s, num_iters=11), cot)

    def f_r(g9, d, s):
        return jnp.vdot(cspn_propagate_prenorm_ref(
            g9, d, s, num_iters=11), cot)

    argnums = (0, 1) + ((2,) if with_sparse else ())
    gp = jax.grad(f_p, argnums)(gates9, blur, sp)
    gr = jax.grad(f_r, argnums)(gates9, blur, sp)
    for a, b in zip(gp, gr):
        _assert_close(a, b, rtol=1e-4)


def test_prenorm_scan_vjp_fallback_matches_ref(monkeypatch):
    monkeypatch.setenv("CSPN_PALLAS_ADJOINT", "0")
    from cspn_monodepth_tpu.ops.cspn_pallas import (
        cspn_propagate_prenorm_pallas,
    )
    from cspn_monodepth_tpu.ops.cspn_ref import (
        cspn_propagate_prenorm_ref,
        normalize_affinity,
    )

    guidance, blur, sparse = _problem(jax.random.key(43), 1, 18, 22)
    gate, gc = normalize_affinity(guidance, "8sum")
    gates9 = jnp.moveaxis(jnp.concatenate([gc, gate], -1), -1, 1)
    cot = jax.random.normal(jax.random.key(44), blur.shape, jnp.float32)

    gp = jax.grad(lambda g: jnp.vdot(cspn_propagate_prenorm_pallas(
        g, blur, sparse, num_iters=6), cot))(gates9)
    gr = jax.grad(lambda g: jnp.vdot(cspn_propagate_prenorm_ref(
        g, blur, sparse, num_iters=6), cot))(gates9)
    _assert_close(gp, gr, rtol=1e-4)


def test_dispatcher_guidance_layout_all_impls():
    """cspn_propagate with guidance_layout="NCHW" (plane-major, the layout
    the packed head emits) must agree with the NHWC reference through
    every impl."""
    from cspn_monodepth_tpu.ops.cspn import cspn_propagate

    guidance, blur, sparse = _problem(jax.random.key(50), 1, 20, 24)
    g_pm = jnp.moveaxis(guidance, -1, 1)
    want = cspn_propagate_ref(guidance, blur, sparse, num_iters=6)
    for impl in ("jnp", "pallas", "pallas_tiled"):
        got = cspn_propagate(g_pm, blur, sparse, num_iters=6, impl=impl,
                             guidance_layout="NCHW")
        _assert_close(got, want, rtol=2e-5)


def test_pick_tile_h_budget():
    """Chosen slab planes must fit the stated VMEM budget."""
    for h, w in [(352, 1216), (228, 304), (1024, 2048)]:
        k = 8
        tile = pick_tile_h(h, w, k)
        assert 8 <= tile <= h
        slab = min(tile, h) + 2 * k
        assert 13 * 4 * slab * w <= 8 * 1024 * 1024 or tile == 8


# ------------------------------------------------------------- adjoint
# Hand-written Pallas backward (stash forward + gather adjoint-stencil
# kernel, DEFAULT ON): gradients must match jax.vjp of the jnp reference
# for every norm type, with and without anchors. (The adjoint was
# briefly deleted mid-round-3 on a biased microbenchmark whose chain
# consumed only the depth gradient — XLA DCE'd the scan VJP's
# guidance-gradient work while the opaque kernel paid full cost; an
# op-level trace of the real train step showed the scan VJP at ~30 ms
# vs ~8 ms for this kernel. See use_pallas_adjoint.)


@pytest.mark.parametrize("norm", ["8sum", "8sum_clamp", "8sum_abs"])
@pytest.mark.parametrize("with_sparse", [True, False])
def test_pallas_adjoint_matches_ref(norm, with_sparse):
    guidance, blur, sparse = _problem(jax.random.key(21), 2, 18, 22)
    sp = sparse if with_sparse else None
    cot = jax.random.normal(jax.random.key(22), blur.shape, jnp.float32)

    def f_pallas(g, d, s):
        return jnp.vdot(cspn_propagate_pallas(
            g, d, s, num_iters=24, norm_type=norm), cot)

    def f_ref(g, d, s):
        return jnp.vdot(cspn_propagate_ref(
            g, d, s, num_iters=24, norm_type=norm), cot)

    argnums = (0, 1) + ((2,) if with_sparse else ())
    gp = jax.grad(f_pallas, argnums)(guidance, blur, sp)
    gr = jax.grad(f_ref, argnums)(guidance, blur, sp)
    for a, b in zip(gp, gr):
        _assert_close(a, b, rtol=1e-4)


def test_pallas_scan_vjp_fallback_matches_ref(monkeypatch):
    """CSPN_PALLAS_ADJOINT=0 routes gradients through the jnp-scan VJP
    fallback; values and gradients must be unchanged."""
    monkeypatch.setenv("CSPN_PALLAS_ADJOINT", "0")
    guidance, blur, sparse = _problem(jax.random.key(24), 1, 16, 20)
    cot = jax.random.normal(jax.random.key(25), blur.shape, jnp.float32)

    def f_pallas(g, d, s):
        return jnp.vdot(cspn_propagate_pallas(g, d, s, num_iters=8), cot)

    def f_ref(g, d, s):
        return jnp.vdot(cspn_propagate_ref(g, d, s, num_iters=8), cot)

    gp = jax.grad(f_pallas, (0, 1, 2))(guidance, blur, sparse)
    gr = jax.grad(f_ref, (0, 1, 2))(guidance, blur, sparse)
    for a, b in zip(gp, gr):
        _assert_close(a, b, rtol=1e-4)


def test_pallas_vjp_channel_dim_and_value():
    """The custom-VJP path must not change the forward value; channel-dim
    inputs round-trip through the vjp machinery."""
    guidance, blur, sparse = _problem(jax.random.key(23), 1, 16, 20)

    def f(g, d, s):
        return cspn_propagate_pallas(g, d[..., None], s[..., None],
                                     num_iters=8)

    out, vjp = jax.vjp(f, guidance, blur, sparse)
    want = cspn_propagate_ref(guidance, blur, sparse, num_iters=8)
    _assert_close(out[..., 0], want)
    dg, dd, ds = vjp(jnp.ones_like(out))
    assert dg.shape == guidance.shape and dd.shape == blur.shape
