"""Sharding equivalence tests on the forced-8-device CPU mesh.

SURVEY.md section 5.2 item 4: spatially-sharded + halo-exchange CSPN must
equal the single-device op; the DP loss/grad must equal single-device
values on the same global batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from cspn_monodepth_tpu.configs import MeshConfig
from cspn_monodepth_tpu.ops import cspn_propagate_ref, uniform_sparse_sample
from cspn_monodepth_tpu.parallel import (
    batch_sharding,
    cspn_propagate_spatial,
    make_mesh,
    shard_batch,
)
from cspn_monodepth_tpu.train import masked_mse_loss


def _problem(key, b=2, h=32, w=24):
    kg, kd, ks = jax.random.split(key, 3)
    guidance = jax.random.normal(kg, (b, h, w, 8), jnp.float32)
    blur = jax.random.uniform(kd, (b, h, w), jnp.float32, 0.1, 10.0)
    dense = jax.random.uniform(ks, (b, h, w), jnp.float32, 0.1, 10.0)
    sparse = uniform_sparse_sample(ks, dense, num_samples=40)
    return guidance, blur, sparse


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
@pytest.mark.parametrize("halo_k", [1, 3, 4])
@pytest.mark.parametrize("with_sparse", [True, False])
def test_spatial_sharded_equals_single_device(halo_k, with_sparse, impl):
    mesh = make_mesh(MeshConfig(data=2, spatial=4))
    guidance, blur, sparse = _problem(jax.random.key(0))
    sp = sparse if with_sparse else None

    want = cspn_propagate_ref(guidance, blur, sp, num_iters=10)

    sh = batch_sharding(mesh, spatial_dim=1)
    gs = jax.device_put(guidance, sh)
    bs = jax.device_put(blur, sh)
    ss = jax.device_put(sparse, sh) if with_sparse else None
    got = cspn_propagate_spatial(
        gs, bs, ss, mesh=mesh, num_iters=10, halo_k=halo_k, impl=impl)

    # The fused slab kernel groups stencil taps by lane shift, so its f32
    # summation order differs from the scan reference — with random signed
    # gates the propagation is expansive (values reach ~1e3 by iteration
    # 10), so allow proportionally looser tolerance on the pallas path.
    tol = 2e-5 if impl == "jnp" else 2e-4
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=tol, atol=tol)


def test_spatial_auto_picks_fused_slab_kernel():
    """impl="auto" must route VMEM-fitting slabs to the fused kernel
    (SURVEY.md N2+N5 composition): the jaxpr of a small sharded run
    contains a pallas_call, and a forced-jnp run does not."""
    mesh = make_mesh(MeshConfig(data=2, spatial=4))
    guidance, blur, sparse = _problem(jax.random.key(4))

    def has_pallas(fn, *args):
        return "pallas_call" in str(jax.make_jaxpr(fn)(*args))

    assert has_pallas(
        lambda g, d, s: cspn_propagate_spatial(
            g, d, s, mesh=mesh, num_iters=10, impl="auto"),
        guidance, blur, sparse)
    assert not has_pallas(
        lambda g, d, s: cspn_propagate_spatial(
            g, d, s, mesh=mesh, num_iters=10, impl="jnp"),
        guidance, blur, sparse)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_spatial_sharded_grads_match(impl):
    mesh = make_mesh(MeshConfig(data=2, spatial=4))
    guidance, blur, sparse = _problem(jax.random.key(1), b=2, h=16, w=16)

    def loss_single(g, d):
        return jnp.sum(cspn_propagate_ref(g, d, sparse, num_iters=6) ** 2)

    def loss_sharded(g, d):
        return jnp.sum(
            cspn_propagate_spatial(
                g, d, sparse, mesh=mesh, num_iters=6, halo_k=2,
                impl=impl) ** 2)

    gg1, gd1 = jax.grad(loss_single, argnums=(0, 1))(guidance, blur)
    sh = batch_sharding(mesh, spatial_dim=1)
    gg2, gd2 = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
        jax.device_put(guidance, sh), jax.device_put(blur, sh))
    # pallas: looser for the kernel's different f32 summation order.
    rtol, atol = (1e-4, 1e-5) if impl == "jnp" else (5e-4, 1e-4)
    np.testing.assert_allclose(np.asarray(gg2), np.asarray(gg1),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(gd2), np.asarray(gd1),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
@pytest.mark.parametrize("h,n_spatial", [(29, 4), (228, 8)])
def test_spatial_auto_pads_non_divisible_h(h, n_spatial, impl):
    """SURVEY.md §8 hard parts: H not divisible by the shard count (NYU
    228 on a spatial=8 mesh) must zero-pad + crop, matching the unsharded
    op exactly — no assert, no caller-side padding."""
    mesh = make_mesh(MeshConfig(data=8 // n_spatial, spatial=n_spatial))
    guidance, blur, sparse = _problem(jax.random.key(5), b=2, h=h, w=24)

    want = cspn_propagate_ref(guidance, blur, sparse, num_iters=6)
    got = cspn_propagate_spatial(
        guidance, blur, sparse, mesh=mesh, num_iters=6, halo_k=2,
        impl=impl)
    assert got.shape == want.shape
    tol = 2e-5 if impl == "jnp" else 2e-4
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=tol, atol=tol)


def test_spatial_auto_pad_grads_match():
    """Gradients through the auto-padded path (pad + crop are linear, so
    the VJP must still match the unsharded reference)."""
    mesh = make_mesh(MeshConfig(data=2, spatial=4))
    guidance, blur, sparse = _problem(jax.random.key(6), b=2, h=21, w=16)

    def loss_single(g, d):
        return jnp.sum(cspn_propagate_ref(g, d, sparse, num_iters=6) ** 2)

    def loss_sharded(g, d):
        return jnp.sum(cspn_propagate_spatial(
            g, d, sparse, mesh=mesh, num_iters=6, halo_k=2) ** 2)

    gg1, gd1 = jax.grad(loss_single, argnums=(0, 1))(guidance, blur)
    gg2, gd2 = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
        guidance, blur)
    # atol covers near-zero elements whose f32 summation order shifts
    # through the pad/crop (values run ~1e2; 4/5376 elements at ~8e-5).
    np.testing.assert_allclose(np.asarray(gg2), np.asarray(gg1),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gd2), np.asarray(gd1),
                               rtol=1e-4, atol=2e-4)


def test_dp_loss_and_grad_match_single_device():
    """Data-parallel masked loss / grads == single-device on same batch."""
    mesh = make_mesh(MeshConfig(data=8, spatial=1))
    key = jax.random.key(2)
    pred = jax.random.uniform(key, (8, 12, 16), minval=0.1, maxval=9.0)
    target = jax.random.uniform(jax.random.key(3), (8, 12, 16),
                                minval=0.0, maxval=9.0)
    target = jnp.where(target > 2.0, target, 0.0)  # some invalid pixels

    w = jax.random.uniform(jax.random.key(4), (16, 16))

    def loss(w, pred, target):
        return masked_mse_loss(pred @ w, target)

    l1 = loss(w, pred, target)
    g1 = jax.grad(loss)(w, pred, target)

    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    l2, g2 = jax.jit(lambda w, p, t: (loss(w, p, t), jax.grad(loss)(w, p, t)),
                     out_shardings=(rep, rep))(
        jax.device_put(w, rep), jax.device_put(pred, sh),
        jax.device_put(target, sh))
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5)


def test_kitti_class_spatial_full_train_step(tmp_path):
    """VERDICT round-1 item 6: the FULL train step (encoder + decoder +
    spatially-sharded CSPN + loss + grads + optimizer), not just the CSPN
    op, through the kitti_1216 config's (data=2, spatial=4) mesh at a
    KITTI-class shape ABOVE the tiled-kernel VMEM threshold
    (ops/cspn.py: 13 * 4 * 256 * 832 = 11.1 MB > 10 MiB budget).
    The sharded loss must match the single-device loss on the same batch.
    """
    from cspn_monodepth_tpu.configs import get_config
    from cspn_monodepth_tpu.train.loop import Trainer

    h, w = 256, 832
    base = get_config("kitti_1216").override(**{
        "data.dataset": "synthetic", "data.height": h, "data.width": w,
        "data.num_samples": 100, "data.num_workers": 2,
        "model.arch": "", "model.encoder_stages": (1, 1, 1, 1),
        "model.encoder_width": 16,
        "model.decoder_channels": (32, 24, 16, 16), "model.decoder_out": 16,
        "model.cspn_impl": "jnp", "model.dtype": "float32",
        "model.num_iters": 8,
        "train.batch_size": 2,
        "train.checkpoint_dir": str(tmp_path),
    })
    assert base.mesh.data == 2 and base.mesh.spatial == 4  # kitti mesh

    rng_np = np.random.default_rng(0)
    batch = {
        "rgb": rng_np.random((2, h, w, 3), dtype=np.float32),
        "depth": rng_np.uniform(0.5, 80.0, (2, h, w)).astype(np.float32),
    }

    losses = {}
    for name, (d, s) in {"sharded": (2, 4), "single": (1, 1)}.items():
        cfg = base.override(**{"mesh.data": d, "mesh.spatial": s})
        tr = Trainer(cfg, workdir=str(tmp_path))
        state = tr.init_state()
        rng = jax.device_put(jax.random.key(0), tr._rep)
        _, loss, sums = tr.train_step(state, batch, rng)
        assert np.isfinite(float(loss))
        losses[name] = float(loss)
    np.testing.assert_allclose(losses["sharded"], losses["single"],
                               rtol=1e-4)


def test_parity_helpers_run_on_cpu():
    """Keep the bench's parity plumbing under CI: the routing asserts are
    backend-independent, and the prenorm parity check must execute (in
    interpret mode here; bench.py compiles it on the real chip)."""
    from cspn_monodepth_tpu.ops.parity import (
        prenorm_parity_check,
        vmem_routing_check,
    )

    assert all(vmem_routing_check().values())
    res = prenorm_parity_check(batch=1, h=16, w=32, num_iters=4)
    assert res["fwd_maxrel"] < 2e-5 and res["grad_maxrel"] < 2e-4


def test_shard_batch_utility():
    mesh = make_mesh(MeshConfig(data=4, spatial=2))
    batch = {"rgb": np.ones((8, 16, 16, 3), np.float32),
             "depth": np.ones((8, 16, 16), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["rgb"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out["depth"]), batch["depth"])


def _count_ppermutes(fn, *args):
    """Count ppermute primitives in the jaxpr of fn(*args), recursing into
    sub-jaxprs (shard_map bodies, scan bodies, custom-derivative calls)."""
    def walk(jaxpr):
        n = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "ppermute":
                n += 1
            for v in eqn.params.values():
                for sub in (v if isinstance(v, (list, tuple)) else [v]):
                    if hasattr(sub, "jaxpr"):       # ClosedJaxpr
                        n += walk(sub.jaxpr)
                    elif hasattr(sub, "eqns"):      # Jaxpr
                        n += walk(sub)
        return n
    return walk(jax.make_jaxpr(fn)(*args).jaxpr)


@pytest.mark.parametrize("halo_k,num_iters", [(1, 12), (4, 12), (4, 10), (6, 24)])
def test_halo_exchange_count_matches_amortization_math(halo_k, num_iters):
    """Keep the N2 cost model honest (parallel/halo.py:9-16): a k-amortized
    run must exchange depth halos exactly ceil(T/k) times, plus ONE upfront
    exchange each for gates and sparse (iteration-invariant; the anchor
    mask is pointwise (sp > 0) so it is derived from the sparse slab, not
    exchanged). Each _exchange_halo is 2 ppermutes (up + down), so:
        sparse path:  2 * (2 + ceil(T/k)) ppermutes
        dense  path:  2 * (1 + ceil(T/k)) ppermutes
    A per-iteration scheme would pay 2*T — the whole point of k-amortization
    is the ceil(T/k) factor, so a regression here is a real perf bug even
    though single-host tests can't time ICI."""
    mesh = make_mesh(MeshConfig(data=2, spatial=4))
    guidance, blur, sparse = _problem(jax.random.key(2), b=2, h=32, w=16)
    rounds = -(-num_iters // halo_k)  # ceil

    n_sparse = _count_ppermutes(
        lambda g, d, s: cspn_propagate_spatial(
            g, d, s, mesh=mesh, num_iters=num_iters, halo_k=halo_k),
        guidance, blur, sparse)
    assert n_sparse == 2 * (2 + rounds), (n_sparse, rounds)

    n_dense = _count_ppermutes(
        lambda g, d: cspn_propagate_spatial(
            g, d, None, mesh=mesh, num_iters=num_iters, halo_k=halo_k),
        guidance, blur)
    assert n_dense == 2 * (1 + rounds), (n_dense, rounds)


def test_spatial_train_step_with_fused_slab_kernel(tmp_path):
    """The FULL train step through the (data=2, spatial=4) mesh with the
    spatially-sharded CSPN running the fused Pallas slab kernel and its
    prenorm hand adjoint (cspn_impl=auto -> impl=auto picks pallas for
    VMEM-fitting slabs; interpret mode on this CPU mesh). Loss must match
    the jnp slab body on the same batch — the N2+N5 composition inside
    the real Trainer, gradients included."""
    from cspn_monodepth_tpu.configs import get_config
    from cspn_monodepth_tpu.train.loop import Trainer

    h, w = 64, 48
    base = get_config("kitti_1216").override(**{
        "data.dataset": "synthetic", "data.height": h, "data.width": w,
        "data.num_samples": 40, "data.num_workers": 2,
        "model.arch": "", "model.encoder_stages": (1, 1, 1, 1),
        "model.encoder_width": 16,
        "model.decoder_channels": (32, 24, 16, 16), "model.decoder_out": 16,
        "model.dtype": "float32", "model.num_iters": 6,
        "train.batch_size": 2,
        "train.checkpoint_dir": str(tmp_path),
        "mesh.data": 2, "mesh.spatial": 4,
    })
    rng_np = np.random.default_rng(1)
    batch = {
        "rgb": rng_np.random((2, h, w, 3), dtype=np.float32),
        "depth": rng_np.uniform(0.5, 9.5, (2, h, w)).astype(np.float32),
    }
    losses = {}
    for impl in ("jnp", "auto"):
        cfg = base.override(**{"model.cspn_impl": impl})
        tr = Trainer(cfg, workdir=str(tmp_path / impl))
        state = tr.init_state()
        rng = jax.device_put(jax.random.key(0), tr._rep)
        _, loss, _ = tr.train_step(state, batch, rng)
        assert np.isfinite(float(loss)), impl
        losses[impl] = float(loss)
    np.testing.assert_allclose(losses["auto"], losses["jnp"], rtol=1e-5)
