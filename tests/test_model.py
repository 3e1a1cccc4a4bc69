"""Model construction/forward tests (SURVEY.md R3-R5, section 4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cspn_monodepth_tpu.models import CSPNDepthNet, ResNetEncoder

# Tiny architecture for fast XLA-CPU compiles; the full ResNet-50 arch is
# covered by eval_shape-based tests (no compile) and by the TPU benchmarks.
TINY = dict(arch=None, encoder_stages=(1, 1, 1, 1), encoder_width=16,
            decoder_channels=(32, 24, 16, 16), decoder_out=16)


def test_encoder_pyramid_shapes():
    """Full ResNet-50 pyramid shapes — via eval_shape (no XLA compile)."""
    enc = ResNetEncoder(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    variables = jax.eval_shape(lambda: enc.init(jax.random.key(0), x,
                                                train=False))
    stem, c1, c2, c3, c4 = jax.eval_shape(
        lambda v, xx: enc.apply(v, xx, train=False), variables, x)
    assert stem.shape == (1, 32, 48, 64)
    assert c1.shape == (1, 16, 24, 256)
    assert c2.shape == (1, 8, 12, 512)
    assert c3.shape == (1, 4, 6, 1024)
    assert c4.shape == (1, 2, 3, 2048)


def test_encoder_odd_input():
    """228x304-style odd sizes must flow through; tiny encoder, compiled."""
    enc = ResNetEncoder(stage_sizes=(1, 1, 1, 1), width=16,
                        dtype=jnp.float32)
    x = jnp.zeros((1, 57, 76, 3))
    variables = enc.init(jax.random.key(0), x, train=False)
    skips = enc.apply(variables, x, train=False)
    assert skips[-1].shape[1:3] == (2, 3)  # ceil(57/32), ceil(76/32)


@pytest.mark.parametrize("modality,ch", [("rgb", 3), ("rgbd", 4), ("d", 1)])
def test_model_forward_modalities(modality, ch):
    model = CSPNDepthNet(modality=modality, num_iters=2, cspn_impl="jnp",
                         dtype=jnp.float32, **TINY)
    x = jax.random.uniform(jax.random.key(0), (1, 32, 48, ch))
    variables = model.init(jax.random.key(1), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 48, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_model_param_count_resnet50_scale():
    """ResNet-50 backbone alone is ~23.5M params; the full model with the
    UpProj decoder should land in the 40-90M range — catches accidentally
    tiny/huge architectures."""
    model = CSPNDepthNet(modality="rgbd", num_iters=1, cspn_impl="jnp",
                         dtype=jnp.float32)
    x = jnp.zeros((1, 32, 48, 4))
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x,
                                                  train=False))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree.leaves(variables["params"]))
    assert 30e6 < n < 120e6, f"{n/1e6:.1f}M params"


def test_model_anchors_preserved():
    """rgbd: sparse anchor pixels must appear exactly in the output."""
    model = CSPNDepthNet(modality="rgbd", num_iters=4, cspn_impl="jnp",
                         dtype=jnp.float32, **TINY)
    rgb = jax.random.uniform(jax.random.key(0), (1, 32, 48, 3))
    sparse = jnp.zeros((1, 32, 48, 1)).at[0, 10, 20, 0].set(3.5)
    x = jnp.concatenate([rgb, sparse], axis=-1)
    variables = model.init(jax.random.key(1), x, train=False)
    out = model.apply(variables, x, train=False)
    np.testing.assert_allclose(float(out[0, 10, 20, 0]), 3.5, rtol=1e-5)


def test_model_train_mode_updates_batch_stats():
    model = CSPNDepthNet(modality="rgb", num_iters=1, cspn_impl="jnp",
                         dtype=jnp.float32, **TINY)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 48, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_encoder_resnet18_pyramid_shapes():
    """ResNet-18 (basic-block) pyramid: 64/128/256/512 skips, same strides.

    The upstream CSPN repo ships resnet18 and resnet50 model variants."""
    from cspn_monodepth_tpu.models.resnet import ARCHS

    stages, block = ARCHS["resnet18"]
    enc = ResNetEncoder(stage_sizes=stages, block=block, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    variables = jax.eval_shape(lambda: enc.init(jax.random.key(0), x,
                                                train=False))
    stem, c1, c2, c3, c4 = jax.eval_shape(
        lambda v, xx: enc.apply(v, xx, train=False), variables, x)
    assert stem.shape == (1, 32, 48, 64)
    assert c1.shape == (1, 16, 24, 64)
    assert c2.shape == (1, 8, 12, 128)
    assert c3.shape == (1, 4, 6, 256)
    assert c4.shape == (1, 2, 3, 512)


def test_model_arch_resnet18_param_count():
    """resnet18 full model must be much smaller than resnet50's (~11M
    backbone vs ~23.5M) and still run end-to-end via eval_shape."""
    m18 = CSPNDepthNet(modality="rgbd", num_iters=1, cspn_impl="jnp",
                       dtype=jnp.float32, arch="resnet18")
    m50 = CSPNDepthNet(modality="rgbd", num_iters=1, cspn_impl="jnp",
                       dtype=jnp.float32, arch="resnet50")
    x = jnp.zeros((1, 32, 48, 4))

    def count(m):
        v = jax.eval_shape(lambda: m.init(jax.random.key(0), x, train=False))
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))

    n18, n50 = count(m18), count(m50)
    assert n18 < 0.7 * n50, (n18, n50)
    out = jax.eval_shape(
        lambda: m18.init(jax.random.key(0), x, train=False))
    assert "encoder" in out["params"]


def test_upconv_subpixel_equivalence():
    """Sub-pixel decomposed up-conv == naive 5x5 SAME conv on the
    nearest-2x-upsampled map, including borders (all-f32, tight tol)."""
    from jax import lax

    from cspn_monodepth_tpu.models.unet import (
        _upsample2x,
        upconv5x5_subpixel,
    )

    rng = np.random.default_rng(0)
    for h, w, cin, cout in [(5, 7, 3, 4), (8, 8, 2, 2), (11, 6, 1, 5)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(5, 5, cin, cout)).astype(np.float32))
        want = lax.conv_general_dilated(
            _upsample2x(x), k, (1, 1), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = upconv5x5_subpixel(x, k, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_model_decoder_upconv():
    """Simple_Gudi_UpConv_Block decoder variant runs end-to-end and is
    smaller than the two-branch UpProj decoder."""
    mk = lambda blk: CSPNDepthNet(  # noqa: E731
        modality="rgbd", num_iters=2, cspn_impl="jnp", dtype=jnp.float32,
        decoder_block=blk, **TINY)
    x = jax.random.uniform(jax.random.key(0), (1, 32, 48, 4))
    m = mk("upconv")
    variables = m.init(jax.random.key(1), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 32, 48, 1)
    assert bool(jnp.all(jnp.isfinite(out)))

    def count(m):
        v = jax.eval_shape(lambda: m.init(jax.random.key(0), x, train=False))
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))

    assert count(mk("upconv")) < count(mk("upproj"))


def test_pack_conv_kernel_equivalence():
    """conv over the space-to-depth packed map with the parity-routed
    kernel == space-to-depth of the full-res SAME conv, borders included
    (3x3 and 5x5 kernels)."""
    from jax import lax

    from cspn_monodepth_tpu.models.unet import (
        pack_conv_kernel,
        space_to_depth,
    )

    rng = np.random.default_rng(1)
    for h, w, cin, cout, ks in [(6, 8, 3, 5, 3), (10, 12, 2, 4, 5),
                                (8, 6, 1, 1, 3)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(ks, ks, cin, cout)).astype(np.float32))
        p = ks // 2
        want = space_to_depth(lax.conv_general_dilated(
            x, k, (1, 1), padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        got = lax.conv_general_dilated(
            space_to_depth(x), pack_conv_kernel(k), (1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_packed_batch_norm_equivalence():
    """PackedBatchNorm on the packed map == nn.BatchNorm on the full-res
    map (train + eval), including the running-stat updates."""
    import flax.linen as nn

    from cspn_monodepth_tpu.models.unet import (
        PackedBatchNorm,
        depth_to_space,
        space_to_depth,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 6)).astype(np.float32) * 3 + 1)
    xp = space_to_depth(x)

    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
    packed = PackedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32)

    vr = ref.init(jax.random.key(0), x, use_running_average=False)
    vp = packed.init(jax.random.key(0), xp, train=True)
    assert jax.tree.structure(vr) == jax.tree.structure(vp)
    # nontrivial scale/bias
    vr = {"params": {"scale": jnp.asarray([1.5, 0.5, 2.0, 1.0, 0.7, 1.2]),
                     "bias": jnp.asarray([0.1, -0.2, 0.3, 0.0, 0.5, -0.1])},
          "batch_stats": vr["batch_stats"]}

    want, mut_r = ref.apply(vr, x, use_running_average=False,
                            mutable=["batch_stats"])
    got, mut_p = packed.apply(vr, xp, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(depth_to_space(got)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut_p["batch_stats"][k]),
            np.asarray(mut_r["batch_stats"][k]), rtol=1e-5, atol=1e-6)

    # eval mode with the updated running stats
    vr2 = {"params": vr["params"], "batch_stats": mut_r["batch_stats"]}
    want_e = ref.apply(vr2, x, use_running_average=True)
    got_e = packed.apply(vr2, xp, train=False)
    np.testing.assert_allclose(np.asarray(depth_to_space(got_e)),
                               np.asarray(want_e), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("train", [False, True])
def test_model_packed_tail_equivalence(train):
    """packed_tail=True == packed_tail=False on the full model: identical
    parameter trees, matching outputs and batch-stat updates (f32)."""
    mk = lambda p: CSPNDepthNet(  # noqa: E731
        modality="rgbd", num_iters=2, cspn_impl="jnp", dtype=jnp.float32,
        packed_tail=p, **TINY)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 48, 4))
    m0, m1 = mk(False), mk(True)
    v0 = m0.init(jax.random.key(1), x, train=False)
    v1 = m1.init(jax.random.key(1), x, train=False)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # Make heads nonzero so CSPN is exercised beyond identity.
    v = jax.tree.map(np.asarray, v0)
    rng = np.random.default_rng(3)
    for name in ("depth_head_kernel", "guidance_head_kernel"):
        v["params"][name] = (
            0.1 * rng.standard_normal(v["params"][name].shape)
        ).astype(np.float32)

    if train:
        out0, mut0 = m0.apply(v, x, train=True, mutable=["batch_stats"])
        out1, mut1 = m1.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)
    else:
        out0 = m0.apply(v, x, train=False)
        out1 = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-4, atol=2e-4)


def test_model_packed_tail_odd_size_falls_back():
    """Odd spatial sizes can't pack 2x2; the model must still run (the
    decoder falls back to the unpacked final block)."""
    model = CSPNDepthNet(modality="rgb", num_iters=1, cspn_impl="jnp",
                         dtype=jnp.float32, packed_tail=True, **TINY)
    x = jax.random.uniform(jax.random.key(0), (1, 31, 49, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 31, 49, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pack_stride2_conv_kernel_equivalence():
    """Stride-1 conv over the DOUBLE space-to-depth input with the routed
    kernel == space-to-depth of the stride-2 symmetric-padded conv (the
    packed encoder stem's conv1), borders included, 7x7 and 5x5."""
    from jax import lax

    from cspn_monodepth_tpu.models.unet import (
        pack_stride2_conv_kernel,
        space_to_depth,
    )

    rng = np.random.default_rng(4)
    for h, w, cin, cout, ks in [(16, 24, 4, 6, 7), (12, 8, 3, 5, 5),
                                (8, 8, 1, 2, 7)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(ks, ks, cin, cout)).astype(np.float32))
        p = ks // 2
        want = space_to_depth(lax.conv_general_dilated(
            x, k, (2, 2), padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        got = lax.conv_general_dilated(
            space_to_depth(space_to_depth(x)), pack_stride2_conv_kernel(k),
            (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_packed_stem_maxpool_equivalence():
    """packed_stem_maxpool on the s2d map == nn.max_pool(3x3, stride 2,
    pad 1) on the full-res map, negative values included."""
    import flax.linen as nn

    from cspn_monodepth_tpu.models.resnet import packed_stem_maxpool
    from cspn_monodepth_tpu.models.unet import space_to_depth

    rng = np.random.default_rng(5)
    for h, w, c in [(14, 20, 5), (8, 8, 3)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
        want = nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))
        got = packed_stem_maxpool(space_to_depth(x), c)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("packed_tail", [True, False])
@pytest.mark.parametrize("train", [False, True])
def test_model_packed_stem_equivalence(train, packed_tail):
    """packed_stem=True == packed_stem=False on the full model (f32):
    identical parameter trees, matching outputs and batch-stat updates.
    Exercises the packed conv1 + PackedBatchNorm stem + packed maxpool +
    the packed-skip path into the final up blocks (packed_tail=True) AND
    the depth-to-space fallback where an unpacked block consumes the
    packed stem (packed_tail=False)."""
    mk = lambda ps: CSPNDepthNet(  # noqa: E731
        modality="rgbd", num_iters=2, cspn_impl="jnp", dtype=jnp.float32,
        packed_tail=packed_tail, packed_stem=ps, **TINY)
    x = jax.random.uniform(jax.random.key(7), (2, 32, 48, 4))
    m0, m1 = mk(False), mk(True)
    v0 = m0.init(jax.random.key(1), x, train=False)
    v1 = m1.init(jax.random.key(1), x, train=False)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape

    v = jax.tree.map(np.asarray, v0)
    rng = np.random.default_rng(8)
    for name in ("depth_head_kernel", "guidance_head_kernel"):
        v["params"][name] = (
            0.1 * rng.standard_normal(v["params"][name].shape)
        ).astype(np.float32)

    if train:
        out0, mut0 = m0.apply(v, x, train=True, mutable=["batch_stats"])
        out1, mut1 = m1.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)
    else:
        out0 = m0.apply(v, x, train=False)
        out1 = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-4, atol=2e-4)


def test_model_packed_stem_indivisible_falls_back():
    """H or W not divisible by 4: the packed stem must gate itself off and
    the model still runs (30x48: 30 % 4 != 0)."""
    model = CSPNDepthNet(
        modality="rgbd", num_iters=1, cspn_impl="jnp", dtype=jnp.float32,
        packed_tail=True, packed_stem=True, **TINY)
    x = jax.random.uniform(jax.random.key(9), (1, 30, 48, 4))
    v = model.init(jax.random.key(1), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 30, 48, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("train", [False, True])
def test_wpacked_conv1b_equivalence(train):
    """PackedUpProjBlock(wpack_conv1b=True): conv1b in W-only (1x2)
    packing — 2x structural MACs on full lanes with row-repack copies —
    must be numerically equivalent to the 2x2-packed default, with the
    SAME parameter/batch-stats tree (bn1b pools stats across 2 parity
    blocks instead of 4; shapes are per real channel either way).
    Default OFF after measuring a regression on v5e (see the field's
    docstring); kept correct under test for future re-evaluation."""
    from cspn_monodepth_tpu.models.unet import PackedUpProjBlock

    x = jax.random.uniform(jax.random.key(5), (2, 10, 12, 24))  # cin=24
    mk = lambda wp: PackedUpProjBlock(  # noqa: E731
        16, dtype=jnp.float32, wpack_conv1b=wp)
    m0, m1 = mk(False), mk(True)
    v0 = m0.init(jax.random.key(6), x, train=False)
    v1 = m1.init(jax.random.key(6), x, train=False)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # Randomize every leaf but keep them valid: batch-stats variances must
    # stay positive or rsqrt produces NaNs that compare vacuously equal.
    v = jax.tree.map(
        lambda a: np.abs(np.random.default_rng(7).standard_normal(
            a.shape)).astype(np.float32) * 0.1 + 0.01, v0)
    if train:
        out0, mut0 = m0.apply(v, x, train=True, mutable=["batch_stats"])
        out1, mut1 = m1.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)
    else:
        out0 = m0.apply(v, x, train=False)
        out1 = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-4, atol=2e-4)
