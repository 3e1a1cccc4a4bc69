"""Native C++ augmentation kernel: build, parity vs the numpy reference,
and geometric properties of the fused affine (SURVEY.md R10).

The numpy `affine_resample` is the oracle; the ctypes kernel must match
it bitwise for nearest (depth) sampling and to float32 rounding for
bilinear (rgb).
"""

import numpy as np
import pytest

from cspn_monodepth_tpu import native
from cspn_monodepth_tpu.data.transforms import (
    affine_resample,
    compose_affine,
    resample_pair,
    train_transform,
)

requires_native = pytest.mark.skipif(
    native.lib() is None, reason="no C++ compiler available")


def _cases():
    return [
        dict(in_hw=(480, 640), resized_hw=(304, 405), out_hw=(228, 304),
             deg=4.2, crop="center", hflip=False),
        dict(in_hw=(480, 640), resized_hw=(240, 320), out_hw=(228, 304),
             deg=-3.7, crop="center", hflip=True),
        dict(in_hw=(375, 1242), resized_hw=(375, 1242), out_hw=(352, 1216),
             deg=0.0, crop="bottom", hflip=True),
        dict(in_hw=(100, 90), resized_hw=(130, 117), out_hw=(96, 112),
             deg=5.0, crop="center", hflip=False),
    ]


@requires_native
@pytest.mark.parametrize("case", _cases())
def test_native_bilinear_matches_numpy(case):
    rng = np.random.default_rng(0)
    h, w = case["in_hw"]
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    coef = compose_affine(case["in_hw"], case["resized_hw"], case["out_hw"],
                          deg=case["deg"], crop=case["crop"],
                          hflip=case["hflip"])
    oh, ow = case["out_hw"]
    gain = rng.uniform(0.8, 1.2, 3).astype(np.float32) / 255.0

    ref = affine_resample(rgb, coef, oh, ow, gain=gain, clip=(0.0, 1.0))

    from cspn_monodepth_tpu.data.transforms import _native_rgb
    lib = native.lib()
    # uint8-source kernel
    got_u8 = _native_rgb(lib, rgb, coef, oh, ow, gain, (0.0, 1.0))
    np.testing.assert_allclose(got_u8, ref, atol=1e-5)
    # float32-source kernel
    got_f32 = _native_rgb(lib, rgb.astype(np.float32), coef, oh, ow, gain,
                          (0.0, 1.0))
    np.testing.assert_allclose(got_f32, ref, atol=1e-5)


@requires_native
@pytest.mark.parametrize("case", _cases())
def test_native_nearest_matches_numpy_bitwise(case):
    rng = np.random.default_rng(1)
    h, w = case["in_hw"]
    depth = (rng.uniform(0, 10, (h, w)) * (rng.random((h, w)) > 0.5)).astype(
        np.float32)
    coef = compose_affine(case["in_hw"], case["resized_hw"], case["out_hw"],
                          deg=case["deg"], crop=case["crop"],
                          hflip=case["hflip"])
    oh, ow = case["out_hw"]
    ref = affine_resample(depth, coef, oh, ow, nearest=True, scale=0.75)

    from cspn_monodepth_tpu.data.transforms import _native_depth
    got = _native_depth(native.lib(), depth, coef, oh, ow, 0.75)
    # identical index selection (same float32 coord math + rint) => bitwise
    np.testing.assert_array_equal(got, ref)


def test_identity_affine_is_identity():
    rng = np.random.default_rng(2)
    img = rng.random((40, 56, 3)).astype(np.float32)
    coef = compose_affine((40, 56), (40, 56), (40, 56))
    out = affine_resample(img, coef, 40, 56, gain=np.ones(3, np.float32))
    np.testing.assert_allclose(out, img, atol=1e-6)
    d = rng.random((40, 56)).astype(np.float32)
    out_d = affine_resample(d, coef, 40, 56, nearest=True)
    np.testing.assert_array_equal(out_d, d)


def test_hflip_affine_mirrors():
    rng = np.random.default_rng(3)
    d = rng.random((32, 48)).astype(np.float32)
    c = compose_affine((32, 48), (32, 48), (32, 48), hflip=True)
    out = affine_resample(d, c, 32, 48, nearest=True)
    np.testing.assert_array_equal(out, d[:, ::-1])


def test_bottom_crop_affine():
    rng = np.random.default_rng(4)
    d = rng.random((32, 48)).astype(np.float32)
    c = compose_affine((32, 48), (32, 48), (20, 40), crop="bottom")
    out = affine_resample(d, c, 20, 40, nearest=True)
    np.testing.assert_array_equal(out, d[12:, 4:44])


def test_rotation_border_is_zero():
    d = np.ones((64, 64), np.float32)
    c = compose_affine((64, 64), (64, 64), (64, 64), deg=10.0)
    out = affine_resample(d, c, 64, 64, nearest=True)
    assert out[0, 0] == 0.0 and out[-1, -1] == 0.0  # corners rotate outside
    assert out[32, 32] == 1.0                        # center stays


def test_resample_pair_native_and_numpy_agree():
    """End-to-end: the dispatcher's two executors agree on a full record."""
    if native.lib() is None:
        pytest.skip("no C++ compiler available")
    import cspn_monodepth_tpu.native as nat

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    depth = rng.uniform(0, 10, (120, 160)).astype(np.float32)
    coef = compose_affine((120, 160), (80, 106), (72, 96), deg=2.0)
    gain = np.full(3, 1.1, np.float32) / 255.0

    got = resample_pair(rgb, depth, coef, 72, 96, gain=gain,
                        depth_scale=0.9)
    # force the numpy path
    saved = nat.lib
    nat.lib = lambda: None
    try:
        ref = resample_pair(rgb, depth, coef, 72, 96, gain=gain,
                            depth_scale=0.9)
    finally:
        nat.lib = saved
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)
    np.testing.assert_array_equal(got[1], ref[1])


def test_train_transform_still_matches_spec():
    """Scale aug divides depth by s; output ranges are sane (regression of
    the staged-pipeline behavior on the fused implementation)."""
    rng_img = np.random.default_rng(6)
    rgb = rng_img.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    depth = np.full((96, 128), 4.0, np.float32)
    rgbs, depths = [], []
    for seed in range(24):
        r, d = train_transform(rgb, depth, np.random.default_rng(seed),
                               out_h=64, out_w=80, rotate_deg=0.0,
                               scale_max=1.5, hflip_prob=0.0, jitter=0.0)
        rgbs.append(r)
        depths.append(d)
    vals = np.array([d[d > 0].max() for d in depths])
    # depth/s for s in [1, 1.5]: values in [4/1.5, 4]
    assert (vals <= 4.0 + 1e-5).all() and (vals >= 4.0 / 1.5 - 1e-5).all()
    assert len({float(v) for v in vals}) > 4  # s actually varies
    assert all(r.min() >= 0 and r.max() <= 1 for r in rgbs)
