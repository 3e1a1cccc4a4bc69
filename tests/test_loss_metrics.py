"""Loss + metrics tests vs straightforward numpy (SURVEY.md R11/R12)."""

import jax
import jax.numpy as jnp
import numpy as np

from cspn_monodepth_tpu.train import (
    MetricSums,
    finalize_metrics,
    get_loss_fn,
    masked_l1_loss,
    masked_mse_loss,
    metric_sums_from_batch,
)


def _problem():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.5, 9.5, (2, 8, 10)).astype(np.float32)
    target = rng.uniform(0.0, 9.5, (2, 8, 10)).astype(np.float32)
    target[target < 2.0] = 0.0  # invalid pixels
    return jnp.asarray(pred), jnp.asarray(target)


def test_masked_mse_matches_numpy():
    pred, target = _problem()
    m = np.asarray(target) > 0
    want = np.mean((np.asarray(pred)[m] - np.asarray(target)[m]) ** 2)
    np.testing.assert_allclose(float(masked_mse_loss(pred, target)), want,
                               rtol=1e-6)


def test_masked_l1_matches_numpy():
    pred, target = _problem()
    m = np.asarray(target) > 0
    want = np.mean(np.abs(np.asarray(pred)[m] - np.asarray(target)[m]))
    np.testing.assert_allclose(float(masked_l1_loss(pred, target)), want,
                               rtol=1e-6)


def test_loss_ignores_invalid_pixels():
    pred, target = _problem()
    crazy = pred.at[np.asarray(target) == 0].set(1e6)
    np.testing.assert_allclose(float(masked_mse_loss(pred, target)),
                               float(masked_mse_loss(crazy, target)),
                               rtol=1e-6)


def test_all_invalid_target_gives_zero_loss():
    pred = jnp.ones((1, 4, 4))
    target = jnp.zeros((1, 4, 4))
    assert float(masked_mse_loss(pred, target)) == 0.0


def test_get_loss_fn():
    assert get_loss_fn("masked_mse") is masked_mse_loss
    assert get_loss_fn("masked_l1") is masked_l1_loss
    try:
        get_loss_fn("nope")
        assert False
    except ValueError:
        pass


def _numpy_result_evaluate(p, t, max_depth=0.0):
    """The reference's `Result.evaluate` for ONE image (SURVEY.md R12):
    metrics over this image's valid pixels."""
    m = t > 0
    if max_depth > 0:
        m &= t <= max_depth
    pm, tm = np.maximum(p[m], 1e-3), t[m]
    ratio = np.maximum(pm / tm, tm / pm)
    inv_p, inv_g = 1000.0 / pm, 1000.0 / tm
    return {
        "rmse": np.sqrt(np.mean((pm - tm) ** 2)),
        "mae": np.mean(np.abs(pm - tm)),
        "rel": np.mean(np.abs(pm - tm) / tm),
        "lg10": np.mean(np.abs(np.log10(pm) - np.log10(tm))),
        "delta1": np.mean(ratio < 1.25),
        "delta2": np.mean(ratio < 1.25 ** 2),
        "delta3": np.mean(ratio < 1.25 ** 3),
        "irmse": np.sqrt(np.mean((inv_p - inv_g) ** 2)),
        "imae": np.mean(np.abs(inv_p - inv_g)),
    }


def test_metrics_match_numpy_reference_pixel_protocol():
    pred, target = _problem()
    got = finalize_metrics(
        metric_sums_from_batch(pred, target, protocol="pixel"))

    p, t = np.asarray(pred, np.float64), np.asarray(target, np.float64)
    m = t > 0
    pm, tm = p[m], t[m]
    np.testing.assert_allclose(got["rmse"], np.sqrt(np.mean((pm - tm) ** 2)),
                               rtol=1e-5)
    np.testing.assert_allclose(got["mae"], np.mean(np.abs(pm - tm)), rtol=1e-5)
    np.testing.assert_allclose(got["rel"], np.mean(np.abs(pm - tm) / tm),
                               rtol=1e-5)
    np.testing.assert_allclose(
        got["lg10"], np.mean(np.abs(np.log10(pm) - np.log10(tm))), rtol=1e-5)
    ratio = np.maximum(pm / tm, tm / pm)
    for i, key in enumerate(["delta1", "delta2", "delta3"], 1):
        np.testing.assert_allclose(got[key],
                                   np.mean(ratio < 1.25 ** i), rtol=1e-5)
    inv_p, inv_g = 1000.0 / pm, 1000.0 / tm
    np.testing.assert_allclose(got["irmse"],
                               np.sqrt(np.mean((inv_p - inv_g) ** 2)),
                               rtol=1e-5)
    np.testing.assert_allclose(got["imae"], np.mean(np.abs(inv_p - inv_g)),
                               rtol=1e-5)


def test_metrics_match_reference_per_image_protocol():
    """Default protocol == reference Result.evaluate per image, then
    AverageMeter mean across images (VERDICT round-1 item 2)."""
    pred, target = _problem()
    got = finalize_metrics(metric_sums_from_batch(pred, target))

    p, t = np.asarray(pred, np.float64), np.asarray(target, np.float64)
    per_img = [_numpy_result_evaluate(p[i], t[i]) for i in range(p.shape[0])]
    for k in per_img[0]:
        want = np.mean([r[k] for r in per_img])
        np.testing.assert_allclose(got[k], want, rtol=1e-5, err_msg=k)
    assert got["n_images"] == p.shape[0]


def test_metrics_protocols_differ_on_unbalanced_images():
    """Jensen: per-image RMSE mean != global-pixel RMSE when images have
    different valid-pixel counts/errors — guard that both paths are live."""
    pred = jnp.ones((2, 4, 4)) * 2.0
    target = np.ones((2, 4, 4), np.float32)
    target[1, :, :2] = 0.0       # image 2 has half the valid pixels
    target[1] *= 4.0             # and 4x the scale
    target = jnp.asarray(target)
    img = finalize_metrics(metric_sums_from_batch(pred, target))
    pix = finalize_metrics(
        metric_sums_from_batch(pred, target, protocol="pixel"))
    assert abs(img["rmse"] - pix["rmse"]) > 1e-3


def test_metrics_exclude_padded_images():
    pred, target = _problem()
    valid = jnp.asarray([1.0, 0.0])
    got = finalize_metrics(
        metric_sums_from_batch(pred, target, valid_image=valid))
    only_first = finalize_metrics(
        metric_sums_from_batch(pred[:1], target[:1]))
    assert got["n_images"] == 1
    for k in ("rmse", "mae", "rel", "delta1", "irmse"):
        np.testing.assert_allclose(got[k], only_first[k], rtol=1e-6)


def test_metrics_eval_max_depth_cap():
    """KITTI eval cap (SURVEY.md section 4.4): gt > cap excluded."""
    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.uniform(1, 90, (2, 8, 10)).astype(np.float32))
    target = jnp.asarray(rng.uniform(1, 90, (2, 8, 10)).astype(np.float32))
    got = finalize_metrics(
        metric_sums_from_batch(pred, target, max_depth=80.0))
    p, t = np.asarray(pred, np.float64), np.asarray(target, np.float64)
    per_img = [_numpy_result_evaluate(p[i], t[i], max_depth=80.0)
               for i in range(2)]
    for k in ("rmse", "rel", "delta1"):
        want = np.mean([r[k] for r in per_img])
        np.testing.assert_allclose(got[k], want, rtol=1e-5, err_msg=k)
    uncapped = finalize_metrics(metric_sums_from_batch(pred, target))
    assert got["n_valid_pixels"] < uncapped["n_valid_pixels"]


def test_metric_sums_are_additive():
    """Accumulating per-batch sums == evaluating the concatenated batch —
    the property that makes distributed (psum) eval exact."""
    pred, target = _problem()
    s1 = metric_sums_from_batch(pred[:1], target[:1])
    s2 = metric_sums_from_batch(pred[1:], target[1:])
    s_all = metric_sums_from_batch(pred, target)
    m_split = finalize_metrics(s1 + s2)
    m_all = finalize_metrics(s_all)
    for k in ("rmse", "mae", "rel", "delta1", "irmse"):
        np.testing.assert_allclose(m_split[k], m_all[k], rtol=1e-6)


def test_metric_sums_zeros_identity():
    pred, target = _problem()
    s = metric_sums_from_batch(pred, target)
    m1 = finalize_metrics(s + MetricSums.zeros())
    m2 = finalize_metrics(s)
    assert m1 == m2


def test_metrics_all_padding_shard_is_finite():
    """A multihost eval shard can consist entirely of padding images (val
    set smaller than process_count x batch); finalize must yield finite
    zeros, not NaN/inf, so the psum'd global result is unaffected."""
    pred, target = _problem()
    valid = jnp.asarray([0.0, 0.0])
    got = finalize_metrics(
        metric_sums_from_batch(pred, target, valid_image=valid))
    assert got["n_images"] == 0
    for k in ("rmse", "mae", "rel", "lg10", "delta1", "irmse", "imae"):
        assert np.isfinite(got[k]) and got[k] == 0.0, (k, got[k])
    # And adding the empty shard to a real one changes nothing.
    real = metric_sums_from_batch(pred, target)
    empty = metric_sums_from_batch(pred, target, valid_image=valid)
    m1 = finalize_metrics(real + empty)
    m2 = finalize_metrics(real)
    for k in ("rmse", "delta1"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-6)


def test_perfect_prediction():
    t = jnp.asarray(np.random.default_rng(2).uniform(1, 9, (1, 6, 6)),
                    dtype=jnp.float32)
    got = finalize_metrics(metric_sums_from_batch(t, t))
    assert got["rmse"] < 1e-5 and got["delta1"] == 1.0
