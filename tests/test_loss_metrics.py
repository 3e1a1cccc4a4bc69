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


def test_metrics_match_numpy_reference():
    pred, target = _problem()
    got = finalize_metrics(metric_sums_from_batch(pred, target))

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


def test_perfect_prediction():
    t = jnp.asarray(np.random.default_rng(2).uniform(1, 9, (1, 6, 6)),
                    dtype=jnp.float32)
    got = finalize_metrics(metric_sums_from_batch(t, t))
    assert got["rmse"] < 1e-5 and got["delta1"] == 1.0
