"""Depth metrics (SURVEY.md R12, `metrics.py: Result/AverageMeter`).

TPU-native redesign (SURVEY.md section 6 "Metrics"): instead of moving each
prediction to host and evaluating in numpy, we accumulate masked metric
*sums* plus valid-pixel counts on device. Sums are psum-reducible across
hosts/devices and exactly order-independent, so distributed eval equals
gathered-to-host eval. `finalize_metrics` turns the sums into the
reference's metric set: RMSE, MAE, REL, lg10, delta1/2/3, iRMSE, iMAE.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import flax


@flax.struct.dataclass
class MetricSums:
    """Valid-masked running sums; all fields are scalars (f32/f64-safe)."""

    count: jax.Array        # number of valid pixels
    n_images: jax.Array
    sq_err: jax.Array       # sum (d-g)^2          [m^2]
    abs_err: jax.Array      # sum |d-g|            [m]
    rel_err: jax.Array      # sum |d-g| / g
    lg10_err: jax.Array     # sum |log10 d - log10 g|
    delta1: jax.Array       # count max(d/g, g/d) < 1.25
    delta2: jax.Array       # ... < 1.25^2
    delta3: jax.Array       # ... < 1.25^3
    inv_sq_err: jax.Array   # sum (1/d - 1/g)^2    [1/km^2]
    inv_abs_err: jax.Array  # sum |1/d - 1/g|      [1/km]

    @classmethod
    def zeros(cls) -> "MetricSums":
        z = jnp.zeros((), jnp.float32)
        return cls(**{f.name: z for f in dataclasses.fields(cls)})

    def __add__(self, other: "MetricSums") -> "MetricSums":
        return jax.tree.map(lambda a, b: a + b, self, other)


def metric_sums_from_batch(pred: jax.Array, target: jax.Array) -> MetricSums:
    """Compute per-batch metric sums on device.

    pred/target: (B, H, W) or (B, H, W, 1), depth in meters; target == 0
    marks invalid pixels. Predictions are clamped to >= 1e-3 m before the
    ratio/inverse metrics, mirroring the reference's valid-masked eval.
    """
    if pred.ndim == 4:
        pred = pred[..., 0]
    if target.ndim == 4:
        target = target[..., 0]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    valid = target > 0
    m = valid.astype(jnp.float32)
    safe_t = jnp.where(valid, target, 1.0)
    safe_p = jnp.maximum(pred, 1e-3)

    diff = safe_p - safe_t
    ratio = jnp.maximum(safe_p / safe_t, safe_t / safe_p)
    # inverse metrics in 1/km (reference: iRMSE/iMAE for KITTI)
    inv_d = 1000.0 / safe_p
    inv_g = 1000.0 / safe_t

    def msum(x):
        return jnp.sum(x * m)

    return MetricSums(
        count=jnp.sum(m),
        n_images=jnp.asarray(pred.shape[0], jnp.float32),
        sq_err=msum(diff**2),
        abs_err=msum(jnp.abs(diff)),
        rel_err=msum(jnp.abs(diff) / safe_t),
        lg10_err=msum(jnp.abs(jnp.log10(safe_p) - jnp.log10(safe_t))),
        delta1=msum((ratio < 1.25).astype(jnp.float32)),
        delta2=msum((ratio < 1.25**2).astype(jnp.float32)),
        delta3=msum((ratio < 1.25**3).astype(jnp.float32)),
        inv_sq_err=msum((inv_d - inv_g) ** 2),
        inv_abs_err=msum(jnp.abs(inv_d - inv_g)),
    )


def finalize_metrics(sums: MetricSums) -> dict[str, float]:
    """Reduce sums to the reference's metric dict (host-side, tiny)."""
    s = jax.tree.map(lambda x: float(jax.device_get(x)), sums)
    n = max(s.count, 1.0)
    return {
        "rmse": float(np.sqrt(s.sq_err / n)),
        "mae": s.abs_err / n,
        "rel": s.rel_err / n,
        "lg10": s.lg10_err / n,
        "delta1": s.delta1 / n,
        "delta2": s.delta2 / n,
        "delta3": s.delta3 / n,
        "irmse": float(np.sqrt(s.inv_sq_err / n)),
        "imae": s.inv_abs_err / n,
        "n_valid_pixels": s.count,
        "n_images": s.n_images,
    }


class AverageMeter:
    """Host-side running averages for scalars (timings, loss)."""

    def __init__(self):
        self.sum: dict[str, float] = {}
        self.n: dict[str, int] = {}

    def update(self, **values: float):
        for k, v in values.items():
            self.sum[k] = self.sum.get(k, 0.0) + float(v)
            self.n[k] = self.n.get(k, 0) + 1

    def average(self) -> dict[str, float]:
        return {k: self.sum[k] / max(self.n[k], 1) for k in self.sum}
