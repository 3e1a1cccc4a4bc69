"""Depth metrics (SURVEY.md R12, `metrics.py: Result/AverageMeter`).

TPU-native redesign (SURVEY.md section 6 "Metrics"): instead of moving each
prediction to host and evaluating in numpy, we accumulate metric *sums* plus
image/pixel counts on device. Sums are psum-reducible across hosts/devices
and exactly order-independent, so distributed eval equals gathered-to-host
eval. `finalize_metrics` turns the sums into the reference's metric set:
RMSE, MAE, REL, lg10, delta1/2/3, iRMSE, iMAE.

Two averaging protocols:

* "image" (default) — the reference protocol. The reference's
  `Result.evaluate(pred, gt)` computes each metric over one image's valid
  pixels, then `AverageMeter` averages those per-image values across the
  dataset. RMSE in particular is mean-of-per-image-RMSE (sqrt inside the
  image average), which differs from a global-pixel RMSE by Jensen's
  inequality. Accuracy numbers comparable to the paper table REQUIRE this
  protocol.
* "pixel" — global-pixel means (every valid pixel weighted equally).
  Kept as an option; slightly cheaper and sometimes preferred for loss-like
  monitoring.

Both protocols support an eval max-depth cap (SURVEY.md section 4.4: KITTI
eval is capped, pixels with gt > cap are excluded) and a per-image validity
mask so padded eval-batch images contribute nothing.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import flax


@flax.struct.dataclass
class MetricSums:
    """Running metric sums; all array fields are scalars, psum-reducible.

    Field semantics depend on `protocol` (a static pytree field):

    * image: each metric field holds sum-over-valid-images of that image's
      metric value; finalize divides by n_images.
    * pixel: rmse/irmse hold raw squared-error pixel sums, the rest hold raw
      per-pixel sums; finalize divides by n_pixels (sqrt applied last for
      rmse/irmse).
    """

    n_images: jax.Array     # images with >= 1 valid pixel (excl. padding)
    n_pixels: jax.Array     # valid pixels in those images
    rmse: jax.Array
    mae: jax.Array
    rel: jax.Array
    lg10: jax.Array
    delta1: jax.Array
    delta2: jax.Array
    delta3: jax.Array
    irmse: jax.Array
    imae: jax.Array
    protocol: str = flax.struct.field(pytree_node=False, default="image")

    @classmethod
    def zeros(cls, protocol: str = "image") -> "MetricSums":
        z = jnp.zeros((), jnp.float32)
        fields = {f.name: z for f in dataclasses.fields(cls)
                  if f.name != "protocol"}
        return cls(protocol=protocol, **fields)

    def __add__(self, other: "MetricSums") -> "MetricSums":
        if self.protocol != other.protocol:
            raise ValueError(
                f"cannot add MetricSums of protocol {self.protocol!r} "
                f"and {other.protocol!r}")
        return jax.tree.map(lambda a, b: a + b, self, other)


def metric_sums_from_batch(
    pred: jax.Array,
    target: jax.Array,
    valid_image: jax.Array | None = None,
    max_depth: float = 0.0,
    protocol: str = "image",
) -> MetricSums:
    """Compute per-batch metric sums on device.

    pred/target: (B, H, W) or (B, H, W, 1), depth in meters; target == 0
    marks invalid pixels. `valid_image` (B,) bool/0-1 excludes eval padding
    images. `max_depth > 0` additionally excludes pixels with gt > cap
    (reference KITTI eval protocol). Predictions are clamped to >= 1e-3 m
    before the ratio/inverse/log metrics, mirroring the reference's
    valid-masked eval while avoiding NaNs from nonpositive predictions.
    """
    if pred.ndim == 4:
        pred = pred[..., 0]
    if target.ndim == 4:
        target = target[..., 0]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    valid = target > 0
    if max_depth and max_depth > 0:
        valid &= target <= max_depth
    m = valid.astype(jnp.float32)
    if valid_image is not None:
        m = m * valid_image.astype(jnp.float32)[:, None, None]
    safe_t = jnp.where(valid, target, 1.0)
    safe_p = jnp.maximum(pred, 1e-3)

    diff = safe_p - safe_t
    ratio = jnp.maximum(safe_p / safe_t, safe_t / safe_p)
    # inverse metrics in 1/km (reference: iRMSE/iMAE for KITTI)
    inv_d = 1000.0 / safe_p
    inv_g = 1000.0 / safe_t

    if protocol == "pixel":
        def msum(x):
            return jnp.sum(x * m)

        img_has_valid = (jnp.sum(m, axis=(1, 2)) > 0).astype(jnp.float32)
        return MetricSums(
            protocol="pixel",
            n_images=jnp.sum(img_has_valid),
            n_pixels=jnp.sum(m),
            rmse=msum(diff**2),
            mae=msum(jnp.abs(diff)),
            rel=msum(jnp.abs(diff) / safe_t),
            lg10=msum(jnp.abs(jnp.log10(safe_p) - jnp.log10(safe_t))),
            delta1=msum((ratio < 1.25).astype(jnp.float32)),
            delta2=msum((ratio < 1.25**2).astype(jnp.float32)),
            delta3=msum((ratio < 1.25**3).astype(jnp.float32)),
            irmse=msum((inv_d - inv_g) ** 2),
            imae=msum(jnp.abs(inv_d - inv_g)),
        )
    if protocol != "image":
        raise ValueError(f"unknown metrics protocol {protocol!r}")

    # Reference protocol: per-image means, then sum across valid images.
    npix = jnp.sum(m, axis=(1, 2))                      # (B,)
    w = (npix > 0).astype(jnp.float32)                  # image weight
    denom = jnp.maximum(npix, 1.0)

    def imean(x):
        return jnp.sum(x * m, axis=(1, 2)) / denom     # (B,)

    def wsum(per_image):
        return jnp.sum(per_image * w)

    return MetricSums(
        protocol="image",
        n_images=jnp.sum(w),
        n_pixels=jnp.sum(npix * w),
        rmse=wsum(jnp.sqrt(imean(diff**2))),
        mae=wsum(imean(jnp.abs(diff))),
        rel=wsum(imean(jnp.abs(diff) / safe_t)),
        lg10=wsum(imean(jnp.abs(jnp.log10(safe_p) - jnp.log10(safe_t)))),
        delta1=wsum(imean((ratio < 1.25).astype(jnp.float32))),
        delta2=wsum(imean((ratio < 1.25**2).astype(jnp.float32))),
        delta3=wsum(imean((ratio < 1.25**3).astype(jnp.float32))),
        irmse=wsum(jnp.sqrt(imean((inv_d - inv_g) ** 2))),
        imae=wsum(imean(jnp.abs(inv_d - inv_g))),
    )


def finalize_metrics(sums: MetricSums) -> dict[str, float]:
    """Reduce sums to the reference's metric dict (host-side, tiny)."""
    s = jax.tree.map(lambda x: float(jax.device_get(x)), sums)
    keys = ("rmse", "mae", "rel", "lg10", "delta1", "delta2", "delta3",
            "irmse", "imae")
    if sums.protocol == "image":
        n = max(s.n_images, 1.0)
        out = {k: getattr(s, k) / n for k in keys}
    else:
        n = max(s.n_pixels, 1.0)
        out = {k: getattr(s, k) / n for k in keys}
        out["rmse"] = float(np.sqrt(out["rmse"]))
        out["irmse"] = float(np.sqrt(out["irmse"]))
    out["n_valid_pixels"] = s.n_pixels
    out["n_images"] = s.n_images
    return out


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
