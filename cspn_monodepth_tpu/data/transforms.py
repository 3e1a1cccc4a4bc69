"""CPU-side image/depth augmentation (SURVEY.md R10, `transforms.py`).

Pure numpy (no PIL dependency): rotate +-deg, scale s in [1, s_max] with
depth /= s, horizontal flip p=0.5, color jitter, downsample + center crop
(NYU) or bottom crop (KITTI). These run in per-host grain worker threads;
the *sparse sampling* deliberately does NOT happen here — it runs on-device
(ops/sparse.py), unlike the reference's CPU `dense_to_sparse.py`.

Outputs are channels-last float32: rgb in [0, 1], depth in meters with 0 =
invalid.
"""

from __future__ import annotations

import numpy as np


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize for (H, W) or (H, W, C) float arrays, pure numpy."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    if img.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return (top * (1 - wy) + bot * wy).astype(img.dtype)


def _nearest_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest resize — used for depth so invalid zeros don't bleed."""
    h, w = img.shape[:2]
    ys = np.clip(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), 0, h - 1)
    xs = np.clip(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), 0, w - 1)
    return img[np.ix_(ys, xs)]


def _rotate(img: np.ndarray, deg: float, nearest: bool) -> np.ndarray:
    """Rotate about the center; out-of-bounds = 0 (invalid for depth)."""
    if abs(deg) < 1e-6:
        return img
    h, w = img.shape[:2]
    theta = np.deg2rad(deg)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # inverse map: source coords for each dest pixel
    ys = cy + (yy - cy) * np.cos(theta) - (xx - cx) * np.sin(theta)
    xs = cx + (yy - cy) * np.sin(theta) + (xx - cx) * np.cos(theta)
    inside = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    if nearest:
        yi = np.clip(np.rint(ys).astype(np.int64), 0, h - 1)
        xi = np.clip(np.rint(xs).astype(np.int64), 0, w - 1)
        out = img[yi, xi]
    else:
        y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = np.clip(ys - y0, 0, 1)
        wx = np.clip(xs - x0, 0, 1)
        if img.ndim == 3:
            wy = wy[..., None]
            wx = wx[..., None]
        out = (img[y0, x0] * (1 - wy) * (1 - wx) + img[y0, x1] * (1 - wy) * wx
               + img[y1, x0] * wy * (1 - wx) + img[y1, x1] * wy * wx)
    if img.ndim == 3:
        inside = inside[..., None]
    return np.where(inside, out, 0).astype(img.dtype)


def _center_crop(img: np.ndarray, ch: int, cw: int) -> np.ndarray:
    h, w = img.shape[:2]
    i, j = (h - ch) // 2, (w - cw) // 2
    return img[i:i + ch, j:j + cw]


def _bottom_crop(img: np.ndarray, ch: int, cw: int) -> np.ndarray:
    h, w = img.shape[:2]
    j = (w - cw) // 2
    return img[h - ch:, j:j + cw]


def train_transform(
    rgb: np.ndarray,
    depth: np.ndarray,
    rng: np.random.Generator,
    *,
    out_h: int,
    out_w: int,
    rotate_deg: float = 5.0,
    scale_max: float = 1.5,
    hflip_prob: float = 0.5,
    jitter: float = 0.2,
    crop: str = "center",
) -> tuple[np.ndarray, np.ndarray]:
    """Reference train aug (SURVEY.md section 4.4): rotate, scale (with
    depth /= s), hflip, color jitter, resize-to-~1.2x-crop then crop.

    rgb: (H, W, 3) uint8 or float; depth: (H, W) float meters.
    Returns float32 (out_h, out_w, 3) in [0,1] and (out_h, out_w).
    """
    rgb = np.asarray(rgb, np.float32)
    if rgb.max() > 1.5:
        rgb = rgb / 255.0
    depth = np.asarray(depth, np.float32)

    s = rng.uniform(1.0, scale_max) if scale_max > 1.0 else 1.0
    deg = rng.uniform(-rotate_deg, rotate_deg) if rotate_deg > 0 else 0.0

    rgb = _rotate(rgb, deg, nearest=False)
    depth = _rotate(depth, deg, nearest=True)

    # Resize so that after scaling by s the crop still fits: target the
    # crop size scaled by s, then crop out_h x out_w from the center.
    rh, rw = int(round(out_h * s)), int(round(out_w * s))
    rgb = _bilinear_resize(rgb, rh, rw)
    depth = _nearest_resize(depth, rh, rw) / s   # depth divides by scale

    if crop == "bottom":
        rgb, depth = _bottom_crop(rgb, out_h, out_w), _bottom_crop(depth, out_h, out_w)
    else:
        rgb, depth = _center_crop(rgb, out_h, out_w), _center_crop(depth, out_h, out_w)

    if rng.uniform() < hflip_prob:
        rgb, depth = rgb[:, ::-1], depth[:, ::-1]

    if jitter > 0:
        # per-channel brightness/contrast jitter in [1-j, 1+j]
        gain = rng.uniform(1 - jitter, 1 + jitter, size=(1, 1, 3)).astype(np.float32)
        rgb = np.clip(rgb * gain, 0.0, 1.0)

    return np.ascontiguousarray(rgb), np.ascontiguousarray(depth)


def val_transform(
    rgb: np.ndarray,
    depth: np.ndarray,
    *,
    out_h: int,
    out_w: int,
    crop: str = "center",
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic eval path: resize to crop size, center/bottom crop."""
    rgb = np.asarray(rgb, np.float32)
    if rgb.max() > 1.5:
        rgb = rgb / 255.0
    depth = np.asarray(depth, np.float32)
    rgb = _bilinear_resize(rgb, out_h, out_w) if crop == "center" else rgb
    depth = _nearest_resize(depth, out_h, out_w) if crop == "center" else depth
    if crop == "bottom":
        rgb, depth = _bottom_crop(rgb, out_h, out_w), _bottom_crop(depth, out_h, out_w)
    return np.ascontiguousarray(rgb), np.ascontiguousarray(depth)
