"""Device-side sparse depth sampling.

The reference samples sparse inputs on CPU in DataLoader workers
(`dataloaders/dense_to_sparse.py: UniformSampling` — SURVEY.md R9): choose
exactly `num_samples` pixels uniformly at random among pixels with GT > 0.

TPU-native redesign (SURVEY.md section 3.5): sampling runs on-device inside
the jit'd step using the JAX PRNG — no host round-trip, no dynamic shapes.
Exact-n uniform choice without host sync is done with random scores + top-k:
draw iid uniform scores for every valid pixel, keep the n largest. Every
valid subset of size n is equally likely, matching the reference
distribution exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_samples",))
def stereo_sparse_sample(
    key: jax.Array,
    dense_depth: jax.Array,
    rgb: jax.Array,
    num_samples: int,
    max_depth: float | None = None,
) -> jax.Array:
    """Simulated-stereo sampling (`dense_to_sparse.py: SimulatedStereo`).

    Stereo matching produces depth at textured/edge pixels, so instead of
    uniform scores the per-pixel score is the local image-gradient
    magnitude (plus a small random tiebreak); the num_samples highest-
    scoring valid pixels are kept. Runs on device like uniform sampling.

    rgb: (B, H, W, 3) in [0, 1].
    """
    squeeze = dense_depth.ndim == 4
    d = dense_depth[..., 0] if squeeze else dense_depth
    b, h, w = d.shape

    valid = d > 0
    if max_depth is not None:
        valid &= d <= max_depth

    gray = jnp.mean(rgb.astype(jnp.float32), axis=-1)
    gy = jnp.abs(jnp.diff(gray, axis=1, append=gray[:, -1:, :]))
    gx = jnp.abs(jnp.diff(gray, axis=2, append=gray[:, :, -1:]))
    grad = gy + gx
    tiebreak = jax.random.uniform(key, grad.shape, maxval=1e-4)
    scores = jnp.where(valid, grad + tiebreak, -1.0)

    flat = scores.reshape(b, h * w)
    k = min(num_samples, h * w)
    kth = jax.lax.top_k(flat, k)[0][:, -1]
    keep = (scores >= kth[:, None, None]) & valid
    out = jnp.where(keep, d, jnp.zeros_like(d))
    return out[..., None] if squeeze else out


@functools.partial(jax.jit, static_argnames=("num_samples",))
def uniform_sparse_sample(
    key: jax.Array,
    dense_depth: jax.Array,
    num_samples: int,
    max_depth: float | None = None,
) -> jax.Array:
    """Simulate a sparse depth input from dense GT.

    Args:
      key: PRNG key (one per batch element is derived internally).
      dense_depth: (B, H, W) or (B, H, W, 1) dense GT depth; invalid = 0.
      num_samples: exact number of pixels to keep per image. If an image has
        fewer than num_samples valid pixels, all its valid pixels are kept.
      max_depth: optionally also invalidate depths above this cap.

    Returns:
      sparse depth, same shape as dense_depth: dense values at the sampled
      pixels, 0 elsewhere.
    """
    squeeze = dense_depth.ndim == 4
    d = dense_depth[..., 0] if squeeze else dense_depth
    b, h, w = d.shape

    valid = d > 0
    if max_depth is not None:
        valid &= d <= max_depth

    keys = jax.random.split(key, b)
    scores = jax.vmap(
        lambda k: jax.random.uniform(k, (h, w), minval=0.0, maxval=1.0)
    )(keys)
    # Invalid pixels get score -1 < any valid score, so top-k prefers valid
    # pixels; the final mask re-ands with `valid` for the rare short image.
    scores = jnp.where(valid, scores, -1.0)

    flat = scores.reshape(b, h * w)
    k = min(num_samples, h * w)
    kth = jax.lax.top_k(flat, k)[0][:, -1]  # k-th largest score
    keep = (scores >= kth[:, None, None]) & valid

    out = jnp.where(keep, d, jnp.zeros_like(d))
    return out[..., None] if squeeze else out
