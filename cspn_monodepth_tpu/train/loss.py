"""Masked depth losses (SURVEY.md R11, `criteria.py` equivalents).

Both losses mask to valid GT pixels (target > 0) and average over the
number of valid pixels. Under pjit with a batch-sharded target, the sums
lower to psums across the "data" axis, so the loss is the *global-batch*
mean — identical to the single-device value (tested in
tests/test_sharding.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(err: jax.Array, target: jax.Array) -> jax.Array:
    mask = (target > 0).astype(err.dtype)
    total = jnp.sum(err * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def masked_mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error over valid-GT pixels (`MaskedMSELoss`)."""
    return _masked_mean((pred - target) ** 2, target)


def masked_l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean absolute error over valid-GT pixels (`MaskedL1Loss`)."""
    return _masked_mean(jnp.abs(pred - target), target)


def get_loss_fn(name: str):
    try:
        return {"masked_mse": masked_mse_loss, "masked_l1": masked_l1_loss}[name]
    except KeyError:
        raise ValueError(f"unknown loss {name!r}") from None
