"""Oracle-parity and property tests for the jnp CSPN reference op.

Test ladder items 1-2 from SURVEY.md section 5.2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cspn_monodepth_tpu.ops import (
    cspn_propagate_ref,
    normalize_affinity,
    uniform_sparse_sample,
)
from tests.oracle_torch import cspn_oracle


def _rand(key, b=2, h=13, w=17):
    kg, kd, ks = jax.random.split(key, 3)
    guidance = jax.random.normal(kg, (b, h, w, 8), jnp.float32)
    blur = jax.random.uniform(kd, (b, h, w), jnp.float32, 0.1, 10.0)
    dense = jax.random.uniform(ks, (b, h, w), jnp.float32, 0.1, 10.0)
    sparse = uniform_sparse_sample(ks, dense, num_samples=25)
    return guidance, blur, sparse


@pytest.mark.parametrize("num_iters", [1, 4, 12])
@pytest.mark.parametrize("with_sparse", [False, True])
@pytest.mark.parametrize("norm_type", ["8sum", "8sum_abs", "8sum_clamp"])
def test_oracle_parity(num_iters, with_sparse, norm_type):
    guidance, blur, sparse = _rand(jax.random.key(num_iters))
    sp = sparse if with_sparse else None
    got = cspn_propagate_ref(
        guidance, blur, sp, num_iters=num_iters, norm_type=norm_type
    )
    # np.array(..., copy=True): jax arrays expose read-only buffers, which
    # torch.from_numpy warns about (non-writable tensor aliasing).
    want = cspn_oracle(
        torch.from_numpy(np.array(guidance)),
        torch.from_numpy(np.array(blur)),
        torch.from_numpy(np.array(sparse)) if with_sparse else None,
        num_iters=num_iters,
        norm_type=norm_type,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )


def test_affinity_rows_sum_to_one():
    guidance = jax.random.normal(jax.random.key(0), (2, 5, 7, 8))
    gate, center = normalize_affinity(guidance)
    rows = jnp.sum(gate, axis=-1) + center[..., 0]
    np.testing.assert_allclose(np.asarray(rows), 1.0, rtol=1e-6)
    # |gate| sums to 1 where guidance is nonzero
    np.testing.assert_allclose(
        np.asarray(jnp.sum(jnp.abs(gate), axis=-1)), 1.0, rtol=1e-5
    )


def test_clamp_norm_identity_and_clean_grads_at_zero():
    """"8sum_clamp" at g-hat = 0: identity propagation AND unit-scale
    gradients (d gate / d g-hat = 1, not 1/eps) — the property that makes
    zero-init guidance heads trainable."""
    b, h, w = 1, 8, 8
    blur = jax.random.uniform(jax.random.key(21), (b, h, w))

    def out_sum(g):
        return jnp.sum(cspn_propagate_ref(g, blur, num_iters=4,
                                          norm_type="8sum_clamp"))

    zero_g = jnp.zeros((b, h, w, 8))
    out = cspn_propagate_ref(zero_g, blur, num_iters=4,
                             norm_type="8sum_clamp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(blur), rtol=1e-6)
    grad = jax.grad(out_sum)(zero_g)
    assert float(jnp.max(jnp.abs(grad))) < 100.0  # no 1/eps blowup
    assert float(jnp.max(jnp.abs(grad))) > 1e-3   # but gradient flows


def test_clamp_norm_matches_8sum_above_one():
    """Where sum|g-hat| >= 1, "8sum_clamp" must equal "8sum" exactly."""
    b, h, w = 1, 8, 8
    g = jax.random.normal(jax.random.key(22), (b, h, w, 8)) * 5.0
    # ensure every pixel has abs-sum > 1
    assert float(jnp.min(jnp.sum(jnp.abs(g), axis=-1))) > 1.0
    blur = jax.random.uniform(jax.random.key(23), (b, h, w))
    a = cspn_propagate_ref(g, blur, num_iters=6, norm_type="8sum")
    c = cspn_propagate_ref(g, blur, num_iters=6, norm_type="8sum_clamp")
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)


def test_zero_guidance_is_identity():
    """With g-hat == 0, gate == 0 and g0 == 1 => output equals blur depth."""
    b, h, w = 1, 9, 11
    guidance = jnp.zeros((b, h, w, 8))
    blur = jax.random.uniform(jax.random.key(1), (b, h, w))
    out = cspn_propagate_ref(guidance, blur, num_iters=12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(blur), rtol=1e-6)


def test_full_mask_returns_sparse():
    """With m == 1 everywhere, output equals the sparse input."""
    b, h, w = 1, 6, 8
    guidance = jax.random.normal(jax.random.key(2), (b, h, w, 8))
    blur = jax.random.uniform(jax.random.key(3), (b, h, w))
    sparse = jax.random.uniform(jax.random.key(4), (b, h, w), minval=0.5)
    out = cspn_propagate_ref(guidance, blur, sparse, num_iters=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sparse), rtol=1e-6)


def test_non_expansive_abs_norm():
    """sup-norm never grows under "8sum_abs": all 9 weights are >= 0 and sum
    to 1, so each update is a convex combination (plus bounded anchors).

    Note this does NOT hold for signed "8sum" affinities: g0 = 1 - sum(g_k)
    can exceed 1 (up to 2), making the row L1 norm up to 3 — random signed
    gates are expansive. Learned affinities are benign in practice [P].
    """
    guidance, blur, sparse = _rand(jax.random.key(5), b=3, h=16, w=16)
    bound = float(
        jnp.maximum(jnp.max(jnp.abs(blur)), jnp.max(jnp.abs(sparse)))
    )
    out = cspn_propagate_ref(guidance, blur, sparse, num_iters=24,
                             norm_type="8sum_abs")
    assert float(jnp.max(jnp.abs(out))) <= bound + 1e-4


def test_constant_field_fixed_point():
    """A constant depth field is preserved (rows sum to 1, zero-border aside).

    Zero padding breaks this at the border, so check interior pixels only
    after 1 iteration on an image large enough that iter-1 interior is
    unaffected by the border.
    """
    b, h, w = 1, 12, 12
    guidance = jax.random.normal(jax.random.key(6), (b, h, w, 8))
    blur = jnp.full((b, h, w), 3.25)
    out = cspn_propagate_ref(guidance, blur, num_iters=1)
    np.testing.assert_allclose(
        np.asarray(out[:, 1:-1, 1:-1]), 3.25, rtol=1e-5
    )


def test_channel_orientation():
    """Pin the gather-stencil semantics of channel k -> offset (dy, dx).

    Put all affinity mass on channel 4 (offset (0, +1)): after one
    iteration each pixel must take the value of its RIGHT neighbor.
    """
    b, h, w = 1, 5, 6
    guidance = jnp.zeros((b, h, w, 8)).at[..., 4].set(1.0)
    blur = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w)
    out = np.asarray(cspn_propagate_ref(guidance, blur, num_iters=1))
    want = np.zeros((h, w), np.float32)
    want[:, :-1] = np.asarray(blur)[0, :, 1:]
    np.testing.assert_allclose(out[0], want, rtol=1e-6)


def test_dtype_and_channel_dim_handling():
    guidance, blur, sparse = _rand(jax.random.key(7))
    out4 = cspn_propagate_ref(guidance, blur[..., None], sparse[..., None],
                              num_iters=3)
    out3 = cspn_propagate_ref(guidance, blur, sparse, num_iters=3)
    assert out4.shape == blur.shape + (1,)
    np.testing.assert_allclose(np.asarray(out4[..., 0]), np.asarray(out3))


def test_grad_flows():
    guidance, blur, sparse = _rand(jax.random.key(8), b=1, h=8, w=8)

    def loss(g, d):
        return jnp.sum(cspn_propagate_ref(g, d, sparse, num_iters=6) ** 2)

    gg, gd = jax.grad(loss, argnums=(0, 1))(guidance, blur)
    assert jnp.all(jnp.isfinite(gg)) and jnp.all(jnp.isfinite(gd))
    assert float(jnp.max(jnp.abs(gg))) > 0
    # grad wrt blur is zero AT anchored pixels only
    m = np.asarray(sparse)[0] > 0
    gd = np.asarray(gd)[0]
    assert np.all(gd[m] == 0) and np.any(gd[~m] != 0)
