"""Tests for device-side uniform sparse sampling (SURVEY.md R9 redesign)."""

import jax
import jax.numpy as jnp
import numpy as np

from cspn_monodepth_tpu.ops import uniform_sparse_sample


def test_exact_count_and_subset():
    key = jax.random.key(0)
    dense = jax.random.uniform(key, (3, 20, 30), minval=0.1, maxval=10.0)
    out = np.asarray(uniform_sparse_sample(key, dense, num_samples=50))
    for i in range(3):
        assert (out[i] > 0).sum() == 50
    # sampled values come from the dense map
    d = np.asarray(dense)
    np.testing.assert_array_equal(out[out > 0], d[out > 0])


def test_respects_validity_and_max_depth():
    dense = jnp.ones((1, 10, 10)) * 5.0
    dense = dense.at[0, :5].set(0.0)        # top half invalid
    dense = dense.at[0, 9, :].set(20.0)     # bottom row beyond cap
    out = np.asarray(
        uniform_sparse_sample(jax.random.key(1), dense, 30, max_depth=10.0)
    )
    assert (out[0, :5] == 0).all() and (out[0, 9] == 0).all()
    assert (out > 0).sum() == 30


def test_short_image_keeps_all_valid():
    dense = jnp.zeros((1, 8, 8)).at[0, 0, :4].set(2.0)  # only 4 valid pixels
    out = np.asarray(uniform_sparse_sample(jax.random.key(2), dense, 100))
    assert (out > 0).sum() == 4


def test_uniformity():
    """Each valid pixel should be selected with probability ~ n / n_valid."""
    dense = jnp.ones((200, 8, 8))  # 64 valid, sample 16 => p = 0.25
    keys = jax.random.split(jax.random.key(3), 200)
    out = jax.vmap(lambda k, d: uniform_sparse_sample(k, d[None], 16)[0])(
        keys, dense
    )
    freq = np.asarray((out > 0).mean(axis=0))
    assert abs(freq.mean() - 0.25) < 1e-6   # exactly n per image
    assert freq.std() < 0.08                 # no systematic pixel bias


def test_channel_dim_passthrough():
    dense = jax.random.uniform(jax.random.key(4), (2, 12, 12, 1), minval=0.1)
    out = uniform_sparse_sample(jax.random.key(5), dense, 10)
    assert out.shape == dense.shape
    assert int((np.asarray(out) > 0).sum()) == 20


def test_stereo_sampler_prefers_edges():
    from cspn_monodepth_tpu.ops import stereo_sparse_sample

    dense = jnp.ones((1, 24, 24)) * 5.0
    rgb = jnp.zeros((1, 24, 24, 3))
    rgb = rgb.at[0, :, 12:, :].set(1.0)  # vertical edge at column 12
    out = np.asarray(stereo_sparse_sample(jax.random.key(0), dense, rgb, 20))
    assert (out > 0).sum() == 20
    ys, xs = np.nonzero(out[0])
    # the gradient column (11, where diff fires) should dominate
    assert (np.abs(xs - 11) <= 1).mean() > 0.9


def test_stereo_sampler_respects_validity():
    from cspn_monodepth_tpu.ops import stereo_sparse_sample

    dense = jnp.ones((1, 16, 16)) * 5.0
    dense = dense.at[0, :8].set(0.0)
    rgb = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3))
    out = np.asarray(stereo_sparse_sample(jax.random.key(2), dense, rgb, 30))
    assert (out[0, :8] == 0).all() and (out > 0).sum() == 30


def test_top_k_mask_equals_top_k_threshold():
    """_top_k_mask (bit-bisection selection) == thresholding at
    lax.top_k's k-th value — including exact-tie inflation and the
    all-below-k row."""
    from jax import lax

    from cspn_monodepth_tpu.ops.sparse import _top_k_mask

    rng = np.random.default_rng(11)
    scores = rng.uniform(-1.0, 1.0, (4, 997)).astype(np.float32)
    scores[1, 100:200] = scores[1, 50]      # massive exact tie block
    scores[2, :] = -1.0                      # all "invalid"
    scores[3, ::7] = 0.25                    # scattered ties
    flat = jnp.asarray(scores)
    for k in (1, 5, 64, 500, 997):
        kth = lax.top_k(flat, k)[0][:, -1]
        want = np.asarray(flat >= kth[:, None])
        got = np.asarray(_top_k_mask(flat, k))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")
