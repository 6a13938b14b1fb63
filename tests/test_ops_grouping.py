"""Tests for gather/group/masked-pooling/interpolation ops."""

import numpy as np
import jax
import jax.numpy as jnp

from slide_tpu.ops import (
    gather_points, group_points, count_to_mask, masked_avg_pool,
    masked_max_pool, pool_features, three_interpolate, three_nn,
)
from slide_tpu.ops.grouping import interp_weights_from_dists


def test_gather_and_group():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 5)).astype(np.int32)
    got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b, idx[b]])

    gidx = rng.integers(0, 10, size=(2, 5, 3)).astype(np.int32)
    gg = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(gg[b], pts[b][gidx[b]])


def test_group_points_grad_is_scatter_add():
    """Autodiff through group_points must scatter-add like the reference's
    hand-written backward (group_points_gpu.cu:39-75)."""
    pts = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 6, 2))
    idx = jnp.asarray(np.array([[[0, 0], [5, 1]]], np.int32))  # point 0 used twice

    def f(p):
        return jnp.sum(group_points(p, idx))

    g = np.asarray(jax.grad(f)(pts))[0]
    np.testing.assert_array_equal(g[:, 0], [2, 1, 0, 0, 0, 1])


def test_count_to_mask_and_avg_pool():
    count = jnp.asarray(np.array([[0, 2, 4]], np.int32))
    mask = np.asarray(count_to_mask(count, 4))
    np.testing.assert_array_equal(mask[0, 0], [False] * 4)
    np.testing.assert_array_equal(mask[0, 1], [True, True, False, False])
    np.testing.assert_array_equal(mask[0, 2], [True] * 4)

    feat = jnp.asarray(np.arange(1 * 3 * 4 * 2, dtype=np.float32).reshape(1, 3, 4, 2))
    avg = np.asarray(masked_avg_pool(feat, count))
    f = np.asarray(feat)
    # count clamped to 1: query 0 averages only slot 0
    np.testing.assert_allclose(avg[0, 0], f[0, 0, 0])
    np.testing.assert_allclose(avg[0, 1], f[0, 1, :2].mean(0))
    np.testing.assert_allclose(avg[0, 2], f[0, 2].mean(0))
    # 'all' mode = plain mean
    np.testing.assert_allclose(np.asarray(masked_avg_pool(feat, "all")), f.mean(2))


def test_pool_features_modes():
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(size=(2, 5, 4, 8)).astype(np.float32))
    count = jnp.asarray(rng.integers(1, 5, size=(2, 5)).astype(np.int32))
    mx = np.asarray(pool_features(feat, count, "max"))
    np.testing.assert_allclose(mx, np.asarray(feat).max(2))
    am = np.asarray(pool_features(feat, count, "avg_max"))
    np.testing.assert_allclose(am[..., :4], np.asarray(feat)[..., :4].max(2))
    np.testing.assert_allclose(am[..., 4:],
                               np.asarray(masked_avg_pool(feat[..., 4:], count)))


def test_three_interpolate_exact_at_known_points():
    """Interpolating back onto the known points themselves must reproduce their
    features (nearest neighbor at distance ~0 dominates the weights)."""
    rng = np.random.default_rng(2)
    known = rng.normal(size=(1, 8, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 8, 5)).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(known), jnp.asarray(known))
    w = interp_weights_from_dists(dist)
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, w))
    np.testing.assert_allclose(out, feats, atol=1e-4)


def test_three_interpolate_weighted_sum():
    feats = jnp.asarray(np.array([[[1.0], [2.0], [4.0]]], np.float32))
    idx = jnp.asarray(np.array([[[0, 1, 2]]], np.int32))
    w = jnp.asarray(np.array([[[0.5, 0.25, 0.25]]], np.float32))
    out = np.asarray(three_interpolate(feats, idx, w))
    np.testing.assert_allclose(out, [[[0.5 + 0.5 + 1.0]]])


