"""Golden tests for kNN / ball query / three_nn vs brute-force numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from slide_tpu.ops import knn_points, ball_query, three_nn, pairwise_sqdist


def test_pairwise_sqdist():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 3)).astype(np.float32)
    y = rng.normal(size=(2, 7, 3)).astype(np.float32)
    want = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("k", [1, 3, 8])
def test_knn_matches_numpy(k):
    rng = np.random.default_rng(1)
    q = rng.normal(size=(3, 20, 3)).astype(np.float32)
    p = rng.normal(size=(3, 50, 3)).astype(np.float32)
    d, idx = knn_points(jnp.asarray(q), jnp.asarray(p), k)
    d, idx = np.asarray(d), np.asarray(idx)
    full = ((q[:, :, None] - p[:, None]) ** 2).sum(-1)
    want_idx = np.argsort(full, axis=-1, kind="stable")[..., :k]
    np.testing.assert_array_equal(idx, want_idx)
    np.testing.assert_allclose(d, np.take_along_axis(full, want_idx, -1), atol=1e-4)
    # ascending order
    assert (np.diff(d, axis=-1) >= -1e-6).all()


def test_ball_query_semantics():
    """Reference CUDA semantics (ball_query_gpu.cu:9-57): first-k in index
    order, pad with first found, zero-neighbor queries keep index 0."""
    pts = np.zeros((1, 6, 3), np.float32)
    pts[0, :, 0] = [0.0, 0.05, 0.08, 0.5, 0.09, 2.0]
    # query at origin, radius .1: neighbors = idx 0,1,2,4 (in index order)
    q = np.zeros((1, 2, 3), np.float32)
    q[0, 1, 0] = 10.0  # far away: no neighbors
    idx, counts = ball_query(jnp.asarray(q), jnp.asarray(pts), 0.1, 3)
    idx, counts = np.asarray(idx), np.asarray(counts)
    np.testing.assert_array_equal(counts, [[3, 0]])
    np.testing.assert_array_equal(idx[0, 0], [0, 1, 2])   # first 3 in index order
    np.testing.assert_array_equal(idx[0, 1], [0, 0, 0])   # no neighbors -> 0

    # padding: radius catches only idx 2 and 4 for a query at 0.085
    q2 = np.zeros((1, 1, 3), np.float32)
    q2[0, 0, 0] = 0.085
    idx2, counts2 = ball_query(jnp.asarray(q2), jnp.asarray(pts), 0.012, 4)
    # |0.085-0.08|=.005 (idx 2), |0.085-0.09|=.005 (idx 4), others > .012
    np.testing.assert_array_equal(np.asarray(counts2), [[2]])
    np.testing.assert_array_equal(np.asarray(idx2)[0, 0], [2, 4, 2, 2])  # pad=first found


def test_ball_query_counts_cap():
    rng = np.random.default_rng(2)
    pts = rng.uniform(size=(2, 100, 3)).astype(np.float32) * 0.01  # all clustered
    q = pts[:, :5]
    idx, counts = ball_query(jnp.asarray(q), jnp.asarray(pts), 1.0, 8)
    assert (np.asarray(counts) == 8).all()
    assert np.asarray(idx).max() < 100


def test_three_nn():
    rng = np.random.default_rng(3)
    unk = rng.normal(size=(2, 15, 3)).astype(np.float32)
    kn = rng.normal(size=(2, 9, 3)).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unk), jnp.asarray(kn))
    full = np.sqrt(((unk[:, :, None] - kn[:, None]) ** 2).sum(-1))
    want_idx = np.argsort(full, axis=-1, kind="stable")[..., :3]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(dist), np.take_along_axis(full, want_idx, -1),
                               atol=1e-4)
