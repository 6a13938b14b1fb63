"""Golden tests for furthest point sampling against a brute-force numpy
reference (mirroring the reference's CUDA-vs-python validation pattern,
`models/pvd/metrics/ChamferDistancePytorch/unit_test.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.ops import furthest_point_sample, sample_keypoints, fps_subsample


def fps_numpy(pts, k, start=0, num_forced=0):
    n = pts.shape[0]
    min_d = np.full((n,), np.inf)
    sel = [start]
    for i in range(1, k):
        d = np.sum((pts - pts[sel[-1]]) ** 2, axis=-1)
        min_d = np.minimum(min_d, d)
        nxt = i if i < num_forced else int(np.argmax(min_d))
        sel.append(nxt)
    return np.array(sel)


@pytest.mark.parametrize("n,k", [(64, 8), (200, 16), (33, 33)])
def test_fps_matches_numpy(n, k):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4, n, 3)).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(pts), k))
    for b in range(4):
        want = fps_numpy(pts[b], k)
        np.testing.assert_array_equal(got[b], want)


def test_fps_random_start():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(3, 50, 3)).astype(np.float32)
    starts = np.array([5, 0, 49], dtype=np.int32)
    got = np.asarray(furthest_point_sample(jnp.asarray(pts), 10, start_idx=jnp.asarray(starts)))
    for b in range(3):
        want = fps_numpy(pts[b], 10, start=starts[b])
        np.testing.assert_array_equal(got[b], want)


def test_fps_forced_initial():
    """First `num_forced` selections are indices 0..num_forced-1 regardless of
    geometry (points_sampling.py:101-103 semantics)."""
    rng = np.random.default_rng(2)
    initial = rng.normal(size=(2, 4, 3)).astype(np.float32)
    rest = rng.normal(size=(2, 40, 3)).astype(np.float32)
    pts = np.concatenate([initial, rest], axis=1)
    got = np.asarray(furthest_point_sample(jnp.asarray(pts), 12, num_forced=4))
    assert (got[:, :4] == np.arange(4)).all()
    for b in range(2):
        want = fps_numpy(pts[b], 12, num_forced=4)
        np.testing.assert_array_equal(got[b], want)


def test_fps_spreads_points():
    # FPS of a fine grid should cover the domain: selected points must be far apart.
    xs = np.linspace(-1, 1, 32)
    grid = np.stack(np.meshgrid(xs, xs), -1).reshape(1, -1, 2).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(grid), 4))
    sel = grid[0, idx[0]]
    d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
    assert d[np.triu_indices(4, 1)].min() > 1.0


def test_sample_keypoints_centroid_first():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(2, 100, 3)).astype(np.float32)
    kp, idx = sample_keypoints(jnp.asarray(pts), 8, add_centroid=True)
    np.testing.assert_allclose(np.asarray(kp)[:, 0], pts.mean(axis=1), rtol=1e-5)
    assert (np.asarray(idx)[:, 0] == 0).all()
    # Remaining keypoints are actual cloud points.
    assert (np.asarray(idx)[:, 1:] >= 1).all()


def test_sample_keypoints_random_modes():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(2, 60, 3)).astype(np.float32)
    kp, idx = sample_keypoints(jnp.asarray(pts), 6, add_centroid=False,
                               key=jax.random.key(0))
    assert kp.shape == (2, 6, 3)
    kp2, idx2 = sample_keypoints(jnp.asarray(pts), 6, add_centroid=False,
                                 random_subsample=True, key=jax.random.key(0))
    assert kp2.shape == (2, 6, 3)
    # random_subsample shares one permutation across the batch (reference behavior)
    np.testing.assert_array_equal(np.asarray(idx2)[0], np.asarray(idx2)[1])
    # indices must be unique within each cloud for both modes
    for arr in (np.asarray(idx), np.asarray(idx2)):
        for b in range(2):
            assert len(set(arr[b].tolist())) == arr.shape[1]


def test_fps_subsample_keeps_channels():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(2, 50, 6)).astype(np.float32)
    out = fps_subsample(jnp.asarray(pts), 10)
    assert out.shape == (2, 10, 6)
    # every output row must be an input row
    for b in range(2):
        for r in np.asarray(out)[b]:
            assert (np.abs(pts[b] - r).sum(-1) < 1e-6).any()
