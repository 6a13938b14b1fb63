"""Pallas FPS kernel numerics (interpret mode on CPU; the real-TPU path is
exercised by bench/verification runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slide_tpu.ops import furthest_point_sample
from slide_tpu.ops.pallas.fps import fps_pallas


@pytest.mark.parametrize("n,k", [(100, 16), (256, 64)])
def test_pallas_matches_jnp(n, k):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((3, n, 3)).astype(np.float32))
    want = np.asarray(furthest_point_sample(pts, k))
    got = np.asarray(fps_pallas(pts, k, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_start_and_forced():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((4, 80, 3)).astype(np.float32))
    starts = jnp.asarray(np.array([5, 0, 7, 79], np.int32))
    np.testing.assert_array_equal(
        np.asarray(fps_pallas(pts, 12, start_idx=starts, interpret=True)),
        np.asarray(furthest_point_sample(pts, 12, start_idx=starts)))
    np.testing.assert_array_equal(
        np.asarray(fps_pallas(pts, 12, num_forced=4, interpret=True)),
        np.asarray(furthest_point_sample(pts, 12, num_forced=4)))


def test_pallas_extra_channels_ignored():
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.standard_normal((2, 64, 6)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(fps_pallas(pts, 8, interpret=True)),
        np.asarray(furthest_point_sample(pts[..., :3], 8)))
