"""Pallas FPS kernel numerics (interpret mode on CPU; the real-TPU path is
exercised by benchmarks/profile_ae.py and the campaign).  Exact index
equality against the lax.scan implementation, including batch tiling (the
kernel processes 8 batch rows per grid step when B % 8 == 0)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slide_tpu.ops import furthest_point_sample
from slide_tpu.ops.fps import _fps_scan
from slide_tpu.ops.pallas.fps import fps_pallas


@pytest.mark.parametrize("b,n,k", [(3, 100, 16), (8, 256, 64), (16, 128, 128)])
def test_pallas_matches_jnp(b, n, k):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    want = np.asarray(_fps_scan(pts, k))
    got = np.asarray(fps_pallas(pts, k, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_start_and_forced():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((4, 80, 3)).astype(np.float32))
    starts = jnp.asarray(np.array([5, 0, 7, 79], np.int32))
    np.testing.assert_array_equal(
        np.asarray(fps_pallas(pts, 12, start_idx=starts, interpret=True)),
        np.asarray(_fps_scan(pts, 12, start_idx=starts)))
    np.testing.assert_array_equal(
        np.asarray(fps_pallas(pts, 12, num_forced=4, interpret=True)),
        np.asarray(_fps_scan(pts, 12, num_forced=4)))


def test_pallas_extra_channels_ignored():
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.standard_normal((2, 64, 6)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(fps_pallas(pts, 8, interpret=True)),
        np.asarray(_fps_scan(pts[..., :3], 8)))


@pytest.mark.parametrize("b,n,k", [(3, 2049, 16), (2, 129, 64), (5, 200, 33),
                                   (4, 1000, 999), (1, 127, 13), (6, 333, 1)])
def test_pallas_odd_shapes(b, n, k):
    # odd / non-lane-aligned shapes (incl. the 2049-pt centroid-prepended
    # keypoint cloud) — kernel logic is exact; the auto policy still routes
    # unaligned N to the scan on hardware (see ops/fps.py::_use_pallas)
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, n, b).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(fps_pallas(pts, k, start_idx=starts, interpret=True)),
        np.asarray(_fps_scan(pts, k, start_idx=starts)))


@pytest.mark.parametrize("b", [25, 12, 6, 9, 1])
def test_pallas_batch_padding(b):
    # batches that are not a multiple of the 8-row tile are zero-padded and
    # trimmed (Mosaic rejects block dims not divisible by 8 / not equal to
    # the array dim — a B=25 AE encode crashed on hardware pre-fix); the
    # padding path runs in interpret mode too, so this pins its semantics
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.standard_normal((b, 96, 3)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, 96, b).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(fps_pallas(pts, 24, start_idx=starts, interpret=True)),
        np.asarray(_fps_scan(pts, 24, start_idx=starts)))


def test_grad_flows_around_kernel():
    # the AE loss differentiates through gathers of FPS indices; the kernel
    # input must be stop_gradient-ed (pallas_call has no JVP rule) while the
    # gather still carries gradient
    import jax
    from jax import lax

    def f(x):
        idx = fps_pallas(lax.stop_gradient(x), 4, interpret=True)
        sel = jnp.take_along_axis(x, idx[..., None], axis=1)
        return jnp.sum(sel ** 2)

    x = jax.random.normal(jax.random.key(0), (2, 32, 3))
    v, g = jax.value_and_grad(f)(x)
    assert np.isfinite(v) and np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).sum()) > 0


def test_scan_is_default_off_tpu():
    # on the CPU test mesh the auto policy must stay on the scan
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(furthest_point_sample(pts, 8)),
                                  np.asarray(_fps_scan(pts, 8)))
