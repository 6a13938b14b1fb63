"""Native (C++) marching tetrahedra vs the numpy reference implementation —
bit-exact vertex/face/normal parity (content; ordering differs by design).
Reference capability: `dpsr_utils/utils.py:246-287` iso-surface extraction."""

import numpy as np
import pytest

from slide_tpu.sap.marching import (marching_tetrahedra,
                                    marching_tetrahedra_numpy, _native_lib,
                                    mc_from_psr)

needs_native = pytest.mark.skipif(_native_lib() is None,
                                  reason="native toolchain unavailable")


def _blob(r=32):
    x = np.linspace(-1, 1, r)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return (0.5 - np.sqrt(X**2 + Y**2 + Z**2)
            + 0.2 * np.sin(4 * X) * np.cos(3 * Y)).astype(np.float32)


@needs_native
def test_native_matches_numpy_bit_exact():
    vol = _blob(32)
    v1, f1, n1 = marching_tetrahedra(vol)          # native
    v2, f2, n2 = marching_tetrahedra_numpy(vol)
    assert v1.shape == v2.shape and f1.shape == f2.shape
    k1, k2 = np.lexsort(v1.T), np.lexsort(v2.T)
    np.testing.assert_array_equal(v1[k1], v2[k2])
    np.testing.assert_array_equal(n1[k1], n2[k2])
    # faces as orderless coordinate keys
    t1 = np.sort(v1[f1].reshape(len(f1), -1), axis=1)
    t2 = np.sort(v2[f2].reshape(len(f2), -1), axis=1)
    np.testing.assert_array_equal(t1[np.lexsort(t1.T)], t2[np.lexsort(t2.T)])


@needs_native
def test_native_matches_numpy_on_noise():
    vol = np.random.RandomState(3).randn(12, 14, 10).astype(np.float32)
    v1, f1, _ = marching_tetrahedra(vol, level=0.1)
    v2, f2, _ = marching_tetrahedra_numpy(vol, level=0.1)
    assert v1.shape == v2.shape and f1.shape == f2.shape
    np.testing.assert_array_equal(v1[np.lexsort(v1.T)], v2[np.lexsort(v2.T)])


@needs_native
def test_native_empty_surface_raises():
    with pytest.raises(ValueError):
        marching_tetrahedra(np.full((8, 8, 8), -1.0, np.float32))
    with pytest.raises(ValueError):
        marching_tetrahedra(np.full((8, 8, 8), 1.0, np.float32))  # all inside


@needs_native
def test_native_winding_agrees_with_gradient():
    vol = _blob(24)
    v, f, n = marching_tetrahedra(vol)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    ref = n[f].sum(axis=1)
    assert (np.sum(fn * ref, axis=1) >= 0).all()


def test_mc_from_psr_batch_uses_same_semantics():
    grid = np.stack([_blob(20), np.full((20, 20, 20), -1.0, np.float32)])
    verts_l, faces_l, normals_l = mc_from_psr(grid, num_threads=2)
    assert len(verts_l[0]) > 0 and len(verts_l[1]) == 0   # empty -> empty arrays
    assert (verts_l[0] >= 0).all() and (verts_l[0] <= 1).all()


def test_mc_from_device_psr_matches_host_path():
    """f16-transfer + pipelined extraction agrees with mc_from_psr to the
    f16 rounding of the field values."""
    import jax.numpy as jnp
    from slide_tpu.sap.marching import mc_from_psr, mc_from_device_psr

    rng = np.random.default_rng(3)
    x, y, z = np.mgrid[:20, :20, :20] / 19.0 - 0.5
    base = (0.35 - np.sqrt(x * x + y * y + z * z))[None]
    g = (base + 0.05 * rng.uniform(-1, 1, (2, 20, 20, 20))).astype(np.float32)
    v1, f1, n1 = mc_from_psr(g)
    v2, f2, n2 = mc_from_device_psr(jnp.asarray(g))
    for a, b in zip(v1, v2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.sort(a.ravel()), np.sort(b.ravel()),
                                   atol=2e-4)
