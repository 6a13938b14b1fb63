"""Device (XLA) marching tetrahedra + mesh sampling vs the host oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.sap.marching import marching_tetrahedra_numpy
from slide_tpu.sap.marching_tpu import (marching_tetrahedra_device,
                                        mc_from_psr_device,
                                        sample_points_from_mesh_device,
                                        device_mesh_to_host)


def _noisy_sphere(r=20, noise=0.04, seed=0):
    rng = np.random.default_rng(seed)
    x, y, z = np.mgrid[:r, :r, :r] / (r - 1.0) - 0.5
    return (0.35 - np.sqrt(x * x + y * y + z * z)
            + noise * rng.standard_normal((r, r, r))).astype(np.float32)


def _face_set(v, f):
    tri = np.sort(np.round(v[f], 4).reshape(len(f), -1), axis=-1)
    return set(map(tuple, tri))


def test_device_extraction_matches_numpy():
    vol = _noisy_sphere()
    v1, f1, n1 = marching_tetrahedra_numpy(vol)
    m = marching_tetrahedra_device(jnp.asarray(vol), 0.0,
                                   f_max=32768, c_max=16384)
    v2, f2, n2 = device_mesh_to_host(jax.tree.map(lambda a: a[None], m), 0)
    assert v1.shape == v2.shape and f1.shape == f2.shape
    sv1 = np.array(sorted(map(tuple, np.round(v1, 5))))
    sv2 = np.array(sorted(map(tuple, np.round(v2, 5))))
    np.testing.assert_allclose(sv1, sv2, atol=1e-4)
    assert _face_set(v1, f1) == _face_set(v2, f2)
    nmap = {tuple(np.round(v, 4)): n for v, n in zip(v1, n1)}
    for v, n in zip(v2[::7], n2[::7]):
        np.testing.assert_allclose(nmap[tuple(np.round(v, 4))], n, atol=1e-5)


def test_device_extraction_nonzero_level_and_batch():
    vols = np.stack([_noisy_sphere(seed=1), _noisy_sphere(seed=2)])
    out = mc_from_psr_device(jnp.asarray(vols), zero_level=0.05,
                             f_max=32768, c_max=16384)
    for i in range(2):
        v1, f1, _ = marching_tetrahedra_numpy(vols[i], level=0.05)
        v2, f2, _ = device_mesh_to_host(out, i)
        # mc_from_psr_device scales verts into [0, 1)
        np.testing.assert_allclose(
            np.array(sorted(map(tuple, np.round(v1 / vols.shape[-1], 5)))),
            np.array(sorted(map(tuple, np.round(v2, 5)))), atol=1e-4)
        assert len(f1) == len(f2)


def test_empty_and_overflow_reporting():
    flat = jnp.ones((8, 8, 8)) * 2.0          # no crossing
    m = marching_tetrahedra_device(flat, 0.0, f_max=64, c_max=64)
    assert int(m["n_faces"]) == 0
    with pytest.raises(ValueError, match="empty"):
        device_mesh_to_host(jax.tree.map(lambda a: a[None], m), 0)
    vol = _noisy_sphere()
    small = marching_tetrahedra_device(jnp.asarray(vol), 0.0,
                                       f_max=8, c_max=8192)
    assert int(small["n_faces"]) > 8          # true count still reported
    with pytest.raises(OverflowError):
        device_mesh_to_host(jax.tree.map(lambda a: a[None], small), 0)


def test_device_sampler_matches_host_statistics():
    from slide_tpu.sap.mesh_sampling import sample_points_from_mesh

    vol = _noisy_sphere(noise=0.0)
    m = marching_tetrahedra_device(jnp.asarray(vol), 0.0,
                                   f_max=32768, c_max=16384)
    pts_d, nrm_d = sample_points_from_mesh_device(m, jax.random.key(0), 4096)
    v, f, _ = device_mesh_to_host(jax.tree.map(lambda a: a[None], m), 0)
    pts_h, nrm_h = sample_points_from_mesh(v, f, 4096,
                                           np.random.default_rng(0))
    # same surface -> matching point statistics (mean radius of the sphere)
    c = (vol.shape[0] - 1) / 2.0
    rad_d = np.linalg.norm(np.asarray(pts_d) - c, axis=1)
    rad_h = np.linalg.norm(pts_h - c, axis=1)
    np.testing.assert_allclose(rad_d.mean(), rad_h.mean(), rtol=0.01)
    np.testing.assert_allclose(np.asarray(pts_d).mean(0), pts_h.mean(0),
                               atol=0.15)
    assert np.all(np.abs(np.linalg.norm(np.asarray(nrm_d), axis=1) - 1) < 1e-4)


def test_count_active_cells_matches_extraction():
    from slide_tpu.sap.marching_tpu import count_active_cells

    vols = np.stack([_noisy_sphere(seed=3), np.ones((20, 20, 20), np.float32)])
    counts = np.asarray(count_active_cells(jnp.asarray(vols)))
    m = marching_tetrahedra_device(jnp.asarray(vols[0]), 0.0,
                                   f_max=32768, c_max=16384)
    assert counts[0] == int(m["n_cells"])
    assert counts[1] == 0


def test_count_cells_and_faces_exact():
    from slide_tpu.sap.marching_tpu import count_cells_and_faces

    vols = np.stack([_noisy_sphere(seed=6), _noisy_sphere(seed=7, noise=0.0),
                     np.full((20, 20, 20), -1.0, np.float32)])
    cells, faces = (np.asarray(a) for a in
                    count_cells_and_faces(jnp.asarray(vols)))
    for i in range(2):
        m = marching_tetrahedra_device(jnp.asarray(vols[i]), 0.0,
                                       f_max=65536, c_max=16384)
        assert cells[i] == int(m["n_cells"])
        assert faces[i] == int(m["n_faces"])      # exact dense triangle count
    assert cells[2] == 0 and faces[2] == 0


def test_count_cells_and_faces_nonzero_level():
    from slide_tpu.sap.marching_tpu import count_cells_and_faces

    vol = _noisy_sphere(seed=8)
    cells, faces = (np.asarray(a) for a in
                    count_cells_and_faces(jnp.asarray(vol)[None], 0.07))
    m = marching_tetrahedra_device(jnp.asarray(vol), 0.07,
                                   f_max=65536, c_max=16384)
    assert cells[0] == int(m["n_cells"]) and faces[0] == int(m["n_faces"])


def test_bucketed_extract_and_sample_matches_fixed_budget():
    from slide_tpu.sap.marching_tpu import extract_and_sample_device

    vols = np.stack([_noisy_sphere(seed=4), _noisy_sphere(seed=5, noise=0.0)])
    grid = jnp.asarray(vols)
    # tiny buckets force a retry path for the noisy sample (faces > 4*cells
    # never happens, but c-bucket selection + padding-independence do)
    buckets = ((64, 256), (4096, 16384), (16384, 65536))
    pts, nrm, nf, nc, ovf = extract_and_sample_device(
        grid, jax.random.key(7), 512, buckets=buckets)
    assert pts.shape == (2, 512, 3) and nrm.shape == (2, 512, 3)
    assert not ovf.any()          # both fit the given ladder
    for i in range(2):
        ref = marching_tetrahedra_device(jnp.asarray(vols[i]), 0.0,
                                         f_max=65536, c_max=16384)
        assert nf[i] == int(ref["n_faces"])        # content budget-independent
        assert nc[i] == int(ref["n_cells"])
        # sampled points lie on the [0,1)-scaled surface
        c = 0.5 * (vols.shape[-1] - 1) / vols.shape[-1]
        rad = np.linalg.norm(pts[i] - c, axis=1)
        assert 0.2 < rad.mean() < 0.45
    assert np.all(np.abs(np.linalg.norm(nrm.reshape(-1, 3), axis=1) - 1) < 1e-3)
