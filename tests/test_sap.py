"""SAP tests: DPSR cross-validated against the REFERENCE torch implementation,
marching tetrahedra geometry checks, mirroring semantics."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.sap import (DPSR, point_rasterize, grid_interp, mirror,
                           mirror_and_concat, shapenet_psr_normalize,
                           marching_tetrahedra, mc_from_psr,
                           network_output_to_dpsr_grid)

torch = pytest.importorskip("torch")


def _load_ref_dpsr():
    """Import the reference DPSR; stub its unused heavyweight imports."""
    for name in ("trimesh", "plyfile", "igl", "skimage", "skimage.measure",
                 "pytorch3d.renderer", "yaml_unused"):
        if name not in sys.modules and name != "yaml_unused":
            mod = types.ModuleType(name)
            if name == "plyfile":
                mod.PlyData = object
            if name == "igl":
                mod.adjacency_matrix = None
                mod.connected_components = None
            if name == "skimage.measure":
                mod.marching_cubes = None
            sys.modules[name] = mod
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    from torch_ref import load_reference_modules
    load_reference_modules()
    p3d_struct = sys.modules.get("pytorch3d.structures")
    if p3d_struct is None:
        p3d_struct = types.ModuleType("pytorch3d.structures")
        sys.modules["pytorch3d.structures"] = p3d_struct
    if not hasattr(p3d_struct, "Meshes"):
        p3d_struct.Meshes = object
    rend = sys.modules["pytorch3d.renderer"]
    rend.PerspectiveCameras = object
    rend.rasterize_meshes = None
    import dpsr_utils.dpsr as ref_dpsr
    return ref_dpsr


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((2, 300, 3))
    n = d / np.linalg.norm(d, axis=-1, keepdims=True)
    v = 0.5 + 0.25 * n           # sphere of radius .25 centered at .5
    return v.astype(np.float32), n.astype(np.float32)


def test_point_rasterize_against_reference(cloud):
    ref = _load_ref_dpsr()
    from dpsr_utils.utils import point_rasterize as ref_rasterize
    v, n = cloud
    res = (16, 16, 16)
    got = np.asarray(point_rasterize(jnp.asarray(v), jnp.asarray(n), res))
    want = ref_rasterize(torch.from_numpy(v), torch.from_numpy(n),
                         list(res)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_grid_interp_against_reference(cloud):
    _load_ref_dpsr()
    from dpsr_utils.utils import grid_interp as ref_interp
    rng = np.random.default_rng(1)
    grid = rng.standard_normal((2, 12, 12, 12, 1)).astype(np.float32)
    pts = rng.uniform(0, 0.99, (2, 50, 3)).astype(np.float32)
    got = np.asarray(grid_interp(jnp.asarray(grid), jnp.asarray(pts)))
    want = ref_interp(torch.from_numpy(grid), torch.from_numpy(pts),
                      batched=True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dpsr_against_reference(cloud):
    ref_dpsr = _load_ref_dpsr()
    v, n = cloud
    res = (32, 32, 32)
    mine = DPSR(res, sig=2)
    got = np.asarray(jax.jit(mine)(jnp.asarray(v), jnp.asarray(n)))
    ref = ref_dpsr.DPSR(res, sig=2)
    with torch.no_grad():
        want = ref(torch.from_numpy(v), torch.from_numpy(n)).numpy()
    assert got.shape == (2, 32, 32, 32)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dpsr_is_differentiable(cloud):
    v, n = cloud
    dpsr = DPSR((16, 16, 16), sig=2)

    def loss(normals):
        return jnp.mean(jnp.tanh(dpsr(jnp.asarray(v), normals)) ** 2)

    g = jax.grad(loss)(jnp.asarray(n))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_marching_tetrahedra_sphere():
    r = 32
    x = np.linspace(-1, 1, r)
    g = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1)
    sdf = 0.6 - np.linalg.norm(g, axis=-1)     # >0 inside sphere radius .6
    verts, faces, normals = marching_tetrahedra(sdf, level=0.0)
    # vertices lie on the iso-surface
    centers = (verts / (r - 1)) * 2 - 1
    radii = np.linalg.norm(centers, axis=1)
    np.testing.assert_allclose(radii, 0.6, atol=0.05)
    # faces index valid vertices, normals unit, pointing outward (down-gradient)
    assert faces.min() >= 0 and faces.max() < len(verts)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-5)
    outward = np.sum(normals * centers / radii[:, None], axis=1)
    assert (outward > 0.8).mean() > 0.95
    # consistent winding: face normals agree with vertex normals
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    ref = normals[faces].sum(1)
    agree = (np.sum(fn * ref, axis=1) > 0).mean()
    assert agree > 0.99


def test_marching_empty_raises():
    with pytest.raises(ValueError):
        marching_tetrahedra(np.ones((8, 8, 8)), level=0.0)


def test_mc_from_psr_batch_scaling():
    r = 16
    x = np.linspace(-1, 1, r)
    g = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1)
    sdf = 0.5 - np.linalg.norm(g, axis=-1)
    verts, faces, normals = mc_from_psr(np.stack([sdf, sdf]))
    assert len(verts) == 2
    assert verts[0].max() < 1.0 and verts[0].min() >= 0.0


def test_mirror_semantics():
    rng = np.random.default_rng(2)
    pc = rng.standard_normal((2, 20, 6)).astype(np.float32)
    m = np.asarray(mirror(jnp.asarray(pc), axis=2))
    center = pc[..., :3].mean(axis=1, keepdims=True)
    np.testing.assert_allclose(m[..., 2], 2 * center[..., 2] - pc[..., 2], atol=1e-5)
    np.testing.assert_allclose(m[..., 5], -pc[..., 5], atol=1e-6)   # normal z flipped
    np.testing.assert_allclose(m[..., 0], pc[..., 0], atol=1e-6)    # x untouched


def test_mirror_and_concat():
    rng = np.random.default_rng(3)
    pc = jnp.asarray(rng.standard_normal((2, 16, 6)).astype(np.float32))
    (full, down) = mirror_and_concat(pc, axis=2, num_points=[8],
                                     attach_label=True, permute=True,
                                     key=jax.random.key(0))
    assert full.shape == (2, 32, 7)
    assert set(np.unique(np.asarray(full[..., -1]))) == {-1.0, 1.0}
    assert down.shape == (2, 8, 7)


def test_shapenet_psr_normalize():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-3, 5, (2, 50, 3)).astype(np.float32))
    out = np.asarray(shapenet_psr_normalize(x))
    extent = out.max(axis=1) - out.min(axis=1)
    np.testing.assert_allclose(extent.max(axis=1), 0.99, atol=1e-5)
    np.testing.assert_allclose((out.max(axis=1) + out.min(axis=1)) / 2, 0, atol=1e-5)


def test_network_output_to_dpsr_grid_mirrored():
    rng = np.random.default_rng(5)
    b, n, factor = 2, 32, 3
    x = jnp.asarray(rng.standard_normal((b, n, 7)).astype(np.float32) * 0.3)  # +indicator
    disp = jnp.asarray(rng.standard_normal((b, n, 6 * factor)).astype(np.float32))
    dpsr = DPSR((16, 16, 16), sig=2)
    cfg = {"point_upsample_factor": factor, "first_refine_coarse_points": False,
           "include_displacement_center_to_final_output": False,
           "output_scale_factor": 0.001}
    grid, pts, normals = jax.jit(
        lambda xx, dd: network_output_to_dpsr_grid(
            xx, dd, dpsr, 1, cfg, last_dim_as_indicator=True))(x, disp)
    assert grid.shape == (b, 16, 16, 16)
    assert pts.shape == (b, n * factor, 3)
    assert float(pts.min()) >= 0.0 and float(pts.max()) <= 0.99
    assert np.isfinite(np.asarray(grid)).all()
