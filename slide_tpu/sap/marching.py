"""Iso-surface extraction on the host — capability equivalent of the
reference's skimage `measure.marching_cubes` usage (`dpsr_utils/utils.py:
246-287`, `dpsr_evaluation.py:291-340`).

We implement MARCHING TETRAHEDRA instead of table-driven marching cubes: each
grid cube is split into 6 tetrahedra; every tetrahedron contributes 0-2
triangles determined by its 16 sign configurations, which are enumerable
without the classic 256-entry triangle table.  Output: vertices on grid edges
(deduplicated), faces, and per-vertex normals from the NEGATED field gradient
(matching the reference's `-normals` convention, `utils.py:285`).

Two implementations with identical semantics: a native C++ single-pass one
(slide_tpu/native/marching.cpp, compiled on first use, ~20-100x the numpy
path — marching dominated the end-to-end pipeline 20:1 before it) and the
vectorized numpy fallback below.  `SLIDE_TPU_NATIVE=0` forces numpy.
"""

from __future__ import annotations

import ctypes

import numpy as np

# cube corner offsets, standard numbering
_CORNERS = np.array([
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)], np.int64)

# 6-tetrahedra decomposition around the 0-6 diagonal
_TETS = np.array([
    (0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
    (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6)], np.int64)

# tetrahedron edges by local vertex pair
_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], np.int64)

# case table: inside-bitmask -> list of triangles, each a triple of edge ids.
# Winding is normalized afterwards against the field gradient.
_CASES: dict[int, list[tuple[int, int, int]]] = {
    0b0001: [(0, 1, 2)],
    0b0010: [(0, 4, 3)],
    0b0100: [(1, 3, 5)],
    0b1000: [(2, 5, 4)],
    0b1110: [(0, 2, 1)],
    0b1101: [(0, 3, 4)],
    0b1011: [(1, 5, 3)],
    0b0111: [(2, 4, 5)],
    0b0011: [(1, 3, 4), (1, 4, 2)],
    0b1100: [(1, 4, 3), (1, 2, 4)],
    0b0101: [(0, 3, 5), (0, 5, 2)],
    0b1010: [(0, 5, 3), (0, 2, 5)],
    0b0110: [(0, 4, 5), (0, 5, 1)],
    0b1001: [(0, 5, 4), (0, 1, 5)],
}


_NATIVE_READY = False


def _native_lib():
    global _NATIVE_READY
    from slide_tpu.native import load_library
    lib = load_library("marching")
    if lib is not None and not _NATIVE_READY:
        lib.mt_run.restype = ctypes.c_void_p
        lib.mt_run.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, ctypes.c_float]
        lib.mt_num_verts.restype = ctypes.c_int64
        lib.mt_num_verts.argtypes = [ctypes.c_void_p]
        lib.mt_num_faces.restype = ctypes.c_int64
        lib.mt_num_faces.argtypes = [ctypes.c_void_p]
        lib.mt_copy.restype = None
        lib.mt_copy.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int64),
                                ctypes.POINTER(ctypes.c_float)]
        lib.mt_free.restype = None
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _NATIVE_READY = True
    return lib


def _marching_tetrahedra_native(lib, vol: np.ndarray, level: float):
    vol = np.ascontiguousarray(vol, np.float32)
    r0, r1, r2 = vol.shape
    h = lib.mt_run(vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   r0, r1, r2, ctypes.c_float(level))
    if not h:
        raise ValueError("level surface is empty")
    try:
        nv, nf = lib.mt_num_verts(h), lib.mt_num_faces(h)
        verts = np.empty((nv, 3), np.float32)
        faces = np.empty((nf, 3), np.int64)
        normals = np.empty((nv, 3), np.float32)
        lib.mt_copy(h, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    finally:
        lib.mt_free(h)
    return verts, faces, normals


def marching_tetrahedra(vol: np.ndarray, level: float = 0.0):
    """Extract the `level` iso-surface of a (r0, r1, r2) scalar field.

    Returns (verts (V, 3) in grid-index coordinates, faces (F, 3) int,
    normals (V, 3) unit, = -grad field).  Raises ValueError if the surface is
    empty (mirroring skimage's behavior).  Uses the native C++ pass when
    available; vertex/face ORDER differs between backends (content agrees).
    """
    lib = _native_lib()
    # the native pass allocates a perfect-dedup table of 28 bytes/voxel
    # (~59 MB at 128^3 but ~3.8 GB at 512^3) — fall back to the numpy path
    # (prefilter + hash-free unique) when that table would exceed ~1 GB
    if lib is not None and int(np.prod(vol.shape)) * 28 <= (1 << 30):
        return _marching_tetrahedra_native(lib, vol, level)
    return marching_tetrahedra_numpy(vol, level)


def marching_tetrahedra_numpy(vol: np.ndarray, level: float = 0.0):
    """Pure-numpy reference implementation (see module docstring)."""
    vol = np.asarray(vol, np.float32)
    r0, r1, r2 = vol.shape
    # prefilter: only cubes whose corners straddle the level contribute
    # triangles (a ~100x reduction at 128^3 — without this the host pass takes
    # seconds per grid)
    inside_count = np.zeros((r0 - 1, r1 - 1, r2 - 1), np.int8)
    for dx, dy, dz in _CORNERS:
        inside_count += (vol[dx:r0 - 1 + dx, dy:r1 - 1 + dy,
                             dz:r2 - 1 + dz] > level)
    crossing = (inside_count > 0) & (inside_count < 8)
    bx, by, bz = np.nonzero(crossing)
    base = np.stack([bx, by, bz], axis=-1)                        # (C, 3)
    corner_idx = base[:, None, :] + _CORNERS[None, :, :]          # (C, 8, 3)
    lin = (corner_idx[..., 0] * (r1 * r2) + corner_idx[..., 1] * r2
           + corner_idx[..., 2])                                  # (C, 8)
    flat = vol.reshape(-1)

    tet_vid = lin[:, _TETS].reshape(-1, 4)                        # (T, 4)
    tet_val = flat[tet_vid]                                       # (T, 4)
    inside = tet_val > level
    case = (inside * np.array([1, 2, 4, 8])).sum(axis=1)          # (T,)

    tri_edge_v0 = []   # global vertex id of each triangle corner's edge start
    tri_edge_v1 = []
    for code, tris in _CASES.items():
        sel = np.nonzero(case == code)[0]
        if sel.size == 0:
            continue
        vids = tet_vid[sel]                                       # (S, 4)
        for tri in tris:
            e = _EDGES[list(tri)]                                 # (3, 2) local
            tri_edge_v0.append(vids[:, e[:, 0]])                  # (S, 3)
            tri_edge_v1.append(vids[:, e[:, 1]])
    if not tri_edge_v0:
        raise ValueError("level surface is empty")
    ev0 = np.concatenate(tri_edge_v0, axis=0)                     # (F, 3)
    ev1 = np.concatenate(tri_edge_v1, axis=0)

    # deduplicate edge-vertices: key = sorted global id pair
    lo = np.minimum(ev0, ev1).reshape(-1)
    hi = np.maximum(ev0, ev1).reshape(-1)
    keys = lo * (r0 * r1 * r2) + hi
    uniq, faces_flat = np.unique(keys, return_inverse=True)
    faces = faces_flat.reshape(-1, 3)
    u_lo = (uniq // (r0 * r1 * r2)).astype(np.int64)
    u_hi = (uniq % (r0 * r1 * r2)).astype(np.int64)

    def unflatten(ids):
        return np.stack([ids // (r1 * r2), (ids // r2) % r1, ids % r2], -1)

    p0 = unflatten(u_lo).astype(np.float32)
    p1 = unflatten(u_hi).astype(np.float32)
    v0 = flat[u_lo]
    v1 = flat[u_hi]
    t = (level - v0) / np.where(np.abs(v1 - v0) < 1e-12, 1e-12, v1 - v0)
    t = np.clip(t, 0.0, 1.0)
    verts = p0 + t[:, None] * (p1 - p0)                           # (V, 3)

    # drop degenerate faces (triangles with repeated vertices)
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    faces = faces[good]

    # vertex normals: negated trilinear-interpolated central-difference gradient
    grad = np.stack(np.gradient(vol), axis=-1)                    # (r0,r1,r2,3)
    vi = np.clip(np.round(verts).astype(np.int64), 0,
                 [r0 - 1, r1 - 1, r2 - 1])
    normals = -grad[vi[:, 0], vi[:, 1], vi[:, 2]]
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.where(norm < 1e-12, 1.0, norm)

    # consistent winding: face normal should agree with the vertex normals
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    ref = (normals[faces[:, 0]] + normals[faces[:, 1]] + normals[faces[:, 2]])
    flip = np.sum(fn * ref, axis=1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    return verts, faces, normals


def mc_from_psr(psr_grid, real_scale: bool = False, zero_level: float = 0.0,
                num_threads: int = 0):
    """Batch iso-surface extraction from a (B, r, r, r) PSR grid, vertices
    scaled to [0, 1) (or [0, 1] with real_scale) — the reference's
    `mc_from_psr` (`utils.py:246-287`).

    num_threads > 1 extracts batch elements concurrently (numpy releases the
    GIL in the hot ops).  Returns (list of verts, list of faces,
    list of normals); an empty surface yields empty arrays for that element
    when batched (a lone element still raises, matching skimage).
    """
    grid = np.asarray(psr_grid)
    s = grid.shape[-1]

    def one(i):
        try:
            v, f, n = marching_tetrahedra(grid[i], level=zero_level)
        except ValueError:
            if grid.shape[0] == 1:
                raise
            return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                    np.zeros((0, 3), np.float32))
        v = v / (s - 1) if real_scale else v / s
        return v.astype(np.float32), f, n.astype(np.float32)

    if num_threads > 1 and grid.shape[0] > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(num_threads) as pool:
            results = list(pool.map(one, range(grid.shape[0])))
    else:
        results = [one(i) for i in range(grid.shape[0])]
    verts_l = [r[0] for r in results]
    faces_l = [r[1] for r in results]
    normals_l = [r[2] for r in results]
    return verts_l, faces_l, normals_l

def mc_from_device_psr(psr_grid_dev, real_scale: bool = False,
                       zero_level: float = 0.0, transfer_dtype="float16"):
    """`mc_from_psr` for a (B, r, r, r) grid still ON the accelerator.

    The naive path (`np.asarray(grid)` then march) is transfer-bound on
    remote-device setups: a 16x128^3 f32 batch is 134 MB over the link.  This
    variant (a) casts to `transfer_dtype` (default f16 — the SAP grid is
    tanh-bounded, so the zero crossing moves by ~1e-3 grid units) on device,
    halving the traffic, and (b) overlaps each sample's device->host transfer
    with the (native C++) extraction of the previous sample.

    Returns (verts_l, faces_l, normals_l) like `mc_from_psr`.
    """
    import jax
    import jax.numpy as jnp

    b = psr_grid_dev.shape[0]
    s = psr_grid_dev.shape[-1]
    if transfer_dtype is not None:
        # eager on-device cast (the compiled kernel is cached across calls;
        # a fresh jit wrapper per call would re-trace every batch)
        psr_grid_dev = psr_grid_dev.astype(jnp.dtype(transfer_dtype))

    def fetch(i):
        return np.asarray(jax.device_get(psr_grid_dev[i]), np.float32)

    def one(vol):
        try:
            v, f, n = marching_tetrahedra(vol, level=zero_level)
        except ValueError:
            if b == 1:
                raise
            return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                    np.zeros((0, 3), np.float32))
        v = v / (s - 1) if real_scale else v / s
        return v.astype(np.float32), f, n.astype(np.float32)

    from concurrent.futures import ThreadPoolExecutor

    results = []
    with ThreadPoolExecutor(1) as fpool:
        nxt = fpool.submit(fetch, 0)
        for i in range(b):
            cur = nxt.result()
            if i + 1 < b:
                nxt = fpool.submit(fetch, i + 1)
            results.append(one(cur))
    return ([r[0] for r in results], [r[1] for r in results],
            [r[2] for r in results])
