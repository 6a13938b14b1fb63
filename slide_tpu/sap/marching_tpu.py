"""Marching tetrahedra ON the accelerator (XLA/jit) with fixed output
budgets — the device-resident counterpart of `sap/marching.py` (same 6-tet
decomposition, same case tables, same vertex/normal math; reference
capability: `dpsr_utils/utils.py:246-287` mc_from_psr + pytorch3d
`sample_points_from_meshes`, `dpsr_evaluation.py:310-327`).

Why: the host path must ship the full PSR grid off-device (a 16x128^3 batch
is 67 MB even at f16), which dominates the end-to-end pipeline on
remote-device links.  Extracting on device lets the whole
generate -> SAP -> mesh -> point-sample pipeline stay device-resident;
what leaves the chip is 2048 sampled points per shape (24 KB).

Design (all shapes static, jit/scan-friendly — no data-dependent shapes):
  - Active cells (corner signs straddle the level) are compacted WITHOUT
    scatters: cumsum over the flat crossing mask + one searchsorted per
    output slot (gather-only, TPU-friendly).
  - Triangles are emitted with PER-CORNER geometry (position + normal +
    canonical edge key) — no on-device vertex dedup.  Point sampling never
    needs dedup (areas are identical), and host export dedups the ~3*F keys
    in microseconds.  This keeps the device work at O(active cells), not
    O(grid * 7) — the dedup-on-device variant cost ~300 ms/128^3 grid, this
    one is an order of magnitude lighter.
  - Each edge's canonical key is (base grid vertex) * 7 + (positive offset
    class), so host dedup reproduces EXACTLY the numpy path's vertex set.
  - Triangle case tables are tiny dense int32 arrays traced as constants.

Budget overflow (n_faces > f_max, n_cells > c_max) is reported, not hidden;
callers retry with bigger budgets or fall back to the host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from slide_tpu.sap.marching import _CASES, _CORNERS, _EDGES, _TETS

# the 7 canonical positive edge-offset classes (axis x3, face diag x3, body)
_CLASS_OFFSETS = np.array([
    (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)], np.int64)


def _build_tables():
    """Static tables:
    TRI[case, k, j]   -> local tet-edge id of corner j of the k-th triangle
                         (or -1 when the case has < k+1 triangles)
    NTRI[case]        -> number of triangles for the case
    EBASE[tet, edge]  -> local cube-corner id of the edge's canonical base
    ECLS[tet, edge]   -> offset class id (0..6)
    """
    tri = -np.ones((16, 2, 3), np.int32)
    ntri = np.zeros((16,), np.int32)
    for case, tris in _CASES.items():
        ntri[case] = len(tris)
        for k, t in enumerate(tris):
            tri[case, k] = t
    ebase = np.zeros((6, 6), np.int32)
    ecls = np.zeros((6, 6), np.int32)
    cls_of = {tuple(o): i for i, o in enumerate(_CLASS_OFFSETS)}
    for t in range(6):
        for e in range(6):
            a, b = _TETS[t][_EDGES[e][0]], _TETS[t][_EDGES[e][1]]
            ca, cb = _CORNERS[a], _CORNERS[b]
            if np.all(cb - ca >= 0):
                base, off = a, tuple(cb - ca)
            elif np.all(ca - cb >= 0):
                base, off = b, tuple(ca - cb)
            else:
                raise AssertionError("non-canonical tet edge")  # never happens
            ebase[t, e] = base
            ecls[t, e] = cls_of[off]
    return tri, ntri, ebase, ecls


_TRI_T, _NTRI_T, _EBASE_T, _ECLS_T = _build_tables()


@functools.lru_cache(maxsize=None)
def _payload_table(r1: int, r2: int):
    """(6, 16, 6) f32 table: PAY[tet, case, k*3+j] = D[base_corner]*7 + cls,
    where D[c] is the linear-index offset of cube corner c for the given
    grid strides and (base_corner, cls) come from the static case tables.
    Small-table GATHERS over (C,6,2,3) lanes are ~70x slower than arithmetic
    on the VPU (the count_cells_and_faces lesson); contracting this table
    with a one-hot of the case code instead runs on the MXU.  Values are
    < 7*(r1*r2+r2+2) < 2^24, exact in f32 (the contraction must run at
    precision=HIGHEST so the table is never truncated to bf16)."""
    d = (_CORNERS[:, 0] * (r1 * r2) + _CORNERS[:, 1] * r2
         + _CORNERS[:, 2]).astype(np.int64)                  # (8,)
    loc_edge = np.maximum(_TRI_T, 0)                         # (16, 2, 3)
    pay = np.zeros((6, 16, 6), np.float32)
    for t in range(6):
        base = _EBASE_T[t][loc_edge]                         # (16, 2, 3)
        cls = _ECLS_T[t][loc_edge]
        pay[t] = (d[base] * 7 + cls).reshape(16, 6).astype(np.float32)
    return pay


def _nth_true_indices(mask_flat, budget):
    """Indices of the first `budget` True entries of a flat bool mask
    (cumsum + searchsorted; gather-only, no scatters).  Returns (ids, count);
    ids beyond count are garbage — callers mask with `arange < count`."""
    cum = jnp.cumsum(mask_flat.astype(jnp.int32))
    count = cum[-1]
    ids = jnp.searchsorted(cum, jnp.arange(1, budget + 1, dtype=jnp.int32),
                           side="left").astype(jnp.int32)
    return ids, count


@functools.partial(jax.jit, static_argnames=("f_max", "c_max"))
def marching_tetrahedra_device(vol, level=0.0, *, f_max: int = 262144,
                               c_max: int = 131072):
    """Single-grid device extraction.  vol: (r0, r1, r2) f32.

    Returns a dict of PADDED arrays (triangle soup + canonical edge keys):
      corner_pos  (f_max, 3, 3) f32  triangle corner positions (grid coords)
      corner_nrm  (f_max, 3, 3) f32  unit -grad(vol) at each corner
      corner_key  (f_max, 3) i32     canonical edge key (base_lin * 7 + cls);
                                     equal keys = the SAME mesh vertex
      n_faces, n_cells () i32        true counts (> budget = OVERFLOW)
    Same math as marching.py's numpy path (winding, interpolation, normals);
    vertex dedup happens on host (`device_mesh_to_host`).
    """
    vol = vol.astype(jnp.float32)
    r0, r1, r2 = vol.shape
    size = r0 * r1 * r2
    flat = vol.reshape(-1)
    inside = vol > level

    # ---- active cells ------------------------------------------------------
    # bool any/all over the 8 shifted corner masks (same semantics as
    # 0 < inside-count < 8, ~2x lighter than integer adds over the dense grid)
    any_in = jnp.zeros((r0 - 1, r1 - 1, r2 - 1), jnp.bool_)
    all_in = jnp.ones((r0 - 1, r1 - 1, r2 - 1), jnp.bool_)
    for dx, dy, dz in _CORNERS:
        c = inside[dx:r0 - 1 + dx, dy:r1 - 1 + dy, dz:r2 - 1 + dz]
        any_in = jnp.logical_or(any_in, c)
        all_in = jnp.logical_and(all_in, c)
    crossing = jnp.logical_and(any_in, jnp.logical_not(all_in))
    cid, n_cells = _nth_true_indices(crossing.reshape(-1), c_max)
    valid_c = jnp.arange(c_max) < jnp.minimum(n_cells, c_max)
    cid = jnp.where(valid_c, cid, 0)
    cx = cid // ((r1 - 1) * (r2 - 1))
    cy = (cid // (r2 - 1)) % (r1 - 1)
    cz = cid % (r2 - 1)
    vlin = (cx * (r1 * r2) + cy * r2 + cz).astype(jnp.int32)   # (C,) base vert
    d_off = jnp.asarray(_CORNERS[:, 0] * (r1 * r2) + _CORNERS[:, 1] * r2
                        + _CORNERS[:, 2], jnp.int32)           # (8,)
    corner_in = inside.reshape(-1)[vlin[:, None] + d_off[None, :]]  # (C,8)

    # ---- candidate triangles: (C, 6 tets, 2 tris) --------------------------
    # Per-tet case code + triangle count via STATIC column slices and
    # arithmetic (ntri(case) = min(k, 4-k), k = inside-corner count); the
    # (base_corner, cls) tables collapse into one payload table contracted
    # with a one-hot of the case on the MXU — no small-table gathers anywhere
    # (they measured ~70x slower than arithmetic on dense lanes,
    # benchmarks/results/probe_marching.json).
    ci = corner_in.astype(jnp.float32)                   # (C, 8)
    case_cols = []
    ntri_cols = []
    for t in range(6):
        c0 = ci[:, _TETS[t][0]]
        c1 = ci[:, _TETS[t][1]]
        c2 = ci[:, _TETS[t][2]]
        c3 = ci[:, _TETS[t][3]]
        case_cols.append(c0 + 2.0 * c1 + 4.0 * c2 + 8.0 * c3)
        k = c0 + c1 + c2 + c3
        ntri_cols.append(jnp.minimum(k, 4.0 - k))
    case_f = jnp.stack(case_cols, axis=1)                # (C, 6) f32 in [0,16)
    ntri = jnp.stack(ntri_cols, axis=1)                  # (C, 6) f32 in [0,2]
    onehot = (case_f[:, :, None]
              == jnp.arange(16, dtype=jnp.float32)[None, None, :]
              ).astype(jnp.float32)                      # (C, 6, 16)
    pay = jnp.asarray(_payload_table(r1, r2))            # (6, 16, 6)
    payload = jnp.einsum("cti,tij->ctj", onehot, pay,
                         precision=jax.lax.Precision.HIGHEST)  # (C, 6, 6)
    cand_key = (vlin[:, None, None, None]
                * 7 + payload.astype(jnp.int32).reshape(c_max, 6, 2, 3))
    exists = (jnp.arange(2, dtype=jnp.float32)[None, None, :]
              < ntri[:, :, None]) & valid_c[:, None, None]  # (C, 6, 2)

    fslot, n_faces = _nth_true_indices(exists.reshape(-1), f_max)
    valid_f = jnp.arange(f_max) < jnp.minimum(n_faces, f_max)
    fslot = jnp.where(valid_f, fslot, 0)
    keys = cand_key.reshape(-1, 3)[fslot]                # (f_max, 3)
    keys = jnp.where(valid_f[:, None], keys, 0)

    # ---- per-corner geometry from the canonical keys -----------------------
    p = keys // 7                                        # (f_max, 3)
    c = keys % 7
    dlin = jnp.asarray(_CLASS_OFFSETS[:, 0] * (r1 * r2)
                       + _CLASS_OFFSETS[:, 1] * r2 + _CLASS_OFFSETS[:, 2],
                       jnp.int32)
    q = jnp.clip(p + dlin[c], 0, size - 1)
    v0 = flat[p]
    v1 = flat[q]
    denom = v1 - v0
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip((level - v0) / denom, 0.0, 1.0)
    p0 = jnp.stack([p // (r1 * r2), (p // r2) % r1, p % r2],
                   -1).astype(jnp.float32)               # (f_max, 3, 3)
    off = jnp.asarray(_CLASS_OFFSETS, jnp.float32)[c]
    pos = p0 + t[..., None] * off                        # (f_max, 3, 3)

    # normals: -np.gradient(vol) at the rounded corner voxel — computed
    # SPARSELY at the gathered positions (6 budget-sized gathers) instead of
    # materializing the dense (grid, 3) gradient field; central differences
    # in the interior, one-sided at borders (np.gradient parity)
    vi = jnp.clip(jnp.round(pos).astype(jnp.int32),
                  jnp.zeros((3,), jnp.int32),
                  jnp.asarray([r0 - 1, r1 - 1, r2 - 1], jnp.int32))
    dims = (r0, r1, r2)
    strides = (r1 * r2, r2, 1)
    vlin = vi[..., 0] * strides[0] + vi[..., 1] * strides[1] + vi[..., 2]
    g_axes = []
    for ax in range(3):
        up = jnp.minimum(vi[..., ax] + 1, dims[ax] - 1)
        dn = jnp.maximum(vi[..., ax] - 1, 0)
        lin_up = vlin + (up - vi[..., ax]) * strides[ax]
        lin_dn = vlin + (dn - vi[..., ax]) * strides[ax]
        span = (up - dn).astype(jnp.float32)             # 2 interior, 1 border
        g_axes.append((flat[lin_up] - flat[lin_dn])
                      / jnp.where(span < 1.0, 1.0, span))
    grad_at = jnp.stack(g_axes, axis=-1)
    nrm = -grad_at                                       # (f_max, 3, 3)
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.where(nn < 1e-12, 1.0, nn)

    # consistent winding: face normal vs summed corner normals (numpy parity)
    fn = jnp.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
    flip = jnp.sum(fn * jnp.sum(nrm, axis=1), axis=1) < 0
    swap = jnp.asarray([0, 2, 1])
    pos = jnp.where(flip[:, None, None], pos[:, swap], pos)
    nrm = jnp.where(flip[:, None, None], nrm[:, swap], nrm)
    keys = jnp.where(flip[:, None], keys[:, swap], keys)

    return {"corner_pos": pos, "corner_nrm": nrm, "corner_key": keys,
            "n_faces": n_faces, "n_cells": n_cells,
            "c_budget": jnp.int32(c_max)}


@functools.partial(jax.jit, static_argnames=("num_samples",))
def sample_points_from_mesh_device(mesh: dict, key, num_samples: int = 2048):
    """Area-weighted triangle sampling + uniform barycentrics on device —
    pytorch3d `sample_points_from_meshes` semantics (mesh_sampling.py host
    oracle).  Degenerate/padded faces have zero area and are never selected.
    Returns (points, normals) of shape (num_samples, 3) in the mesh's
    coordinate frame."""
    pos = mesh["corner_pos"]
    valid_f = jnp.arange(pos.shape[0]) < jnp.minimum(mesh["n_faces"],
                                                     pos.shape[0])
    v0, v1, v2 = pos[:, 0], pos[:, 1], pos[:, 2]
    cross = jnp.cross(v1 - v0, v2 - v0)
    area = 0.5 * jnp.linalg.norm(cross, axis=1) * valid_f
    cum = jnp.cumsum(area)
    total = cum[-1]
    k_sel, k_u, k_v = jax.random.split(key, 3)
    u01 = jax.random.uniform(k_sel, (num_samples,)) * total
    sel = jnp.clip(jnp.searchsorted(cum, u01), 0, pos.shape[0] - 1)
    u = jax.random.uniform(k_u, (num_samples,))
    v = jax.random.uniform(k_v, (num_samples,))
    over = u + v > 1.0
    u = jnp.where(over, 1.0 - u, u)
    v = jnp.where(over, 1.0 - v, v)
    w = 1.0 - u - v
    pts = (w[:, None] * v0[sel] + u[:, None] * v1[sel] + v[:, None] * v2[sel])
    n = cross[sel]
    norm = jnp.linalg.norm(n, axis=1, keepdims=True)
    n = n / jnp.where(norm < 1e-12, 1.0, norm)
    return pts, n


def mc_from_psr_device(psr_grid_dev, real_scale: bool = False,
                       zero_level: float = 0.0, *, f_max: int = 262144,
                       c_max: int = 131072):
    """Batched (B, r, r, r) device extraction (lax.map over the batch to
    bound memory).  Corner positions scaled like `mc_from_psr` ([0,1) or
    [0,1]).  Returns the padded dict with a leading batch axis."""
    s = psr_grid_dev.shape[-1]

    def one(vol):
        m = marching_tetrahedra_device(vol, zero_level, f_max=f_max,
                                       c_max=c_max)
        div = float((s - 1) if real_scale else s)
        m["corner_pos"] = m["corner_pos"] / div
        return m

    return jax.lax.map(one, psr_grid_dev)


# ---------------------------------------------------------------------------
# Bucketed extraction: cost proportional to the ACTUAL surface
#
# marching_tetrahedra_device pays O(c_max + f_max) regardless of surface
# size; at conservative budgets that is ~10x the cost of the whole
# generation chain.  The fix: a cheap O(grid) active-cell count first, then
# dispatch each sample into the SMALLEST precompiled budget bucket that fits
# it (one compile per bucket, cached).  Faces are bounded by 12 * cells;
# measured pipeline grids run ~6 faces/cell (noisy worst case), so f_max =
# 8 * c_max makes face overflow essentially impossible — the rare overflow
# retries one bucket up (extraction content is budget-independent, only
# padding grows).

# (c_max, f_max) pairs, ascending (2x ladder — extraction cost is roughly
# budget-linear, so a finer ladder keeps each sample within ~2x of its true
# cost; each bucket compiles once and caches).  The largest bucket keeps the
# old fixed-budget cell ceiling so behavior is never worse than before.
DEFAULT_BUCKETS = tuple((c, 8 * c) for c in
                        (4096, 8192, 16384, 32768, 65536, 131072, 262144))

# face-budget ladder for the geometry phase, chosen from the EXACT dense
# triangle count (count_cells_and_faces) — decoupled from the cell ladder so
# clean surfaces (~2 faces/cell) don't pay the 8*c_max worst-case padding.
# Above 32k the ladder has 1.5x midpoints: the geometry phase is
# budget-linear at ~0.39 us/face (probe_extract_opt.json), so the 2x ladder's
# ~1.5x average padding costs real time exactly where budgets are largest;
# exact counts make tight budgets safe (overflow retry remains as the net).
FACE_BUCKETS = tuple([8192 * 2 ** k for k in range(3)]            # 8k..32k
                     + sorted(set(
                         [32768 * 2 ** k for k in range(1, 7)]    # 64k..2M
                         + [49152 * 2 ** k for k in range(6)])))  # 48k..1.5M


@jax.jit
def count_active_cells(vol_b, level=0.0):
    """(B, r0, r1, r2) -> (B,) int32 number of sign-crossing cells — the
    bucket selector for `extract_and_sample_device`.  Bool any/all over the
    8 shifted corner masks (no integer adds: ~2x lighter than the icount
    form, this runs over the FULL batch grid)."""
    vol_b = vol_b.astype(jnp.float32)
    inside = vol_b > level
    r0, r1, r2 = vol_b.shape[-3:]
    any_in = jnp.zeros(vol_b.shape[:-3] + (r0 - 1, r1 - 1, r2 - 1), jnp.bool_)
    all_in = jnp.ones(vol_b.shape[:-3] + (r0 - 1, r1 - 1, r2 - 1), jnp.bool_)
    for dx, dy, dz in _CORNERS:
        c = inside[..., dx:r0 - 1 + dx, dy:r1 - 1 + dy, dz:r2 - 1 + dz]
        any_in = jnp.logical_or(any_in, c)
        all_in = jnp.logical_and(all_in, c)
    crossing = jnp.logical_and(any_in, jnp.logical_not(all_in))
    return jnp.sum(crossing.reshape(vol_b.shape[0], -1), axis=-1,
                   dtype=jnp.int32)


@jax.jit
def count_cells_and_faces(vol_b, level=0.0):
    """(B, r0, r1, r2) -> (cells (B,), faces (B,)) int32.

    `faces` is the EXACT triangle count `marching_tetrahedra_device` emits
    (per-tet case -> triangle-count table, summed densely over the grid) —
    dense vectorized VPU work over the full grid, so it costs about as much
    as the cell count but lets the face budget of the geometry phase be
    sized to the ACTUAL surface instead of the conservative 8*c_max bound
    (typical surfaces emit ~2 faces/cell; the padded geometry phase is
    budget-linear, so exact sizing cuts it ~4x)."""
    vol_b = vol_b.astype(jnp.float32)
    inside = vol_b > level
    r0, r1, r2 = vol_b.shape[-3:]
    cshape = vol_b.shape[:-3] + (r0 - 1, r1 - 1, r2 - 1)
    corner = [inside[..., dx:r0 - 1 + dx, dy:r1 - 1 + dy, dz:r2 - 1 + dz]
              for dx, dy, dz in _CORNERS]                 # 8 x (B, c-grid)
    any_in = jnp.zeros(cshape, jnp.bool_)
    all_in = jnp.ones(cshape, jnp.bool_)
    for c in corner:
        any_in = jnp.logical_or(any_in, c)
        all_in = jnp.logical_and(all_in, c)
    crossing = jnp.logical_and(any_in, jnp.logical_not(all_in))
    cells = jnp.sum(crossing.reshape(vol_b.shape[0], -1), axis=-1,
                    dtype=jnp.int32)
    # non-crossing cells land on cases 0/15 whose triangle count is 0, so no
    # crossing mask is needed for the face total.  ntri(case) has the closed
    # form min(k, 4-k) with k = the tet's inside-corner count (1 or 3 corners
    # inside -> 1 triangle, 2 -> 2, 0/4 -> 0): pure VPU arithmetic replaces
    # the 16-entry table gather, which dominated the dense count (measured
    # 1.9 s/batch-16 of 128^3 grids vs 28 ms for the cell count alone —
    # benchmarks/results/probe_marching.json); one int8 accumulator across
    # the 6 tets (max 12) keeps it a single reduction pass
    ntri_tot = None
    for t in range(6):
        k = sum(corner[_TETS[t][j]].astype(jnp.int8) for j in range(4))
        ntri = jnp.minimum(k, jnp.int8(4) - k)
        ntri_tot = ntri if ntri_tot is None else ntri_tot + ntri
    faces = jnp.sum(ntri_tot.reshape(vol_b.shape[0], -1), axis=-1,
                    dtype=jnp.int32)
    return cells, faces


@functools.partial(jax.jit,
                   static_argnames=("num_samples", "f_max", "c_max", "div"))
def _extract_and_sample_one(vol, key, num_samples, f_max, c_max, div,
                            zero_level=0.0):
    m = marching_tetrahedra_device(vol, zero_level, f_max=f_max, c_max=c_max)
    m["corner_pos"] = m["corner_pos"] / div
    pts, nrm = sample_points_from_mesh_device(m, key, num_samples)
    return pts, nrm, m["n_faces"], m["n_cells"]


@functools.partial(jax.jit,
                   static_argnames=("num_samples", "f_max", "c_max", "div"))
def _extract_and_sample_indexed(grid_b, i, key, num_samples, f_max, c_max,
                                div, zero_level=0.0):
    """Same as _extract_and_sample_one but slices sample `i` INSIDE the jit
    (i is a traced scalar): no eager slice op per sample (each eager op costs
    tens of ms through a remote-device link), and one compiled executable
    serves every sample of a bucket."""
    vol = jax.lax.dynamic_index_in_dim(grid_b, i, axis=0, keepdims=False)
    return _extract_and_sample_one(vol, jax.random.fold_in(key, i),
                                   num_samples, f_max, c_max, div, zero_level)


@functools.partial(jax.jit,
                   static_argnames=("num_samples", "f_max", "c_max", "div"))
def _extract_and_sample_group(grid_b, idxs, key, num_samples, f_max, c_max,
                              div, zero_level=0.0):
    """vmapped _extract_and_sample_indexed over a GROUP of samples sharing
    one (c_max, f_max) bucket: one dispatch + one executable per group
    instead of one per sample (the per-call fixed cost is ~8-10 ms on the
    tunnel runtime; a batch of 16 loses ~0.15 s to it).  Per-sample rng is
    fold_in(key, i) exactly like the single-sample path, so grouping does
    not change any output."""

    def one(i):
        vol = jax.lax.dynamic_index_in_dim(grid_b, i, axis=0, keepdims=False)
        return _extract_and_sample_one(vol, jax.random.fold_in(key, i),
                                       num_samples, f_max, c_max, div,
                                       zero_level)

    return jax.vmap(one)(idxs)


def extract_and_sample_device(psr_grid_dev, key, num_samples: int = 2048,
                              *, real_scale: bool = False,
                              zero_level: float = 0.0,
                              buckets=DEFAULT_BUCKETS):
    """Batched grid -> sampled surface clouds with per-sample budget buckets.

    (B, r, r, r) device grid -> (points (B, S, 3), normals (B, S, 3),
    n_faces (B,), n_cells (B,), overflow (B,) bool) numpy.  Each sample runs
    in the smallest bucket that fits its active-cell count; all extractions
    are dispatched async and fetched together (one tunnel sync for the
    count, one for the results).  Face-budget overflows retry one bucket up.
    A sample that overflows the LARGEST budgets is returned truncated with
    overflow[i]=True — check the flag, not n_faces (a truncated extraction
    reports the truncated count, so n_faces alone cannot reveal it).
    Reference capability: `dpsr_utils/utils.py:246-287` + pytorch3d
    `sample_points_from_meshes` (`dpsr_evaluation.py:310-327`)."""
    b = psr_grid_dev.shape[0]
    s = psr_grid_dev.shape[-1]
    div = float((s - 1) if real_scale else s)
    counts, face_counts = (np.asarray(a) for a in
                           count_cells_and_faces(psr_grid_dev, zero_level))

    def dispatch(i, bi, fi):
        c_max = buckets[bi][0]
        f_max = FACE_BUCKETS[fi]
        return _extract_and_sample_indexed(psr_grid_dev, jnp.int32(i), key,
                                           num_samples, f_max, c_max,
                                           div, zero_level)

    bucket_of = [next((j for j, (c, _) in enumerate(buckets) if counts[i] <= c),
                      len(buckets) - 1) for i in range(b)]
    # exact face sizing: the dense count IS the emitted count whenever the
    # cell budget fits, so no slack is needed; the retry loop below stays as
    # a safety net for cell-overflowed samples
    fbucket_of = [next((j for j, f in enumerate(FACE_BUCKETS)
                        if face_counts[i] <= f), len(FACE_BUCKETS) - 1)
                  for i in range(b)]
    # group samples sharing a (cell, face) bucket into ONE vmapped dispatch;
    # group sizes are padded UP to a small size set (with a repeated index) to
    # bound the number of distinct compiled executables while keeping the
    # duplicated padded-sample work <= ~33% of a group
    groups: dict = {}
    for i in range(b):
        groups.setdefault((bucket_of[i], fbucket_of[i]), []).append(i)
    pending_group = {}
    size_set = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)
    for (bi, fi), idxs in groups.items():
        gp = next((s for s in size_set if len(idxs) <= s), len(idxs))
        padded = idxs + [idxs[0]] * (gp - len(idxs))
        pending_group[(bi, fi)] = _extract_and_sample_group(
            psr_grid_dev, jnp.asarray(padded, jnp.int32), key, num_samples,
            FACE_BUCKETS[fi], buckets[bi][0], div, zero_level)
    pts = [None] * b
    nrm = [None] * b
    nf = np.zeros((b,), np.int32)
    for (bi, fi), idxs in groups.items():
        p_g, n_g, f_g, _c_g = pending_group[(bi, fi)]
        p_g, n_g, f_g = np.asarray(p_g), np.asarray(n_g), np.asarray(f_g)
        for slot, i in enumerate(idxs):
            p, n, f = p_g[slot], n_g[slot], int(f_g[slot])
            while (f > FACE_BUCKETS[fbucket_of[i]]
                   and fbucket_of[i] < len(FACE_BUCKETS) - 1):
                fbucket_of[i] += 1               # rare face-budget overflow
                p, n, f, c = dispatch(i, bucket_of[i], fbucket_of[i])
                p, n, f = np.asarray(p), np.asarray(n), int(f)
            pts[i], nrm[i], nf[i] = p, n, f
    overflow = np.array([nf[i] > FACE_BUCKETS[fbucket_of[i]]
                         or counts[i] > buckets[-1][0] for i in range(b)])
    if overflow.any():
        import warnings
        warnings.warn(f"{int(overflow.sum())}/{b} samples exceeded the "
                      "largest extraction budget and were truncated",
                      stacklevel=2)
    return (np.stack(pts), np.stack(nrm), nf, counts, overflow)


def device_mesh_to_host(mesh_b: dict, index: int):
    """Fetch ONE sample's mesh from a batched device dict and deduplicate on
    host: slices to the true face count on device (only real bytes cross the
    link), unifies corners by canonical edge key, drops degenerate faces —
    the result matches the numpy path's (verts, faces, normals) content.
    Raises ValueError on an empty surface, OverflowError when budgets were
    exceeded."""
    nf = int(mesh_b["n_faces"][index])
    nc = int(mesh_b["n_cells"][index])
    c_budget = int(np.ravel(np.asarray(mesh_b["c_budget"]))[0])
    f_max = mesh_b["corner_key"].shape[1]
    if nf == 0:
        raise ValueError("level surface is empty")
    if nf > f_max or nc > c_budget:
        raise OverflowError(f"budget exceeded: {nf}/{f_max} faces, "
                            f"{nc}/{c_budget} active cells")
    keys = np.asarray(jax.device_get(mesh_b["corner_key"][index, :nf]))
    pos = np.asarray(jax.device_get(mesh_b["corner_pos"][index, :nf]))
    nrm = np.asarray(jax.device_get(mesh_b["corner_nrm"][index, :nf]))
    uniq, inv = np.unique(keys.reshape(-1), return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int64)
    verts = np.zeros((len(uniq), 3), np.float32)
    normals = np.zeros((len(uniq), 3), np.float32)
    verts[inv] = pos.reshape(-1, 3)
    normals[inv] = nrm.reshape(-1, 3)
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    return verts, faces[good], normals
