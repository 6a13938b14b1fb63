"""Voxelization ops for the PVCNN (point-voxel) backbone — TPU-native
equivalents of the PVD functional CUDA kernels
(`models/pvd/modules/functional/src/vox.cu`, `trilinear_devox.cu`).

avg_voxelize: scatter-MEAN point features into an R^3 grid (each voxel
averages the points whose floored integer coords land in it).
trilinear_devoxelize: non-periodic trilinear gather of grid features at
continuous point coordinates.  Both differentiable via autodiff (the
reference ships hand-written scatter/gather backward kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def avg_voxelize(features: jax.Array, coords: jax.Array, resolution: int) -> jax.Array:
    """features (B, N, C), coords (B, N, 3) float or int voxel coords in
    [0, R) -> grid (B, R, R, R, C) (channels-last)."""
    b, n, c = features.shape
    r = resolution
    # the reference ROUNDS to the nearest voxel (`modules/voxelization.py:
    # vox_coords = round(norm_coords)`), consistent with the floor-based
    # trilinear gather in devoxelize
    idx = jnp.clip(jnp.round(coords).astype(jnp.int32), 0, r - 1)
    lin = idx[..., 0] * r * r + idx[..., 1] * r + idx[..., 2]     # (B, N)

    def one(feat_b, lin_b):
        sums = jnp.zeros((r * r * r, c), feat_b.dtype).at[lin_b].add(feat_b)
        cnt = jnp.zeros((r * r * r,), feat_b.dtype).at[lin_b].add(1.0)
        return sums / jnp.maximum(cnt, 1.0)[:, None]

    grid = jax.vmap(one)(features, lin)
    return grid.reshape(b, r, r, r, c)


def trilinear_devoxelize(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """grid (B, R, R, R, C), coords (B, N, 3) in [0, R-1] ->
    features (B, N, C) by trilinear interpolation (clamped borders)."""
    b, r = grid.shape[0], grid.shape[1]
    c = grid.shape[-1]
    pts = jnp.clip(coords, 0.0, r - 1)
    i0 = jnp.floor(pts).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, r - 1)
    f = pts - i0.astype(pts.dtype)                                # (B, N, 3)
    flat = grid.reshape(b, r * r * r, c)

    out = 0.0
    for corner in range(8):
        bits = [(corner >> d) & 1 for d in range(3)]
        ind = jnp.stack([jnp.where(bits[d], i1[..., d], i0[..., d])
                         for d in range(3)], axis=-1)
        w = jnp.prod(jnp.stack(
            [jnp.where(bits[d], f[..., d], 1.0 - f[..., d]) for d in range(3)],
            axis=-1), axis=-1)                                    # (B, N)
        lin = ind[..., 0] * r * r + ind[..., 1] * r + ind[..., 2]
        vals = jnp.take_along_axis(flat, lin[..., None], axis=1)
        out = out + vals * w[..., None]
    return out


def normalize_coords_for_voxelization(xyz: jax.Array, resolution: int,
                                      eps: float = 0.0) -> jax.Array:
    """PVCNN's coordinate normalization (`modules/voxelization.py:9-28`):
    center, scale by max norm, map to [0, R-1]."""
    centered = xyz - jnp.mean(xyz, axis=1, keepdims=True)
    norm = jnp.max(jnp.linalg.norm(centered, axis=-1, keepdims=True), axis=1,
                   keepdims=True)
    unit = centered / (norm * 2.0 + 1e-8) + 0.5
    # reference scales by r then clamps to r-1 (`voxelization.py:24-26`)
    return jnp.clip(unit * resolution, 0.0, resolution - 1 - eps)
