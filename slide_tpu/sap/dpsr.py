"""Differentiable Poisson Surface Reconstruction (DPSR) — the spectral solver
of Shape-As-Points (`pointnet2/dpsr_utils/dpsr.py:10-78`, helpers
`dpsr_utils/utils.py:24-196`), on XLA FFTs.

Pipeline: trilinear scatter of point normals onto a periodic grid ->
rfftn -> gaussian spectral filter -> divergence in frequency space ->
divide by Laplacian eigenvalues -> irfftn -> shift (zero mean at the input
points) and scale (normalize by the indicator value at the grid origin).
Fully differentiable — the SAP upsampler trains THROUGH this
(`train_upsampler.py:246-253`).  fp32 throughout for numerical fidelity
(SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def fftfreqs(res: Sequence[int]) -> np.ndarray:
    """Integer FFT frequencies on the half-spectrum grid
    (`utils.py:24-46`): (res0, res1, res2//2+1, ndim)."""
    freqs = [np.fft.fftfreq(r, d=1.0 / r) for r in res[:-1]]
    freqs.append(np.fft.rfftfreq(res[-1], d=1.0 / res[-1]))
    omega = np.stack(np.meshgrid(*freqs, indexing="ij"), axis=-1)
    return omega.astype(np.float32)


def spec_gaussian_filter(res: Sequence[int], sig: float) -> np.ndarray:
    """exp(-0.5 * (sig*2*|w|/res0)^2) on the half-spectrum (`utils.py:65-71`).
    Returns (res0, res1, res2//2+1)."""
    omega = fftfreqs(res).astype(np.float64)
    dis = np.sqrt(np.sum(omega ** 2, axis=-1))
    return np.exp(-0.5 * ((sig * 2.0 * dis / res[0]) ** 2)).astype(np.float32)


def _corner_data(pts: jax.Array, res: Sequence[int]):
    """Shared trilinear corner indices + weights with periodic wrap-around
    (`utils.py:87-110 / 157-176`).  pts (B, N, 3) in [0, 1).

    Returns (idx (B, N, 8, 3) int32, weights (B, N, 8))."""
    size = jnp.asarray(res, jnp.float32)
    cube = 1.0 / size
    ind0 = jnp.floor(pts / cube)                                # (B, N, 3)
    ind1 = jnp.mod(jnp.ceil(pts / cube), size)                  # periodic
    corners = np.array(list(itertools.product((0, 1), repeat=len(res))),
                       np.float32)                              # (8, 3)
    c = corners[None, None]                                     # (1, 1, 8, 3)
    idx = jnp.where(c == 0, ind0[:, :, None, :], ind1[:, :, None, :])
    # weight = prod over dims of |pt - OPPOSITE corner position| / cube
    xyz0 = ind0 * cube
    xyz1 = (ind0 + 1.0) * cube
    pos_opp = jnp.where(c == 0, xyz1[:, :, None, :], xyz0[:, :, None, :])
    d = jnp.abs(pts[:, :, None, :] - pos_opp) / cube
    weights = jnp.prod(d, axis=-1)
    return idx.astype(jnp.int32), weights


def point_rasterize(pts: jax.Array, vals: jax.Array, res: Sequence[int]) -> jax.Array:
    """Trilinear scatter-add of per-point values onto the grid
    (`utils.py:139-196`).  pts (B, N, D) in [0,1), vals (B, N, F) ->
    (B, F, *res)."""
    b, n, _ = pts.shape
    nf = vals.shape[-1]
    idx, w = _corner_data(pts, res)                             # (B,N,8,3),(B,N,8)
    strides = jnp.asarray([res[1] * res[2], res[2], 1], jnp.int32)
    lin = jnp.sum(idx * strides, axis=-1)                       # (B, N, 8)
    contrib = w[..., None] * vals[:, :, None, :]                # (B, N, 8, F)

    def scatter_one(lin_b, contrib_b):
        grid = jnp.zeros((int(np.prod(res)), nf), vals.dtype)
        return grid.at[lin_b.reshape(-1)].add(contrib_b.reshape(-1, nf))

    grid = jax.vmap(scatter_one)(lin, contrib)                  # (B, R^3, F)
    grid = grid.reshape(b, *res, nf)
    return jnp.moveaxis(grid, -1, 1)                            # (B, F, *res)


def grid_interp(grid: jax.Array, pts: jax.Array) -> jax.Array:
    """Trilinear interpolation with periodic wrap-around (`utils.py:73-115`).
    grid (B, *res, F), pts (B, N, D) in [0,1) -> (B, N, F)."""
    res = grid.shape[1:-1]
    idx, w = _corner_data(pts, res)
    strides = jnp.asarray([res[1] * res[2], res[2], 1], jnp.int32)
    lin = jnp.sum(idx * strides, axis=-1)                       # (B, N, 8)
    flat = grid.reshape(grid.shape[0], -1, grid.shape[-1])

    def gather_one(flat_b, lin_b):
        return flat_b[lin_b.reshape(-1)].reshape(lin_b.shape + (flat_b.shape[-1],))

    lat = jax.vmap(gather_one)(flat, lin)                       # (B, N, 8, F)
    return jnp.sum(lat * w[..., None], axis=-2)


class DPSR:
    """Callable spectral Poisson solver; precomputes the gaussian filter and
    frequency grids (as `dpsr.py:10-27` registers buffers).  Jit-friendly."""

    def __init__(self, res: Sequence[int], sig: float = 10, scale: bool = True,
                 shift: bool = True):
        self.res = tuple(res)
        self.sig = sig
        self.scale = scale
        self.shift = shift
        self.G = jnp.asarray(spec_gaussian_filter(self.res, sig))     # (r0,r1,rc)
        self.omega = jnp.asarray(fftfreqs(self.res) * (2.0 * np.pi))  # (r0,r1,rc,3)

    def __call__(self, v: jax.Array, n: jax.Array) -> jax.Array:
        """v: (B, nv, 3) point coords in [0,1); n: (B, nv, 3) normals.
        Returns the indicator field phi (B, *res)."""
        if v.shape != n.shape:
            raise ValueError("points and normals must have the same shape")
        ras = point_rasterize(v.astype(jnp.float32), n.astype(jnp.float32),
                              self.res)                       # (B, 3, r, r, r)
        spec = jnp.fft.rfftn(ras, axes=(2, 3, 4))             # (B, 3, r, r, rc)
        spec = jnp.moveaxis(spec, 1, -1)                      # (B, r, r, rc, 3)
        filtered = spec * self.G[None, ..., None]
        # divergence in frequency space: DivN = -i * sum_d N_d * omega_d
        # (`dpsr.py:55`, where img() multiplies the real-view by i)
        div = -1j * jnp.sum(filtered * self.omega[None], axis=-1)  # (B, r, r, rc)
        lap = -jnp.sum(self.omega ** 2, axis=-1)                   # (r, r, rc)
        phi_s = div / (lap[None] + 1e-6)
        phi_s = phi_s.at[:, 0, 0, 0].set(0.0)                      # zero DC
        phi = jnp.fft.irfftn(phi_s, s=self.res, axes=(1, 2, 3))    # (B, *res)

        if self.shift or self.scale:
            fv = grid_interp(phi[..., None], v)[..., 0]            # (B, nv)
            if self.shift:
                phi = phi - jnp.mean(fv, axis=-1).reshape(-1, 1, 1, 1)
            fv0 = phi[:, 0, 0, 0]
            if self.scale:
                phi = -phi / jnp.abs(fv0).reshape(-1, 1, 1, 1) * 0.5
        return phi
