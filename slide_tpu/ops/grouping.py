"""Gather / group / masked pooling / 3-point interpolation.

TPU-native equivalents of the reference's `gather_points`, `group_points`
(`_ext-src/src/sampling_gpu.cu:8-57`, `group_points_gpu.cu:8-75`),
`three_interpolate` (`interpolate_gpu.cu:57-154`), and the masked pooling
helpers `count_to_mask` / `average_feature` / `pooling_features`
(`pointnet2_ops/pointnet2_utils.py:36-60`, `pointnet2_modules.py:179-208`).

All of these are XLA gathers/segment ops; gradients (scatter-add in the
reference's hand-written backward kernels) come from autodiff for free.
Layout is channels-last: features (B, N, C).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

# Scatter-free gather backward: XLA autodiff turns take_along_axis's VJP into
# scatter-add, which TPUs execute poorly for non-unique indices.  When
# enabled, the gather's backward is re-expressed as sort + prefix-sum +
# searchsorted differencing (gather-only — every op rides the VPU/MXU well).
# Numerics: segment sums come from differencing an f32 prefix sum, so they
# are NOT bit-exact vs scatter-add — measured ~1.4e-4 max abs error at the
# production size (32k cotangents of unit scale into 2048 rows; ~6e-5
# relative, ~45x f32 scatter-add's rounding).  Negligible against SGD
# gradient noise but visible to bit-parity tests.  Off by default until the
# on-chip microprobe (benchmarks/profile_ae.py scatter_grad vs dense
# control) shows a win; toggle via env SLIDE_TPU_SCATTER_FREE_GRAD=1 or
# set_scatter_free_grad().
_scatter_free = os.environ.get("SLIDE_TPU_SCATTER_FREE_GRAD", "0") == "1"


def set_scatter_free_grad(on: bool) -> bool:
    """Enable/disable the sort-based gather backward; returns previous."""
    global _scatter_free
    prev = _scatter_free
    if prev != bool(on):
        _scatter_free = bool(on)
        # the flag is read at TRACE time: drop cached traces/executables so
        # already-jitted steps can't silently keep the stale behavior
        import jax
        jax.clear_caches()
    return prev


@functools.lru_cache(maxsize=None)
def _gather_rows_sf_for(n: int):
    """Gather-rows op whose VJP is scatter-free, specialized to N=n rows
    (n must be static for the backward's searchsorted targets)."""

    @jax.custom_vjp
    def gather_rows(points, flat_idx):
        return jnp.take_along_axis(points,
                                   flat_idx[..., None].astype(jnp.int32),
                                   axis=1)

    def fwd(points, flat_idx):
        return gather_rows(points, flat_idx), flat_idx

    def bwd(flat_idx, g):
        b, mk = flat_idx.shape
        c = g.shape[-1]
        order = jnp.argsort(flat_idx.astype(jnp.int32), axis=1)
        sidx = jnp.take_along_axis(flat_idx.astype(jnp.int32), order, axis=1)
        gs = jnp.take_along_axis(g, order[..., None],
                                 axis=1).astype(jnp.float32)
        # per-point segment sums via prefix-sum differencing: the hits of
        # point p are contiguous in sorted order,
        # d[p] = cum[end_p] - cum[start_p]  (f32; see module note on error)
        cum = jnp.concatenate([jnp.zeros((b, 1, c), jnp.float32),
                               jnp.cumsum(gs, axis=1)], axis=1)
        pts = jnp.arange(n, dtype=jnp.int32)
        start = jax.vmap(lambda s: jnp.searchsorted(s, pts, side="left"))(sidx)
        end = jax.vmap(lambda s: jnp.searchsorted(s, pts, side="right"))(sidx)
        d = (jnp.take_along_axis(cum, end[..., None].astype(jnp.int32), axis=1)
             - jnp.take_along_axis(cum, start[..., None].astype(jnp.int32),
                                   axis=1))
        return d.astype(g.dtype), None

    gather_rows.defvjp(fwd, bwd)
    return gather_rows


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """out[b, m, :] = points[b, idx[b, m], :].  (B, N, C) x (B, M) -> (B, M, C)."""
    if _scatter_free:
        return _gather_rows_sf_for(points.shape[1])(points, idx)
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """out[b, m, k, :] = points[b, idx[b, m, k], :].

    (B, N, C) x (B, M, K) -> (B, M, K, C).
    """
    b, m, k = idx.shape
    flat = gather_points(points, idx.reshape(b, m * k))
    return flat.reshape(b, m, k, points.shape[-1])


def count_to_mask(count: jax.Array, k: int) -> jax.Array:
    """(B, M) neighbor counts -> (B, M, K) bool validity mask
    (`pointnet2_utils.py:36-44`): slot j is valid iff j < count."""
    slots = lax.broadcasted_iota(jnp.int32, count.shape + (k,), count.ndim)
    return slots < count[..., None].astype(jnp.int32)


def masked_max_pool(feature: jax.Array, count=None) -> jax.Array:
    """Max over the neighbor axis.  feature (B, M, K, C) -> (B, M, C).

    The reference max-pools over ALL K slots without masking
    (`pooling_features`, `pointnet2_modules.py:184-187`) — safe because empty
    slots repeat a real neighbor.  `count` is accepted for API symmetry.
    """
    return jnp.max(feature, axis=-2)


def masked_avg_pool(feature: jax.Array, count, k: int | None = None) -> jax.Array:
    """Average over VALID neighbor slots (`average_feature`,
    `pointnet2_utils.py:46-60`).  feature (B, M, K, C), count (B, M) or the
    string 'all' (plain mean over K).  Returns (B, M, C)."""
    kk = feature.shape[-2]
    if isinstance(count, str):
        if count != "all":
            raise ValueError(count)
        return jnp.mean(feature, axis=-2)
    count = jnp.maximum(count, 1)
    mask = count_to_mask(count, kk)[..., None].astype(feature.dtype)
    return jnp.sum(feature * mask, axis=-2) / count[..., None].astype(feature.dtype)


def pool_features(feature: jax.Array, count=None, pooling: str = "max") -> jax.Array:
    """Dispatch over the reference's pooling modes
    (`pointnet2_modules.py:179-208`): 'max', 'avg', and 'avg_max'/'max_avg'
    (first half of the channels max-pooled, second half masked-averaged)."""
    if pooling == "max":
        return masked_max_pool(feature, count)
    if pooling == "avg":
        return masked_avg_pool(feature, count)
    if "avg" in pooling and "max" in pooling:
        c = feature.shape[-1]
        half = c // 2
        return jnp.concatenate(
            [masked_max_pool(feature[..., :half], count),
             masked_avg_pool(feature[..., half:], count)], axis=-1)
    raise ValueError(f"{pooling} pooling is not supported")


def three_interpolate(features: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted 3-point feature interpolation
    (`interpolate_gpu.cu:57-110`, wrapper `pointnet2_utils.py:167-219`).

    features (B, M, C), idx (B, n, 3), weight (B, n, 3) -> (B, n, C).
    """
    grouped = group_points(features, idx)            # (B, n, 3, C)
    return jnp.sum(grouped * weight[..., None].astype(grouped.dtype), axis=-2)


def interp_weights_from_dists(dist: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance weights used by the FP modules
    (`pointnet2_modules.py:549-552`): w_i = (1/(d_i+eps)) / sum_j 1/(d_j+eps)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
