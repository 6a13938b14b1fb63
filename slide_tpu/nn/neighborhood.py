"""Neighborhood feature assembly: the reference's `QueryAndGroup`
(`pointnet2_utils.py:307-448`) and `group_knn` (`:497-524`) as pure functions
(they hold no parameters).

Channel ORDER matters for checkpoint/parity: QueryAndGroup emits
[features, relative_xyz, absolute_xyz?, center_xyz?]; group_knn emits
[features, sqdist, weight, absolute_xyz, relative_xyz, center_xyz] (C+11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slide_tpu.ops import knn_points, ball_query, group_points


def query_and_group(xyz: jax.Array, new_xyz: jax.Array,
                    features: jax.Array | None = None, *,
                    nsample: int, radius: float = 0.0, neighbor_def: str = "nn",
                    use_xyz: bool = True, include_abs_coordinate: bool = False,
                    include_center_coordinate: bool = False, subset: bool = True):
    """Group each query's neighborhood and assemble its feature tensor.

    Args:
      xyz: (B, N, 3) source positions; new_xyz: (B, M, 3) query centers;
      features: optional (B, N, C) source features.
      neighbor_def: 'nn' (kNN, the shipped configs' default) or 'radius'
        (CUDA ball query semantics incl. first-found padding).
      subset: whether new_xyz is guaranteed a subset of xyz.  With
        'radius' and subset=False, zero-neighbor queries fall back to the
        center itself with zero features (`pointnet2_utils.py:385-419`).

    Returns (new_features (B, M, K, C'), counts (B, M) int32) with
    C' = C + 3*use_xyz + 3*include_abs + 3*include_center.
    """
    b, m, _ = new_xyz.shape
    n = xyz.shape[1]
    if neighbor_def == "nn":
        k = min(nsample, n)
        _, idx = knn_points(new_xyz, xyz, k)
        counts = jnp.full((b, m), k, dtype=jnp.int32)
        have_neigh = None
    elif neighbor_def == "radius":
        idx, counts = ball_query(new_xyz, xyz, radius, nsample)
        have_neigh = (counts > 0) if not subset else None
    else:
        raise ValueError(f"neighbor definition {neighbor_def} is not supported")

    abs_xyz = group_points(xyz, idx)                        # (B, M, K, 3)
    center = new_xyz[:, :, None, :]                         # (B, M, 1, 3)
    if have_neigh is not None:
        # no-neighbor fallback: the query itself, with zero features
        hn = have_neigh[..., None, None].astype(abs_xyz.dtype)
        abs_xyz = hn * abs_xyz + (1.0 - hn) * center
    rel_xyz = abs_xyz - center

    parts = []
    if features is not None:
        grouped = group_points(features, idx)               # (B, M, K, C)
        if have_neigh is not None:
            grouped = grouped * have_neigh[..., None, None].astype(grouped.dtype)
        parts.append(grouped)
    elif not use_xyz:
        raise ValueError("cannot have no features and use_xyz=False")
    if use_xyz:
        parts.append(rel_xyz)
        if include_abs_coordinate:
            parts.append(abs_xyz)
        if include_center_coordinate:
            k = abs_xyz.shape[2]
            parts.append(jnp.broadcast_to(center, (b, m, k, 3)))
    return jnp.concatenate(parts, axis=-1), counts


def group_all(xyz: jax.Array, features: jax.Array | None = None,
              use_xyz: bool = True):
    """Group the ENTIRE cloud as one neighborhood — the reference's `GroupAll`
    (`pointnet2_utils.py:451-494`).  NOTE: the reference constructs GroupAll
    for npoint=None SA modules but its forward asserts npoint is not None
    (`pointnet2_modules.py:253`), so the path is unreachable there; this is
    the capability building block.

    Returns (B, 1, N, C[+3]) with channel order [features, xyz]."""
    grouped_xyz = xyz[:, None, :, :]
    if features is None:
        return grouped_xyz
    grouped = features[:, None, :, :]
    if use_xyz:
        return jnp.concatenate([grouped, grouped_xyz], axis=-1)
    return grouped


def group_knn_features(x: jax.Array, y: jax.Array, features_at_y: jax.Array, k: int):
    """kNN grouping with distance/weight augmentation — the reference's
    `group_knn` (`pointnet2_utils.py:497-524`), used by `PointnetKnnFPModule`.

    For each point in x (B, N1, 3), find k nearest neighbors in y (B, N2, 3)
    and return (B, N1, k, C+11):
      [neighbor features (C), squared distance (1),
       inverse-distance weight (1), neighbor abs position (3),
       neighbor relative position (3), center position (3)].
    """
    sqd, idx = knn_points(x, y, k)                           # (B, N1, k)
    feats = group_points(features_at_y, idx)                 # (B, N1, k, C)
    nn_abs = group_points(y, idx)                            # (B, N1, k, 3)
    center = x[:, :, None, :]
    nn_rel = nn_abs - center
    d = sqd[..., None]
    recip = 1.0 / (d + 1e-8)
    weight = recip / jnp.sum(recip, axis=2, keepdims=True)
    center_b = jnp.broadcast_to(center, nn_abs.shape)
    return jnp.concatenate([feats, d, weight, nn_abs, nn_rel, center_b], axis=-1)
