"""Chamfer distance, feature chamfer, and F-score.

TPU-native equivalent of `pointnet2/metrics_point_cloud/chamfer_and_f1.py`
(pytorch3d-knn based) and the PVD CUDA chamfer kernels
(`models/pvd/metrics/ChamferDistancePytorch/`).  One pairwise-distance matmul
per direction; fully differentiable (the x0-diffusion engine trains through
this, `diffusion_utils/diffusion.py:105-155`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slide_tpu.ops.neighbors import pairwise_sqdist


def chamfer_parts(x: jax.Array, y: jax.Array,
                  x_feat: jax.Array | None = None,
                  y_feat: jax.Array | None = None,
                  normal_loss_type: str = "cos"):
    """Per-point nearest-neighbor squared distances in both directions, plus the
    optional per-point feature ("normal") loss of the reference
    (`chamfer_and_f1.py:67-225` with batch/point reduction disabled).

    Args:
      x: (B, P1, 3) positions;  y: (B, P2, 3) positions.
      x_feat / y_feat: optional (B, P, F) per-point features; the feature loss
        compares each point's features with its nearest neighbor's features —
        'cos' -> 1 - |cosine similarity| (eps 1e-6), 'mse' -> sum sq. diff.

    Returns dict with 'dist_x' (B, P1), 'dist_y' (B, P2) squared distances,
    'idx_x', 'idx_y' nearest indices, and (if features given) 'feat_x',
    'feat_y' per-point feature losses.
    """
    d = pairwise_sqdist(x, y)                      # (B, P1, P2)
    idx_x = jnp.argmin(d, axis=2)
    idx_y = jnp.argmin(d, axis=1)
    # recompute the SELECTED distances in difference form: the matmul form
    # (x^2+y^2-2xy, clamped at 0) suffers f32 cancellation for close pairs —
    # exact zeros whose sqrt has an infinite gradient NaN'd AE training once
    # reconstructions tightened.  Difference form is exact and is also what
    # the reference's pytorch3d knn returns; selection stays on the matmul.
    y_near = jnp.take_along_axis(y, idx_x[..., None], axis=1)   # (B, P1, 3)
    x_near = jnp.take_along_axis(x, idx_y[..., None], axis=1)   # (B, P2, 3)
    dist_x = jnp.sum((x - y_near) ** 2, axis=-1)
    dist_y = jnp.sum((y - x_near) ** 2, axis=-1)
    out = {"dist_x": dist_x, "dist_y": dist_y, "idx_x": idx_x, "idx_y": idx_y}
    if x_feat is not None and y_feat is not None:
        y_near = jnp.take_along_axis(y_feat, idx_x[..., None], axis=1)  # (B,P1,F)
        x_near = jnp.take_along_axis(x_feat, idx_y[..., None], axis=1)  # (B,P2,F)
        if normal_loss_type == "cos":
            out["feat_x"] = 1.0 - jnp.abs(_cosine(x_feat, y_near))
            out["feat_y"] = 1.0 - jnp.abs(_cosine(y_feat, x_near))
        elif normal_loss_type == "mse":
            out["feat_x"] = jnp.sum((x_feat - y_near) ** 2, axis=-1)
            out["feat_y"] = jnp.sum((y_feat - x_near) ** 2, axis=-1)
        else:
            raise ValueError(f"normal loss type {normal_loss_type} not supported")
    return out


def _safe_sqrt(d, eps: float = 1e-12):
    """sqrt with a bounded gradient at 0 (sqrt'(0) is inf; a bit-exact
    coincidence between clouds would otherwise NaN cd_p training)."""
    return jnp.sqrt(jnp.maximum(d, eps))


def _cosine(a, b, eps: float = 1e-6):
    # Matches torch F.cosine_similarity's clamping: norms floored at eps.
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def fscore(dist1: jax.Array, dist2: jax.Array, threshold: float = 0.0001):
    """F-score between clouds given SQUARED per-point distances
    (`chamfer_and_f1.py:227-240`).  Returns (fscore, precision1, precision2),
    each (B,).  NaNs (both precisions zero) map to 0."""
    p1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    p2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    denom = p1 + p2
    f = jnp.where(denom > 0, 2.0 * p1 * p2 / jnp.where(denom > 0, denom, 1.0), 0.0)
    return f, p1, p2


def calc_cd(output: jax.Array, gt: jax.Array, *, calc_f1: bool = False,
            f1_threshold: float = 0.0001, normal_loss_type: str = "cos"):
    """The reference's `calc_cd` (`chamfer_and_f1.py:242-265`).

    output/gt: (B, N, F) with xyz in the first 3 channels and optional point
    features after.  NOTE the reference's argument order: dist1 is gt->output,
    dist2 is output->gt.

    Returns dict of per-batch-element (B,) values: 'cd_p' (mean euclidean,
    averaged over directions), 'cd_t' (summed mean squared), optional
    'cd_feature_p'/'cd_feature_t', optional 'f1'.
    """
    parts = chamfer_parts(
        gt[..., :3], output[..., :3],
        x_feat=gt[..., 3:] if gt.shape[-1] > 3 else None,
        y_feat=output[..., 3:] if output.shape[-1] > 3 else None,
        normal_loss_type=normal_loss_type,
    )
    dist1, dist2 = parts["dist_x"], parts["dist_y"]
    result = {
        "cd_p": (_safe_sqrt(dist1).mean(1) + _safe_sqrt(dist2).mean(1)) / 2.0,
        "cd_t": dist1.mean(1) + dist2.mean(1),
    }
    if "feat_x" in parts:
        f1p, f2p = parts["feat_x"], parts["feat_y"]
        result["cd_feature_p"] = (_safe_sqrt(f1p).mean(1)
                                  + _safe_sqrt(f2p).mean(1)) / 2.0
        result["cd_feature_t"] = f1p.mean(1) + f2p.mean(1)
    if calc_f1:
        result["f1"], _, _ = fscore(dist1, dist2, threshold=f1_threshold)
    return result
