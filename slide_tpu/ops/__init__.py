"""Point-cloud primitive ops (the TPU-native equivalents of the reference's CUDA
extensions, see SURVEY.md §2.1).

All ops use channels-last layout (B, N, C) — the TPU-friendly layout where the
channel dimension maps to vector lanes — unlike the reference's (B, C, N).
All shapes are static; variable-size neighborhoods are expressed as fixed-K
index tensors plus per-query counts, with masked pooling downstream.
"""

from slide_tpu.ops.fps import (
    furthest_point_sample,
    sample_keypoints,
    fps_subsample,
)
from slide_tpu.ops.neighbors import (
    pairwise_sqdist,
    knn_points,
    ball_query,
    three_nn,
)
from slide_tpu.ops.grouping import (
    gather_points,
    group_points,
    count_to_mask,
    masked_max_pool,
    masked_avg_pool,
    pool_features,
    three_interpolate,
)
from slide_tpu.ops.voxel import (
    avg_voxelize,
    trilinear_devoxelize,
    normalize_coords_for_voxelization,
)
from slide_tpu.ops.emd import (
    approx_match,
    earth_mover_distance,
)
from slide_tpu.ops.chamfer import (
    chamfer_parts,
    calc_cd,
    fscore,
)

__all__ = [
    "furthest_point_sample",
    "sample_keypoints",
    "fps_subsample",
    "pairwise_sqdist",
    "knn_points",
    "ball_query",
    "three_nn",
    "gather_points",
    "group_points",
    "count_to_mask",
    "masked_max_pool",
    "masked_avg_pool",
    "pool_features",
    "three_interpolate",
    "avg_voxelize", "trilinear_devoxelize",
    "normalize_coords_for_voxelization",
    "approx_match",
    "earth_mover_distance",
    "chamfer_parts",
    "calc_cd",
    "fscore",
]
