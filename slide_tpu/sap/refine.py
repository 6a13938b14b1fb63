"""Refine+upsample glue: network displacement output -> upsampled oriented
point cloud -> DPSR indicator grid (`dpsr_evaluation.py:20-86`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slide_tpu.models.upsample_decoder import point_upsample


def shapenet_psr_normalize(x: jax.Array) -> jax.Array:
    """Normalize to the ShapeNet-PSR bounding-box convention: centered, max
    extent 0.99 (`dpsr_evaluation.py:22-32`)."""
    minn = jnp.min(x, axis=1, keepdims=True)
    maxx = jnp.max(x, axis=1, keepdims=True)
    center = (maxx + minn) / 2.0
    max_length = jnp.max(maxx - minn, axis=2, keepdims=True)
    return (x - center) / max_length * 0.99


def compute_center_and_max_length(x):
    """Bounding-box center and max extent (`dpsr_evaluation.py:34-43`).
    x (B, N, 3) -> (center (B,1,3), max_length (B,1,1))."""
    minn = jnp.min(x, axis=1, keepdims=True)
    maxx = jnp.max(x, axis=1, keepdims=True)
    center = (maxx + minn) / 2.0
    max_length = jnp.max(maxx - minn, axis=2, keepdims=True)
    return center, max_length


def network_output_to_dpsr_grid(x, displacement, dpsr, scale, pointnet_config,
                                *, last_dim_as_indicator: bool = False,
                                only_original_points_split: bool = False,
                                explicit_normalize: bool = False):
    """Split the (optionally mirrored+tagged) cloud by the predicted
    displacements, map into DPSR's [0,1) cube, and solve for the indicator
    grid (`dpsr_evaluation.py:46-86`).

    Returns (psr_grid (B, *res), refined_points, refined_normals).
    """
    if last_dim_as_indicator:
        x_to_refine = x[..., :-1]
        if only_original_points_split:
            n = x.shape[1] // 2
            x_to_refine = x_to_refine[:, :n]
            displacement = displacement[:, :n]
    else:
        x_to_refine = x
    refined = point_upsample(
        x_to_refine, displacement, pointnet_config["point_upsample_factor"],
        include_displacement_center_to_final_output=pointnet_config[
            "include_displacement_center_to_final_output"],
        output_scale_factor_value=pointnet_config["output_scale_factor"],
        first_refine_coarse_points=pointnet_config["first_refine_coarse_points"])
    points = refined[..., :3]
    normals = refined[..., 3:]
    if explicit_normalize:
        points = shapenet_psr_normalize(points)
    else:
        points = points / scale / 2.0
    points = jnp.clip(points / 1.2 + 0.5, 0.0, 0.99)
    psr_grid = dpsr(points, normals)
    return psr_grid, points, normals
