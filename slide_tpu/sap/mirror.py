"""Symmetry mirroring utilities (`data_utils/mirror_partial.py:8-59`) — the
SAP refiner's symmetry prior: reflect the cloud about its centroid along one
axis, tag real/mirrored points with a ±1 indicator channel, and optionally
FPS-downsample variants."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from slide_tpu.ops import furthest_point_sample


def mirror(partial: jax.Array, axis: int = 1) -> jax.Array:
    """Reflect xyz (and the matching normal axis) about the cloud centroid
    (`mirror_partial.py:8-24`).  partial (B, N, F>=3)."""
    xyz = partial[..., :3]
    center = jnp.mean(xyz, axis=1, keepdims=True)
    centered = xyz - center
    centered = centered.at[..., axis].multiply(-1.0)
    out = partial.at[..., :3].set(centered + center)
    if partial.shape[-1] >= 6:
        out = out.at[..., axis + 3].multiply(-1.0)
    return out


def down_sample_points(x: jax.Array, npoints: int, start_idx=0) -> jax.Array:
    """FPS-downsample keeping all feature channels
    (`mirror_partial.py:26-36`)."""
    idx = furthest_point_sample(x[..., :3], npoints, start_idx=start_idx)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def mirror_and_concat(partial: jax.Array, axis: int = 2,
                      num_points: Sequence[int] = (),
                      attach_label: bool = False, permute: bool = True,
                      key: Optional[jax.Array] = None):
    """Concat the cloud with its mirror (+1/-1 indicator channel), optionally
    shuffling point order and producing FPS-downsampled variants
    (`mirror_partial.py:38-59`).  Returns a tuple (concat, *downsampled)."""
    b, n, _ = partial.shape
    mirrored = mirror(partial, axis=axis)
    if attach_label:
        ones = jnp.ones((b, n, 1), partial.dtype)
        partial = jnp.concatenate([partial, ones], axis=-1)
        mirrored = jnp.concatenate([mirrored, -ones], axis=-1)
    concat = jnp.concatenate([partial, mirrored], axis=1)   # (B, 2N, F[+1])
    if permute:
        if key is None:
            raise ValueError("permute=True requires a PRNG key")
        # one permutation shared across the batch, like torch.randperm
        # (`mirror_partial.py:52-54`)
        perm = jax.random.permutation(key, concat.shape[1])
        concat = concat[:, perm, :]
    out = [concat]
    for npts in num_points:
        out.append(down_sample_points(concat, npts))
    return tuple(out)
