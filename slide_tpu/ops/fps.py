"""Furthest point sampling (FPS) on TPU.

Equivalent capability to the reference's CUDA kernel
(`pointnet2_ops_lib/.../src/sampling_gpu.cu:69-229`) and pytorch3d's
`sample_farthest_points` / the forced-initial-points variant
(`pointnet2/data_utils/points_sampling.py:13-187`).

FPS is inherently sequential over the K selections, but each selection round is
a fully vectorized distance update + argmax over all N points, which maps onto
the VPU.  We express the K rounds as one `lax.scan` so the whole op compiles to
a single fused loop on device; batch is handled by `vmap`.

Semantics:
  - deterministic start at index `start_idx` (the CUDA kernel always seeds
    index 0; pytorch3d seeds 0 unless `random_start_point`),
  - min-distance table updated against the last selected point each round,
  - next point = argmax of min-distances (ties resolved to the lowest index,
    matching both reference implementations' first-max behavior),
  - optional `num_forced`: the first `num_forced` selections are indices
    0..num_forced-1 regardless of distances (the "forced initial points" FPS of
    `points_sampling.py:101-103`, used to append extra keypoints to a given
    keypoint set).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

# Implementation switch.  "scan" is the lax.scan fallback (shards
# transparently under pjit / virtual CPU meshes); "pallas" runs the whole
# K-round loop VMEM-resident in one kernel (ops/pallas/fps.py — ~25x on the
# autoencoder's 2048->1024 sampling, where per-round loop overhead dominates);
# "auto" picks pallas on a SINGLE-device TPU process and scan everywhere else
# (a pallas_call inside a pjit-sharded step is not auto-partitionable, so
# multi-device processes keep the scan).
_FPS_IMPL = os.environ.get("SLIDE_TPU_FPS", "auto").lower()


def set_fps_impl(impl: str) -> None:
    """impl: 'auto' (default), 'scan', or 'pallas'."""
    global _FPS_IMPL
    if impl not in ("auto", "scan", "pallas"):
        raise ValueError(f"unknown FPS impl {impl!r}")
    if impl != _FPS_IMPL:
        _FPS_IMPL = impl
        # read at trace time — invalidate cached traces (ADVICE r3: stale-toggle hazard)
        import jax
        jax.clear_caches()


def _use_pallas(n: int, d: int) -> bool:
    if _FPS_IMPL == "scan":
        return False
    from slide_tpu.ops.pallas import pallas_available
    if _FPS_IMPL == "pallas":
        # forced mode fails loudly instead of silently diverging: the kernel
        # distances over xyz[..., :3] while the scan uses ALL channels, and a
        # pallas_call cannot lower for the CPU backend
        if d != 3:
            raise ValueError(
                f"SLIDE_TPU_FPS=pallas supports 3-channel points only, got "
                f"D={d} (the scan path distances over all channels)")
        if not pallas_available():
            raise RuntimeError("SLIDE_TPU_FPS=pallas but no Pallas-capable "
                               "accelerator backend is active")
        return True
    # auto policy: 3-channel (the kernel's distance definition matches the
    # scan only at D=3), lane-aligned clouds only (every AE/SAP hot shape is
    # a multiple of 128; the odd sizes — e.g. the 2049-point
    # centroid-prepended keypoint cloud — go to the scan, which is also where
    # FPS cost is negligible).  Mosaic handles padded lanes logically, but a
    # scanned grad-step with the 2049-lane kernel hit a TPU-backend
    # InvalidArgument at runtime; until that's root-caused the aligned gate
    # is the safe set.
    return (d == 3 and n % 128 == 0 and pallas_available()
            and len(jax.devices()) == 1)


def furthest_point_sample(xyz: jax.Array, k: int, start_idx=0, num_forced: int = 0):
    """Iterative max-min sampling of `k` points.

    Args:
      xyz: (B, N, D) point coordinates (D is usually 3).
      k: number of points to select (static).
      start_idx: scalar or (B,) int array, index of the first selected point.
      num_forced: first `num_forced` selections are forced to be indices
        0..num_forced-1 (implies start_idx must select index 0).

    Returns:
      idx: (B, k) int32 indices of the selected points.
    """
    if xyz.ndim != 3:
        raise ValueError(f"xyz must be (B, N, D), got {xyz.shape}")
    b, n, d = xyz.shape
    if k > n:
        raise ValueError(f"cannot sample {k} points from {n}")
    if _use_pallas(n, d):
        from slide_tpu.ops.pallas import fps_pallas
        # indices carry no tangents; sever the AD path so the kernel is not
        # differentiated through (pallas_call has no JVP rule)
        return fps_pallas(lax.stop_gradient(xyz), k, start_idx=start_idx,
                          num_forced=num_forced)
    return _fps_scan(xyz, k, start_idx, num_forced)


@functools.partial(jax.jit, static_argnames=("k", "num_forced"))
def _fps_scan(xyz: jax.Array, k: int, start_idx=0, num_forced: int = 0):
    b, n, _ = xyz.shape
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (b,))

    def one_cloud(pts, s0):
        # pts: (N, D); s0: scalar start index
        def step(carry, i):
            min_d, last = carry
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            min_d = jnp.minimum(min_d, d)
            sel = jnp.where(i < num_forced, i, jnp.argmax(min_d).astype(jnp.int32))
            return (min_d, sel), sel

        init = (jnp.full((n,), jnp.inf, dtype=pts.dtype), s0)
        if k == 1:
            return s0[None]
        (_, _), rest = lax.scan(step, init, jnp.arange(1, k, dtype=jnp.int32))
        return jnp.concatenate([s0[None], rest])

    return jax.vmap(one_cloud)(xyz.astype(jnp.float32), start)


def sample_keypoints(xyz: jax.Array, k: int, *, add_centroid: bool = True,
                     key: jax.Array | None = None, random_subsample: bool = False):
    """Sample `k` keypoints from each cloud, reference
    `data_utils/points_sampling.py:156-187`.

    Modes (matching the reference exactly):
      - add_centroid=True: prepend the centroid to the cloud and run FPS with a
        deterministic start at index 0 (so the centroid is always keypoint 0).
      - add_centroid=False: FPS with a random start point (requires `key`).
      - random_subsample=True: uniform random subset of k points (requires
        `key`; incompatible with add_centroid, as in the reference).

    Returns (keypoints (B, k, D), idx (B, k)).  With add_centroid, indices are
    into the centroid-prepended cloud (0 == centroid), as in the reference.
    """
    if xyz.ndim != 3:
        raise ValueError(f"xyz must be (B, N, D), got {xyz.shape}")
    b, n, _ = xyz.shape
    if random_subsample:
        if add_centroid:
            raise ValueError("random_subsample excludes add_centroid (reference asserts)")
        if key is None:
            raise ValueError("random_subsample requires a PRNG key")
        # Reference uses ONE permutation shared across the batch
        # (points_sampling.py:172-175).
        idx = jax.random.permutation(key, n)[:k].astype(jnp.int32)
        idx = jnp.broadcast_to(idx[None], (b, k))
        return jnp.take_along_axis(xyz, idx[..., None], axis=1), idx
    if add_centroid:
        centroid = jnp.mean(xyz, axis=1, keepdims=True)
        full = jnp.concatenate([centroid, xyz], axis=1)
        idx = furthest_point_sample(full, k, start_idx=0)
        return jnp.take_along_axis(full, idx[..., None], axis=1), idx
    if key is None:
        raise ValueError("add_centroid=False requires a PRNG key for the random start")
    start = jax.random.randint(key, (b,), 0, n, dtype=jnp.int32)
    idx = furthest_point_sample(xyz, k, start_idx=start)
    return jnp.take_along_axis(xyz, idx[..., None], axis=1), idx


def append_points_to_keypoints(points: jax.Array, initial_points: jax.Array,
                               k: int, *, only_return_appended: bool = False):
    """Grow a keypoint set to at least `k` points by FPS over the cloud with
    the existing keypoints FORCED as the first selections
    (`data_utils/points_sampling.py:120-154`).

    points (B, N, D), initial_points (B, M, D).  If M >= k the initial points
    are returned unchanged (with -1 indices, as the reference does).
    Returns (keypoints (B, max(k, M), D), idx (B, max(k, M))); indices are
    into the [initial | points] concatenation.
    """
    b, m, _ = initial_points.shape
    if m >= k:
        idx = jnp.full((b, m), -1, jnp.int32)
        return initial_points, idx
    full = jnp.concatenate([initial_points, points], axis=1)
    idx = furthest_point_sample(full, k, start_idx=0, num_forced=m)
    sampled = jnp.take_along_axis(full, idx[..., None], axis=1)
    if only_return_appended:
        return sampled[:, m:], idx[:, m:]
    return sampled, idx


def fps_subsample(points: jax.Array, k: int, *, start_idx=0):
    """FPS-downsample a (B, N, C) cloud (first 3 channels are xyz) to (B, k, C).

    Used for multi-level chamfer targets in the autoencoder
    (`models/autoencoder.py:63-87`) and FPS-trimming in the upsample decoder
    (`models/point_upsample_decoder.py:149-182`).
    """
    idx = furthest_point_sample(points[..., :3], k, start_idx=start_idx)
    return jnp.take_along_axis(points, idx[..., None], axis=1)
