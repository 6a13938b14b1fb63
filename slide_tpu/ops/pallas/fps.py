"""Pallas furthest-point-sampling kernel — the whole K-round selection loop
runs inside ONE kernel with coordinates, the min-distance table, and the
output indices resident in VMEM.

Why a kernel: the jnp FPS is a `lax.scan` whose every round re-reads xyz and
the min-distance table from HBM and pays several fused-region launches; at
the autoencoder's shapes (K=1024 selections over N=2048 points, plus the
encoder tower's 1024/256/64-point levels) those per-round costs dominate the
AE train step's forward (measured ~50 us/round on a v5e, ~0.05 s for one
2048->1024 FPS — benchmarks/profile_ae.py).  Equivalent capability to the
reference's CUDA kernel (`pointnet2_ops_lib/.../src/sampling_gpu.cu:69-229`),
which makes exactly the same move: the distance table lives in shared
memory/registers for the whole loop.

Layout: coordinates enter as (3, B, N) — per-axis lane-major rows, so every
distance update is full-lane VPU work on (bb, N) tiles (bb batch rows per
grid step fill the 8 sublanes).  The selected point's coordinates are
extracted with a masked reduction (sum(x * [lane == last])) and the argmax is
the max/min two-pass (first-max ties -> lowest index), avoiding dynamic lane
indexing and argmax lowering quirks.

Semantics identical to `ops.fps._fps_scan` (same start handling, same
forced-initial support, ties -> lowest index); `tests/test_pallas_fps.py`
checks exact index equality against the scan on every production shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl

try:  # TPU-specific bits are optional so CPU test runs can interpret
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def pallas_available() -> bool:
    # same gate as the fused denoiser: any non-CPU backend (the remote-tunnel
    # backend reports its own platform name but lowers Mosaic fine).  Honors
    # an active `jax.default_device(cpu)` scope (init-on-CPU pattern) — a
    # pallas_call can't lower for the CPU backend.
    try:
        if not _HAS_PLTPU:
            return False
        dd = jax.config.jax_default_device
        platform = dd.platform if dd is not None else jax.default_backend()
        return platform not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _fps_kernel(k: int, num_forced: int, n: int, bb: int,
                xyz_ref, start_ref, out_ref, mind_ref):
    # xyz_ref: (3, bb, N) VMEM; start_ref: (bb, 1) int32; out_ref: (bb, K)
    # int32; mind_ref: (bb, N) f32 scratch
    lane = lax.broadcasted_iota(jnp.int32, (bb, n), 1)
    xs = xyz_ref[0]
    ys = xyz_ref[1]
    zs = xyz_ref[2]
    mind_ref[:] = jnp.full((bb, n), jnp.inf, jnp.float32)
    start = start_ref[:, 0:1]                                   # (bb, 1)
    k_lane = lax.broadcasted_iota(jnp.int32, (bb, k), 1)
    out_ref[:] = jnp.broadcast_to(start, (bb, k))

    def body(i, last):                                          # last: (bb, 1)
        sel = (lane == last).astype(jnp.float32)                # (bb, N)
        px = jnp.sum(xs * sel, axis=1, keepdims=True)           # (bb, 1)
        py = jnp.sum(ys * sel, axis=1, keepdims=True)
        pz = jnp.sum(zs * sel, axis=1, keepdims=True)
        d = (xs - px) ** 2 + (ys - py) ** 2 + (zs - pz) ** 2
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        # first-max argmax as a max/min two-pass (ties -> lowest index)
        maxv = jnp.max(mind, axis=1, keepdims=True)             # (bb, 1)
        nxt = jnp.min(jnp.where(mind == maxv, lane, n), axis=1,
                      keepdims=True).astype(jnp.int32)
        nxt = jnp.where(i < num_forced, i, nxt)                 # (bb, 1)
        out_ref[:] = jnp.where(k_lane == i, nxt, out_ref[:])
        return nxt

    lax.fori_loop(1, k, body, start, unroll=False)


_BB = 8  # batch rows per grid step — Mosaic requires the second-to-last
         # block dim be a multiple of 8 (sublanes) or equal the array dim,
         # so the batch is zero-padded up to a multiple of 8 and trimmed


@functools.partial(jax.jit, static_argnames=("k", "num_forced", "interpret"))
def fps_pallas(xyz: jax.Array, k: int, start_idx=0, num_forced: int = 0,
               interpret: bool = False) -> jax.Array:
    """Drop-in replacement for `furthest_point_sample` returning (B, k) int32.

    xyz: (B, N, D>=3) — only the first 3 channels are used (as the reference
    CUDA kernel does).  `interpret=True` runs the kernel in interpreter mode
    (for CPU tests).
    """
    if not _HAS_PLTPU:  # pragma: no cover
        raise NotImplementedError("pallas TPU backend unavailable")
    b, n, _ = xyz.shape
    if k == 1:
        return jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (b,))[:, None]
    bb = _BB
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (b,))[:, None]
    xyz_t = jnp.moveaxis(xyz[..., :3].astype(jnp.float32), -1, 0)  # (3, B, N)

    # pad the batch to a multiple of the 8-row tile (zero rows select index 0
    # every round — bounded wasted work, trimmed below); without this, odd
    # batches (25, 12, 6, ...) are rejected by the Mosaic block constraint
    bp = -(-b // bb) * bb
    if bp != b:
        xyz_t = jnp.concatenate(
            [xyz_t, jnp.zeros((3, bp - b, n), jnp.float32)], axis=1)
        start = jnp.concatenate(
            [start, jnp.zeros((bp - b, 1), jnp.int32)], axis=0)

    kernel = functools.partial(_fps_kernel, k, num_forced, n, bb)
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=[pl.BlockSpec((3, bb, n), lambda i: (0, i, 0)),
                  pl.BlockSpec((bb, 1), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bb, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bb, n), jnp.float32)],
        interpret=interpret,
    )(xyz_t, start)
    return out[:b] if bp != b else out
