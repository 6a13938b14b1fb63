"""Pallas furthest-point-sampling kernel (SURVEY.md §7.3 item 1 — the
flagship kernel).

Why a kernel: the jnp FPS is a `lax.scan` whose every round reads xyz and the
min-distance table from HBM and pays an XLA loop-iteration dispatch; with
K=1024 selections (the SAP tower's first SA level) latency is dominated by
those round trips.  Here the ENTIRE K-round loop runs inside one kernel with
coordinates and the min-distance table resident in VMEM.

Layout: coordinates enter as (B, 3, N) — three (1, N) lane-major rows per
cloud, so every distance update is a handful of full-lane VPU passes.  The
selected point's coordinates are extracted with a masked reduction
(sum(x * [iota == last])), avoiding dynamic lane indexing.  Grid = (B,).

Semantics identical to `ops.fps.furthest_point_sample` (same start handling,
same forced-initial support, ties -> lowest index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from jax.experimental import pallas as pl

try:  # TPU-specific bits are optional so CPU test runs can interpret
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def pallas_available() -> bool:
    try:
        return _HAS_PLTPU and jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fps_kernel(k: int, num_forced: int, n: int, start_ref, xyz_ref, out_ref,
                mind_ref):
    # start_ref: (B,) scalar-prefetch; xyz_ref: (1, 3, N) VMEM;
    # out_ref: (1, 1, K) VMEM int32; mind_ref: (1, N) f32 VMEM scratch
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    xs = xyz_ref[0, 0:1, :]
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]
    mind_ref[:] = jnp.full((1, n), jnp.inf, jnp.float32)
    start = start_ref[pl.program_id(0)]
    k_lane = lax.broadcasted_iota(jnp.int32, (1, k), 1)
    out_ref[0] = jnp.full((1, k), start, jnp.int32)

    def body(i, last):
        sel_mask = (lane == last).astype(jnp.float32)
        px = jnp.sum(xs * sel_mask)
        py = jnp.sum(ys * sel_mask)
        pz = jnp.sum(zs * sel_mask)
        d = (xs - px) ** 2 + (ys - py) ** 2 + (zs - pz) ** 2
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        nxt = jnp.argmax(mind[0, :]).astype(jnp.int32)
        nxt = jnp.where(i < num_forced, i, nxt)
        out_ref[0] = jnp.where(k_lane == i, nxt, out_ref[0])
        return nxt

    lax.fori_loop(1, k, body, start, unroll=False)


@functools.partial(jax.jit, static_argnames=("k", "num_forced", "interpret"))
def fps_pallas(xyz: jax.Array, k: int, start_idx=0, num_forced: int = 0,
               interpret: bool = False) -> jax.Array:
    """Drop-in replacement for `furthest_point_sample` returning (B, k) int32.

    xyz: (B, N, D>=3) — only the first 3 channels are used (as the reference
    CUDA kernel does).  `interpret=True` runs the kernel in interpreter mode
    (for CPU tests).
    """
    b, n, _ = xyz.shape
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (b,))
    xyz_t = jnp.moveaxis(xyz[..., :3].astype(jnp.float32), -1, -2)  # (B, 3, N)

    kernel = functools.partial(_fps_kernel, k, num_forced, n)
    if not _HAS_PLTPU:  # pragma: no cover
        raise NotImplementedError("pallas TPU backend unavailable")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, n), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, k), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        interpret=interpret,
    )(start, xyz_t)
    return out[:, 0, :]
