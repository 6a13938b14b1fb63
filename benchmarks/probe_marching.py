"""One-off probe: surface-size distribution + per-bucket extraction cost on
the real chip, driving the same grids bench.py uses.  Informs the bucket
table in sap/marching_tpu.py (VERDICT r2 item 1)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.tpu_cache import enable_tpu_only_cache  # noqa: E402
enable_tpu_only_cache()


def main():
    from benchmarks.e2e_pipeline import build_stages, device_chain
    from slide_tpu.sap.marching_tpu import (count_active_cells,
                                            count_cells_and_faces,
                                            extract_and_sample_device,
                                            _extract_and_sample_indexed,
                                            DEFAULT_BUCKETS)

    t_steps = int(os.environ.get("PROBE_T", "1000"))
    batch = 16
    stages = build_stages(batch, t_steps=t_steps, verbose=True)
    t0 = time.perf_counter()
    grid = device_chain(stages, jax.random.key(100))
    print(f"device chain (compile+run) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    grid = device_chain(stages, jax.random.key(101))
    chain_s = time.perf_counter() - t0
    print(f"device chain (steady) {chain_s:.2f}s", file=sys.stderr)

    # ---- surface-size stats
    counts = np.asarray(count_active_cells(grid))      # compile
    t0 = time.perf_counter()
    counts = np.asarray(count_active_cells(grid))
    count_s = time.perf_counter() - t0
    print("active cells per sample:", counts.tolist(), file=sys.stderr)
    print(f"count dispatch+fetch {count_s*1000:.0f} ms (post-compile)",
          file=sys.stderr)

    # ---- per-bucket single-sample extraction timing (sample 0)
    timings = {}
    for (c_max, f_max) in DEFAULT_BUCKETS:
        fn = lambda: _extract_and_sample_indexed(grid, jnp.int32(0),
                                                 jax.random.key(0), 2048,
                                                 f_max, c_max, 128.0)
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        nf = int(out[2])
        timings[f"c{c_max}_f{f_max}"] = round(dt * 1000, 1)
        print(f"bucket c={c_max} f={f_max}: {dt*1000:.1f} ms/sample "
              f"(n_faces={nf})", file=sys.stderr)

    # ---- cell-vs-face cost split: fixed c_max, sweep f_max (the per-budget
    # linear model t ~ a + b*c_max + g*f_max falls out of these + the ladder)
    split = {}
    for c_max in (32768, 131072):
        for f_max in (c_max // 2, c_max, 2 * c_max, 4 * c_max, 8 * c_max):
            fn = lambda: _extract_and_sample_indexed(grid, jnp.int32(0),
                                                     jax.random.key(0), 2048,
                                                     f_max, c_max, 128.0)
            jax.block_until_ready(fn())
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 3
            split[f"c{c_max}_f{f_max}"] = round(dt * 1000, 1)
            print(f"split c={c_max} f={f_max}: {dt*1000:.1f} ms",
                  file=sys.stderr)

    # ---- dense cells+faces count cost
    jax.block_until_ready(count_cells_and_faces(grid))
    t0 = time.perf_counter()
    cf = count_cells_and_faces(grid)
    jax.block_until_ready(cf)
    cf_s = time.perf_counter() - t0
    print(f"cells+faces count dispatch+fetch {cf_s*1000:.0f} ms; "
          f"faces {np.asarray(cf[1]).tolist()}", file=sys.stderr)

    # ---- full bucketed batch
    out = extract_and_sample_device(grid, jax.random.key(5), 2048)
    t0 = time.perf_counter()
    pts, nrm, nf, nc, _ovf = extract_and_sample_device(grid,
                                                       jax.random.key(6), 2048)
    bucketed_s = time.perf_counter() - t0
    print(f"bucketed batch-16 extraction: {bucketed_s:.2f}s  "
          f"faces min/med/max {nf.min()}/{int(np.median(nf))}/{nf.max()}",
          file=sys.stderr)

    # ---- old fixed-budget batch for comparison
    from slide_tpu.sap.marching_tpu import (mc_from_psr_device,
                                            sample_points_from_mesh_device)
    f_max, c_max = 524288, 262144

    @jax.jit
    def mesh_and_sample(grid, key):
        out = mc_from_psr_device(grid, f_max=f_max, c_max=c_max)
        keys = jax.random.split(key, batch)
        pts, nrm = jax.vmap(
            lambda m, k: sample_points_from_mesh_device(m, k, 2048)
        )(out, keys)
        return pts, nrm, out["n_faces"], out["n_cells"]

    jax.block_until_ready(mesh_and_sample(grid, jax.random.key(7)))
    t0 = time.perf_counter()
    jax.block_until_ready(mesh_and_sample(grid, jax.random.key(8)))
    fixed_s = time.perf_counter() - t0
    print(f"fixed-budget batch-16 extraction: {fixed_s:.2f}s", file=sys.stderr)

    print(json.dumps({
        "chain_s": round(chain_s, 3), "count_ms": round(count_s * 1000, 1),
        "cells": counts.tolist(), "faces": nf.tolist(),
        "bucket_ms_per_sample": timings,
        "split_ms": split,
        "count_cells_faces_ms": round(cf_s * 1000, 1),
        "bucketed_batch_s": round(bucketed_s, 3),
        "fixed_batch_s": round(fixed_s, 3),
        "est_meshes_per_sec": round(batch / (chain_s + bucketed_s), 2),
    }))


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
