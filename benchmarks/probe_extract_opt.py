"""Fast-iteration probe for the device extraction path: synthetic 128^3
grids with a controlled surface-size spread (matched to the bench pipeline's
measured cells/faces distribution, benchmarks/results/probe_marching.json)
so extraction can be timed WITHOUT compiling the full generation chain
through the tunnel.  Times the bucketed batch path + per-bucket calls.

Usage: python benchmarks/probe_extract_opt.py [--out results/xxx.json]
"""

import argparse
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


def make_grids(batch=16, res=128, seed=0):
    """Smooth indicator fields whose active-cell counts match the bench
    pipeline's measured distribution (~1.6k .. 64k cells,
    benchmarks/results/probe_marching.json): perturbed sphere SDFs — a
    compact surface in a mostly-empty grid, like a tanh-smoothed DPSR
    indicator — with low-frequency wobble to roughen the surface toward the
    measured ~6 faces/cell."""
    rng = np.random.default_rng(seed)
    # target active-cell counts (the committed pipeline distribution)
    target_cells = [64077, 4930, 4010, 2226, 18678, 3692, 1744, 5652, 12513,
                    8813, 22035, 1572, 4206, 4050, 3218, 12635]
    x = np.arange(res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
    grids = []
    for i in range(batch):
        tc = target_cells[i % len(target_cells)]
        r = np.sqrt(tc / 16.0)           # cells ~ 1.3 * 4*pi*r^2
        c = res / 2 + rng.uniform(-5, 5, 3)
        dist = np.sqrt((gx - c[0]) ** 2 + (gy - c[1]) ** 2 + (gz - c[2]) ** 2)
        f = (r - dist).astype(np.float32)
        # low-frequency wobble roughens the surface (more faces/cell)
        a, b, cc = rng.integers(3, 9, 3)
        ph = rng.uniform(0, 2 * np.pi, 3)
        w = (np.cos(a * 2 * np.pi * gx / res + ph[0])
             * np.cos(b * 2 * np.pi * gy / res + ph[1])
             * np.cos(cc * 2 * np.pi * gz / res + ph[2]))
        grids.append(f + 0.45 * w.astype(np.float32))
    return jnp.asarray(np.stack(grids))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from slide_tpu.sap.marching_tpu import (count_cells_and_faces,
                                            extract_and_sample_device,
                                            _extract_and_sample_indexed,
                                            DEFAULT_BUCKETS)

    grid = jax.device_put(make_grids(args.batch), jax.devices()[0])
    jax.block_until_ready(grid)
    cells, faces = (np.asarray(a) for a in count_cells_and_faces(grid))
    print("cells:", cells.tolist(), file=sys.stderr)
    print("faces:", faces.tolist(), file=sys.stderr)

    # ---- bucketed batch (the bench path), warm then timed x3
    extract_and_sample_device(grid, jax.random.key(5), 2048)
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        pts, nrm, nf, nc, _ovf = extract_and_sample_device(
            grid, jax.random.key(6 + r), 2048)
    bucketed_s = (time.perf_counter() - t0) / reps
    print(f"bucketed batch-{args.batch}: {bucketed_s:.3f}s", file=sys.stderr)

    # ---- per-bucket single-sample cost (sample 0 = the big one); bucket
    # cost is budget-dominated and content-independent, so these keys are
    # directly comparable to the committed probe_marching.json tables
    timings = {}
    for (c_max, f_max) in [(32768, 262144), (65536, 524288),
                           (131072, 524288), (131072, 131072),
                           (32768, 131072)]:
        fn = lambda: _extract_and_sample_indexed(grid, jnp.int32(0),
                                                 jax.random.key(0), 2048,
                                                 f_max, c_max, 128.0)
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        timings[f"c{c_max}_f{f_max}"] = round(dt * 1000, 1)
        print(f"bucket c={c_max} f={f_max}: {dt*1000:.1f} ms", file=sys.stderr)

    res = {"cells": cells.tolist(), "faces": faces.tolist(),
           "bucketed_batch_s": round(bucketed_s, 3),
           "bucket_ms": timings}
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
