"""One-off probe: scan-FPS vs Pallas-FPS on the real chip, at every
production shape (AE encoder levels, AE loss targets, SAP mirror trim,
keypoint sampling).  Methodology: scan-of-REPS inside one jit with the carry
chained through the op (CLAUDE.md timing methodology)."""

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

REPS = 5


def chained_time(op, x):
    @jax.jit
    def many(x):
        def body(c, _):
            idx = op(c)
            # chain: nudge the cloud by a tiny function of the result
            return c + 1e-6 * idx.sum().astype(c.dtype), idx
        return jax.lax.scan(body, x, None, length=REPS)

    xc, idx = many(x)
    jax.block_until_ready(idx)
    t0 = time.perf_counter()
    xc, idx = many(x)
    jax.block_until_ready(idx)
    return (time.perf_counter() - t0) / REPS


def main():
    from slide_tpu.ops.fps import _fps_scan
    from slide_tpu.ops.pallas.fps import fps_pallas, pallas_available

    shapes = [(32, 2048, 1024),   # AE loss target / encoder level 1
              (32, 1024, 256),    # encoder level 2
              (32, 256, 64),      # encoder level 3
              (8, 4096, 2048),    # SAP mirror trim
              (200, 2048, 16)]    # keypoint sampling
    out = {"pallas_available": pallas_available()}
    for b, n, k in shapes:
        x = jax.random.normal(jax.random.key(0), (b, n, 3))
        t_scan = chained_time(lambda c: _fps_scan(c, k), x)
        row = {"scan_ms": round(t_scan * 1000, 3)}
        if pallas_available():
            t_pal = chained_time(lambda c: fps_pallas(c, k), x)
            row["pallas_ms"] = round(t_pal * 1000, 3)
            row["speedup"] = round(t_scan / t_pal, 1)
            same = np.array_equal(np.asarray(fps_pallas(x, k)),
                                  np.asarray(_fps_scan(x, k)))
            row["match"] = bool(same)
        out[f"b{b}_n{n}_k{k}"] = row
        print(json.dumps({f"b{b}_n{n}_k{k}": row}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
