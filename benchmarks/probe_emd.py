"""One-off probe: measured cost of the auction EMD at 2048-pt clouds on the
real chip (VERDICT r2 item 5 asked for the real number before deciding the
cloud-level EMD protocol — round 2's "days of device time" was asserted,
not measured).

Methodology: reps are a lax.scan INSIDE one jitted call with the carry
chained through the op (x += 1e-6*d), so neither async dispatch nor
loop-invariant hoisting can fake the number (CLAUDE.md timing methodology).
A known-cost matmul runs through the same harness as a self-check.
"""

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

REPS = 10


def chained_time(op, x, *rest):
    """Seconds per op call: scan-of-N inside one jit, carry chained through
    the op.  Three tunnel-proofing rules (each learned from a failed probe):
    the carry is chained (no loop-invariant hoisting); the timed call gets
    DIFFERENT input buffers from the warmup call (the tunnel runtime can
    serve an identical (executable, args) re-execution from cache — round-4
    self-check read 80x over hardware peak); the sync is a fetched in-graph
    scalar (a value crossing the link is the only sync that cannot be
    faked).  Reported per-call time is the (2N - N) difference, which also
    cancels dispatch overhead."""

    def make(nreps):
        @jax.jit
        def many(x, *rest):
            def body(c, _):
                d = op(c, *rest)
                return c + 1e-6 * d.sum(), d.sum()
            xc, s = jax.lax.scan(body, x, None, length=nreps)
            return s.sum()
        return many

    def timed(many, xt):
        t0 = time.perf_counter()
        np.asarray(many(xt, *rest))
        return time.perf_counter() - t0

    t = {}
    for nreps in (REPS, 2 * REPS):
        many = make(nreps)
        np.asarray(many(x, *rest))                    # compile + warmup
        xt = x + 1e-3 * jax.random.normal(jax.random.key(nreps), x.shape)
        jax.block_until_ready(xt)
        t[nreps] = timed(many, xt)
    return (t[2 * REPS] - t[REPS]) / REPS


def main():
    from slide_tpu.ops.emd import earth_mover_distance

    n = int(os.environ.get("PROBE_EMD_N", "2048"))
    out = {}

    # self-check: 4096^3 f32 matmul = 137 GFLOP; v5e does f32 at ~half the
    # 197 TFLOP/s bf16 peak, so expect ~1.4 ms/call if the harness is honest
    a = jax.random.normal(jax.random.key(9), (4096, 4096))
    dt = chained_time(lambda x, y: (x @ y), a, a)
    out["selfcheck_matmul_4096_ms"] = round(dt * 1000, 3)
    out["selfcheck_matmul_tflops"] = round(2 * 4096 ** 3 / dt / 1e12, 1)

    for b in (8, 32, 64):
        x = jax.random.normal(jax.random.key(0), (b, n, 3))
        y = jax.random.normal(jax.random.key(1), (b, n, 3))
        dt = chained_time(earth_mover_distance, x, y)
        out[f"b{b}_s_per_call"] = round(dt, 4)
        out[f"b{b}_ms_per_pair"] = round(dt / b * 1000, 3)

    # full 1-NNA+MMD suite at 400 gen x 400 ref: pairwise_emd_cd computes
    # S*R + S*S + R*R pairs = 3 * 400 * 400
    pairs = 400 * 400 * 3
    best = min(v for k, v in out.items() if k.endswith("ms_per_pair"))
    out["est_suite_400x400_minutes"] = round(pairs * best / 1000 / 60, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
