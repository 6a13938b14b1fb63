"""Benchmark: END-TO-END mesh generation, the BASELINE.json north-star metric
(meshes/sec/chip) — position DDPM (T=1000) -> feature DDPM (T=1000) -> AE
decode (16 -> 2048 pts) -> SAP refine+upsample -> DPSR 128^3 -> marching
(host), at full shipped-config model sizes, with host mesh extraction
OVERLAPPED with the next batch's device work (steady-state pipeline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

vs_baseline derivation (no guesses — see benchmarks/reference_baseline.py,
whose measured output is committed as benchmarks/reference_baseline.json):
the reference publishes no wall-time numbers, so we bound it from above.  Its
generation pipeline is a python eager loop issuing (counted with
torch.profiler on the reference's own model code) 1362 aten dispatches per
position-net forward and 1395 per latent-net forward, 1000 reverse steps each.
An eager step can never be faster than its dispatch cost, so the A100 ceiling
is  t_ref_device >= T * (1362 + 1395) * per_op_dispatch_cost, with kernel
execution time, AE/SAP/DPSR forwards, and host<->device transfers all counted
as ZERO (maximally generous to the reference).  per-op dispatch cost is
measured on this host (3.6 us).  Host mesh extraction is charged to the
reference at OUR measured per-batch marching cost (same algorithm class, same
host budget).  vs_baseline = our meshes/s / that ceiling's meshes/s — a LOWER
bound on the true speedup.

detail.denoise_steps_per_sec vs detail.a100_eager_ceiling_steps_per_sec_kp
gives the same honest ratio for the round-1 headline workload (batch-200
position sampling, README.md:83-90).
"""

import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    # keep the accelerator first (stays default) but allow CPU-side init
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, "benchmarks", ".jax_cache"))
except Exception:
    pass


def _load_baseline():
    with open(os.path.join(_REPO, "benchmarks", "reference_baseline.json")) as f:
        return json.load(f)


def bench_denoise_steps(batch=200, t_steps=1000):
    """Round-1 headline: position-DDPM sampling, batch 200, T=1000, fused
    single-kernel denoiser (SLIDE_TPU_FUSED=0 falls back to flax)."""
    from slide_tpu.configs import keypoint_ddpm_config
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.diffusion import calc_diffusion_hyperparams, diffusion_sampling

    cfg = keypoint_ddpm_config("airplane")
    net = ConditionalPointNet2(cfg["pointnet_config"])
    label = jnp.zeros((batch,), jnp.int32)
    try:        # init on CPU: the remote-compile tunnel makes on-TPU init slow
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = net.init(jax.random.key(0), jnp.zeros((2, 16, 3)),
                                 ts=jnp.zeros((2,), jnp.int32),
                                 label=jnp.zeros((2,), jnp.int32))
        variables = jax.device_put(variables, jax.devices()[0])
    except RuntimeError:
        variables = net.init(jax.random.key(0), jnp.zeros((2, 16, 3)),
                             ts=jnp.zeros((2,), jnp.int32),
                             label=jnp.zeros((2,), jnp.int32))
    sched = calc_diffusion_hyperparams(t_steps, 1e-4, 0.02)

    fused = None
    if os.environ.get("SLIDE_TPU_FUSED", "1") != "0" \
            and jax.default_backend() not in ("cpu",):
        from slide_tpu.models.fused_denoiser import make_fused_net_fn
        fused = make_fused_net_fn(cfg["pointnet_config"], variables["params"],
                                  16, block_b=40)

    if fused is not None:
        def net_fn(xx, ts):
            return fused(xx, ts, label)
    else:
        def net_fn(xx, ts):
            return net.apply(variables, xx, ts=ts, label=label)

    sample = jax.jit(lambda key: diffusion_sampling(
        net_fn, key, (batch, 16, 3), sched))

    jax.block_until_ready(sample(jax.random.key(1)))      # compile
    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        jax.block_until_ready(sample(jax.random.key(2 + i)))
    dt = (time.perf_counter() - t0) / n_runs
    return t_steps / dt


def bench_e2e(batch=16, t_steps=1000, rounds=2, stages=None):
    """Steady-state end-to-end meshes/sec/chip with HOST mesh extraction
    (f16 grid fetch) overlapped with the next batch's device work."""
    from benchmarks.e2e_pipeline import build_stages, device_chain
    from slide_tpu.sap.marching import mc_from_device_psr

    if stages is None:
        stages = build_stages(batch, t_steps=t_steps, verbose=True)

    mesh_counts = []
    march_times = []

    def march(grid):
        # f16 on-device cast + per-sample transfer/extraction overlap
        t0 = time.perf_counter()
        verts_l, _, _ = mc_from_device_psr(grid)
        march_times.append(time.perf_counter() - t0)
        mesh_counts.append(sum(1 for v in verts_l if len(v)))

    # warmup: compile everything, measure per-stage device time + march time
    print("bench_e2e: compiling + warmup ...", file=sys.stderr, flush=True)
    tw0 = time.perf_counter()
    grid = device_chain(stages, jax.random.key(100))
    tw1 = time.perf_counter()
    grid = device_chain(stages, jax.random.key(101))   # post-compile device time
    tw2 = time.perf_counter()
    march(grid)
    device_s = tw2 - tw1
    warm_march_s = march_times[-1]
    print(f"bench_e2e: device {device_s:.2f}s/batch, marching "
          f"{warm_march_s:.2f}s/batch (compile+warmup {tw1 - tw0:.0f}s)",
          file=sys.stderr, flush=True)
    mesh_counts.clear()
    march_times.clear()

    # steady state: march batch r-1 on host while batch r runs on device
    t0 = time.perf_counter()
    prev = device_chain(stages, jax.random.key(200))
    th = None
    for r in range(1, rounds):
        th = threading.Thread(target=march, args=(prev,))
        th.start()
        prev = device_chain(stages, jax.random.key(200 + r))
        th.join()
    march(prev)
    wall = time.perf_counter() - t0

    total_meshes = int(np.sum(mesh_counts))
    return {
        "wall_s": wall, "rounds": rounds, "batch": batch,
        "meshes": total_meshes,
        "meshes_per_sec": rounds * batch / wall,
        "nonempty_meshes_per_sec": total_meshes / wall,
        "device_s_per_batch": device_s,
        "march_s_per_batch": float(np.mean(march_times)),
    }


def bench_e2e_device_resident(stages, batch, rounds=3, num_samples=2048):
    """Steady-state meshes/sec with the ENTIRE pipeline device-resident:
    generation -> SAP/DPSR -> marching tetrahedra (sap/marching_tpu.py) ->
    area-weighted 2048-pt sampling all on the chip; only the sampled clouds
    (24 KB/shape) cross the link.  This is the TPU-native production path —
    PLY export (device_mesh_to_host) stays available per mesh on demand."""
    from benchmarks.e2e_pipeline import device_chain
    from slide_tpu.sap.marching_tpu import (mc_from_psr_device,
                                            sample_points_from_mesh_device)

    f_max, c_max = 524288, 262144

    @jax.jit
    def mesh_and_sample(grid, key):
        out = mc_from_psr_device(grid, f_max=f_max, c_max=c_max)
        keys = jax.random.split(key, batch)
        pts, nrm = jax.vmap(
            lambda m, k: sample_points_from_mesh_device(m, k, num_samples)
        )(out, keys)
        return pts, nrm, out["n_faces"], out["n_cells"]

    def once(seed):
        grid = device_chain(stages, jax.random.key(seed))
        pts, nrm, nf, nc = mesh_and_sample(grid, jax.random.key(seed + 1))
        return (np.asarray(pts), np.asarray(nrm), np.asarray(nf),
                np.asarray(nc))

    once(300)                                  # compile + warmup
    t0 = time.perf_counter()
    ok = overflow = 0
    for r in range(rounds):
        pts, nrm, nf, nc = once(301 + r)
        ok += int(np.sum((nf > 0) & (nf <= f_max) & (nc <= c_max)))
        overflow += int(np.sum((nf > f_max) | (nc > c_max)))
    wall = time.perf_counter() - t0
    return {"meshes_per_sec": rounds * batch / wall,
            "ok_meshes_per_sec": ok / wall, "overflow": overflow,
            "wall_s": wall, "rounds": rounds}


def main():
    base = _load_baseline()
    on_accel = jax.default_backend() not in ("cpu",)
    t_steps = 1000 if on_accel else 20   # CPU fallback: smoke numbers only
    batch = 16

    from benchmarks.e2e_pipeline import build_stages
    stages = build_stages(batch, t_steps=t_steps, verbose=True)
    e2e = bench_e2e(batch=batch, t_steps=t_steps, stages=stages)
    dev = bench_e2e_device_resident(stages, batch)
    steps_per_sec = bench_denoise_steps(batch=200, t_steps=t_steps)

    # reference A100 eager ceiling for the same e2e batch (see docstring)
    disp_s = base["per_op_dispatch_us"] * 1e-6
    ref_device_s = t_steps * (base["kp_net_aten_dispatches_per_forward"]
                              + base["latent_net_aten_dispatches_per_forward"]) * disp_s
    ref_total_s = ref_device_s + e2e["march_s_per_batch"]
    ref_meshes_per_sec = batch / ref_total_s

    kp_ceiling = 1e6 / (base["kp_net_aten_dispatches_per_forward"]
                        * base["per_op_dispatch_us"])

    # headline: the device-resident pipeline (generation -> mesh -> sampled
    # cloud entirely on-chip; host PLY export measured separately)
    print(json.dumps({
        "metric": "e2e_meshes_per_sec_per_chip",
        "value": round(dev["meshes_per_sec"], 3),
        "unit": "meshes/s",
        "vs_baseline": round(dev["meshes_per_sec"] / ref_meshes_per_sec, 2),
        "detail": {
            "batch": batch, "t_steps": t_steps,
            "pipeline_endpoint": "device marching tetrahedra + 2048-pt "
                                 "area-weighted sampling (marching_tpu.py); "
                                 "only sampled clouds leave the chip",
            "device_resident_ok_meshes_per_sec": round(dev["ok_meshes_per_sec"], 3),
            "budget_overflows": dev["overflow"],
            "host_export_meshes_per_sec": round(e2e["meshes_per_sec"], 3),
            "host_export_nonempty_per_sec": round(e2e["nonempty_meshes_per_sec"], 3),
            "device_s_per_batch": round(e2e["device_s_per_batch"], 3),
            "host_march_s_per_batch": round(e2e["march_s_per_batch"], 3),
            "denoise_steps_per_sec_batch200": round(steps_per_sec, 2),
            "a100_eager_ceiling_steps_per_sec_kp": round(kp_ceiling, 1),
            "denoise_vs_a100_ceiling": round(steps_per_sec / kp_ceiling, 2),
            "ref_e2e_ceiling_meshes_per_sec": round(ref_meshes_per_sec, 3),
            "baseline_derivation": "benchmarks/reference_baseline.json "
                                   "(measured dispatch cost x counted aten ops; "
                                   "zero kernel time => upper bound)",
        },
    }))


if __name__ == "__main__":
    main()
