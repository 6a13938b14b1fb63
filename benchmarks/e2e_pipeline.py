"""End-to-end generation pipeline benchmark — the BASELINE.md north star:
position DDPM (T=1000) -> feature DDPM (T=1000, keypoint-conditional) ->
autoencoder decode (16 -> 2048 pts) -> SAP refine+upsample -> DPSR 128^3 ->
marching tetrahedra, at full shipped-config model sizes (untrained weights —
throughput is weight-independent).

Usage: python benchmarks/e2e_pipeline.py [--batch 16] [--t 1000] [--fastdpm N]
Prints per-stage timings and meshes/sec/chip.

`build_stages()` is importable (bench.py reuses it for the driver-captured
meshes/sec number).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# allow CPU-side param init alongside the TPU (tunnel compiles are slow)
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.tpu_cache import enable_tpu_only_cache  # noqa: E402
enable_tpu_only_cache()


def _cpu_init(fn, *args, **kwargs):
    """Run a flax init on CPU (local compile) and ship params to the default
    accelerator — the remote-compile tunnel makes on-TPU init traces cost
    minutes each."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return fn(*args, **kwargs)
    with jax.default_device(cpu):
        variables = fn(*args, **kwargs)
    return jax.device_put(variables, jax.devices()[0])


def _log(msg, t0):
    # progress goes to stderr: bench.py's contract is ONE JSON line on stdout
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def build_stages(batch, t_steps=1000, fastdpm=0, ckpts=None, ema_idx=-1,
                 verbose=True):
    """Build the four jitted pipeline stages at full shipped-config sizes.

    Returns a dict with jitted fns: sample_kp(key), sample_lat(key, kp),
    decode(kp, feat, key), sap(cloud, key) -> dpsr grid.
    `ckpts`: optional dict kp/lat/ae/sap -> checkpoint path.
    """
    ckpts = ckpts or {}

    def _maybe_load(vars_, name):
        if ckpts.get(name) is None:
            return vars_
        from slide_tpu.cli import load_inference_params
        return {"params": load_inference_params(ckpts[name], ema_idx)}

    from slide_tpu.configs import (keypoint_ddpm_config, latent_ddpm_config,
                                   autoencoder_config, upsampler_config)
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.train import build_autoencoder
    from slide_tpu.diffusion import (calc_diffusion_hyperparams,
                                     diffusion_sampling, fast_sampling)
    from slide_tpu.diffusion.x0 import X0Schedule, x0_denoise
    from slide_tpu.sap import DPSR, mirror_and_concat, network_output_to_dpsr_grid

    b = batch
    label = jnp.zeros((b,), jnp.int32)
    t_start = time.perf_counter()
    log = (lambda m: _log(m, t_start)) if verbose else (lambda m: None)

    # ---- stage models (full shipped sizes)
    kp_cfg = keypoint_ddpm_config("airplane")
    kp_cfg["diffusion_config"]["T"] = t_steps
    kp_net = ConditionalPointNet2(kp_cfg["pointnet_config"])
    kp_vars = _cpu_init(kp_net.init, jax.random.key(1), jnp.zeros((2, 16, 3)),
                        ts=jnp.zeros((2,), jnp.int32),
                        label=jnp.zeros((2,), jnp.int32))
    kp_vars = _maybe_load(kp_vars, "kp")
    log("position net init")
    kp_sched = calc_diffusion_hyperparams(t_steps, 1e-4, 0.02)

    lat_cfg = latent_ddpm_config("airplane")
    lat_cfg["standard_diffusion_config"]["num_diffusion_timesteps"] = t_steps
    lat_net = ConditionalPointNet2(lat_cfg["pointnet_config"])
    lat_vars = _cpu_init(lat_net.init, jax.random.key(2), jnp.zeros((2, 16, 51)),
                         ts=jnp.zeros((2,), jnp.int32),
                         label=jnp.zeros((2,), jnp.int32))
    lat_vars = _maybe_load(lat_vars, "lat")
    log("latent net init")
    lat_sched = X0Schedule.from_config(lat_cfg["standard_diffusion_config"])

    ae_cfg = autoencoder_config("airplane")
    ae = build_autoencoder(ae_cfg["pointnet_config"])
    ae_vars = _cpu_init(ae.init, {"params": jax.random.key(3),
                        "gaussian": jax.random.key(4), "fps": jax.random.key(5)},
                        jnp.zeros((2, 2048, 6)), jnp.zeros((2, 16, 3)),
                        label=jnp.zeros((2,), jnp.int32))
    ae_vars = _maybe_load(ae_vars, "ae")
    log("autoencoder init")

    sap_cfg = upsampler_config()
    sap_net = ConditionalPointNet2(sap_cfg["pointnet_config"])
    sap_vars = _cpu_init(sap_net.init, jax.random.key(6), jnp.zeros((2, 2048, 7)),
                         ts=None, label=jnp.zeros((2,), jnp.int32))
    sap_vars = _maybe_load(sap_vars, "sap")
    log("sap net init")
    dpsr = DPSR((128, 128, 128), sig=2)

    # ---- jitted stage functions
    # fused single-kernel denoisers for both DDPM stages (SLIDE_TPU_FUSED=0
    # falls back to the flax forward)
    kp_fused = lat_fused = None
    if os.environ.get("SLIDE_TPU_FUSED", "1") != "0" \
            and jax.default_backend() not in ("cpu",):
        from slide_tpu.models.fused_denoiser import make_fused_net_fn
        kp_fused = make_fused_net_fn(kp_cfg["pointnet_config"],
                                     kp_vars["params"], 16)
        lat_fused = make_fused_net_fn(lat_cfg["pointnet_config"],
                                      lat_vars["params"], 16)
        if kp_fused is not None and not kp_fused.batch_ok(b):
            kp_fused = None
        if lat_fused is not None and not lat_fused.batch_ok(b):
            lat_fused = None

    def kp_net_fn(x, ts):
        if kp_fused is not None:
            return kp_fused(x, ts, label)
        return kp_net.apply(kp_vars, x, ts=ts, label=label)

    if fastdpm > 0:
        sample_kp = jax.jit(lambda k: fast_sampling(
            kp_net_fn, k, (b, 16, 3), kp_sched, kp_cfg["diffusion_config"],
            length=fastdpm, sampling_method="step", schedule="quadratic",
            kappa=0.5))
    else:
        sample_kp = jax.jit(lambda k: diffusion_sampling(
            kp_net_fn, k, (b, 16, 3), kp_sched))

    def lat_net_fn(x, ts):
        if lat_fused is not None:
            return lat_fused(x, ts, label)
        return lat_net.apply(lat_vars, x, ts=ts, label=label)

    if fastdpm > 0:
        from slide_tpu.diffusion import fast_x0_denoise
        sample_lat = jax.jit(lambda k, kp: fast_x0_denoise(
            lat_net_fn, k, (b, 16, 51), lat_sched, length=fastdpm,
            schedule="quadratic", kappa=0.5, keypoint=kp, keypoint_dim=3))
    else:
        sample_lat = jax.jit(lambda k, kp: x0_denoise(
            lat_net_fn, k, (b, 16, 51), lat_sched, keypoint=kp, keypoint_dim=3))

    decode = jax.jit(lambda kp, feat, k: ae.apply(
        {"params": ae_vars["params"]}, kp, feat, label=label, method=ae.decode,
        rngs={"fps": k}))

    def sap_fn(x, k):
        xm = mirror_and_concat(x, axis=2, num_points=(), attach_label=True,
                               permute=True, key=k)[0]
        disp = sap_net.apply(sap_vars, xm, ts=None, label=label)
        grid, _, _ = network_output_to_dpsr_grid(
            xm, disp, dpsr, 1, sap_cfg["pointnet_config"],
            last_dim_as_indicator=True, explicit_normalize=True)
        return grid

    sap = jax.jit(sap_fn)

    return {"sample_kp": sample_kp, "sample_lat": sample_lat, "decode": decode,
            "sap": sap, "batch": b, "t_steps": t_steps,
            # kept so variants (with_fastdpm) can re-jit samplers without
            # paying the multi-minute model re-init
            "_kp_net_fn": kp_net_fn, "_lat_net_fn": lat_net_fn,
            "_kp_sched": kp_sched, "_kp_dc": kp_cfg["diffusion_config"],
            "_lat_sched": lat_sched}


def with_fastdpm(stages, length: int, kappa: float = 0.5):
    """Clone a built stage dict with BOTH DDPM chains swapped for S-step
    FastDPM samplers (STEP x quadratic), reusing the already-initialized
    nets/weights.  BASELINE.md config 5."""
    from slide_tpu.diffusion import fast_sampling, fast_x0_denoise

    b = stages["batch"]
    out = dict(stages)
    out["sample_kp"] = jax.jit(lambda k: fast_sampling(
        stages["_kp_net_fn"], k, (b, 16, 3), stages["_kp_sched"],
        stages["_kp_dc"], length=length, sampling_method="step",
        schedule="quadratic", kappa=kappa))
    out["sample_lat"] = jax.jit(lambda k, kp: fast_x0_denoise(
        stages["_lat_net_fn"], k, (b, 16, 51), stages["_lat_sched"],
        length=length, schedule="quadratic", kappa=kappa,
        keypoint=kp, keypoint_dim=3))
    out["t_steps"] = length
    return out


def device_chain(stages, key):
    """One device pass: keys -> dpsr grid (blocking)."""
    ks = jax.random.split(key, 4)
    kp = stages["sample_kp"](ks[0])
    latent = stages["sample_lat"](ks[1], kp)
    cloud = stages["decode"](latent[..., :3], latent[..., 3:], ks[2])
    return jax.block_until_ready(stages["sap"](cloud, ks[3]))


def main():
    from slide_tpu.sap.marching import mc_from_device_psr

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--fastdpm", type=int, default=0,
                    help="if >0, use FastDPM STEP sampling with this many steps "
                         "for the position chain")
    ap.add_argument("--skip-mesh", action="store_true")
    # optional trained checkpoints (pointnet_ckpt_<i>.pkl); random init if absent
    ap.add_argument("--kp_ckpt", type=str, default=None)
    ap.add_argument("--lat_ckpt", type=str, default=None)
    ap.add_argument("--ae_ckpt", type=str, default=None)
    ap.add_argument("--sap_ckpt", type=str, default=None)
    ap.add_argument("--ema_idx", type=int, default=-1)
    args = ap.parse_args()

    b = args.batch
    stages = build_stages(b, t_steps=args.t, fastdpm=args.fastdpm,
                          ckpts={"kp": args.kp_ckpt, "lat": args.lat_ckpt,
                                 "ae": args.ae_ckpt, "sap": args.sap_ckpt},
                          ema_idx=args.ema_idx)

    def run_once(key):
        ks = jax.random.split(key, 4)
        t0 = time.perf_counter()
        kp = jax.block_until_ready(stages["sample_kp"](ks[0]))
        t1 = time.perf_counter()
        latent = jax.block_until_ready(stages["sample_lat"](ks[1], kp))
        t2 = time.perf_counter()
        cloud = jax.block_until_ready(
            stages["decode"](latent[..., :3], latent[..., 3:], ks[2]))
        t3 = time.perf_counter()
        grid = jax.block_until_ready(stages["sap"](cloud, ks[3]))
        t4 = time.perf_counter()
        n_mesh = 0
        if not args.skip_mesh:
            verts_l, _, _ = mc_from_device_psr(grid)
            n_mesh = sum(1 for v in verts_l if len(v))
        t5 = time.perf_counter()
        return {"position_ddpm_s": t1 - t0, "feature_ddpm_s": t2 - t1,
                "ae_decode_s": t3 - t2, "sap_dpsr_s": t4 - t3,
                "marching_s": t5 - t4, "total_s": t5 - t0, "meshes": n_mesh}

    print("compiling + warmup ...", flush=True)
    warm = run_once(jax.random.key(100))
    print("warmup:", json.dumps({k: round(v, 3) for k, v in warm.items()}),
          flush=True)
    res = run_once(jax.random.key(101))
    res["batch"] = b
    res["shapes_per_sec"] = b / res["total_s"]
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
