"""Latent-chain optimization probe (VERDICT r3 item 4): the latent denoise +
AE decode chain is the largest e2e device stage (~0.30 s of 0.90 s/batch-16
at r2) and the fused-kernel path was ruled out on VMEM grounds.  Measure the
remaining lever — bf16 activations through the inference chain
(nn/precision.py) — against the f32 baseline, with output drift, at the
production batch tile (40).

Methodology: chained-carry scan timing is not needed here — the chain is a
single dispatch of a T-step scan, far above the 0.2 ms tunnel sync floor.
Each timing is a median of N post-compile calls.

Prints one JSON dict; the campaign/bench pick up the winner via
SLIDE_TPU_ACT_DTYPE.
"""

from __future__ import annotations

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

from benchmarks.train_throughput import _cpu_init


def timeit(fn, n=5):
    """fn(i) -> array; i varies per call so no two calls share the exact
    (executable, args) pair, and the sync is a host fetch of one element —
    the two tunnel-proofing rules from benchmarks/probe_emd.py."""
    np.asarray(jax.device_get(fn(0).ravel()[0]))
    ts = []
    for i in range(1, n + 1):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(i).ravel()[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(b=40, t_steps=1000):
    from slide_tpu.configs import latent_ddpm_config, autoencoder_config
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.train import build_autoencoder
    from slide_tpu.diffusion.x0 import X0Schedule
    from slide_tpu.diffusion.latent import latent_denoise_and_reconstruct
    from slide_tpu.nn.precision import activation_dtype_scope

    lat_cfg = latent_ddpm_config("airplane")
    lat_cfg["standard_diffusion_config"]["num_diffusion_timesteps"] = t_steps
    sched = X0Schedule.from_config(lat_cfg["standard_diffusion_config"])
    feat_dim = lat_cfg["pointnet_config"]["in_fea_dim"]
    ae_cfg = autoencoder_config("airplane")

    lat_net = ConditionalPointNet2(lat_cfg["pointnet_config"])
    ae = build_autoencoder(ae_cfg["pointnet_config"])

    kp = jax.random.normal(jax.random.key(1), (b, 16, 3)) * 0.3
    lbl = jnp.zeros((b,), jnp.int32)
    lat_vars = _cpu_init(lat_net.init, jax.random.key(0),
                         jnp.zeros((2, 16, 3 + feat_dim)),
                         ts=jnp.zeros((2,), jnp.int32),
                         label=jnp.zeros((2,), jnp.int32))
    ae_vars = _cpu_init(
        ae.init, {"params": jax.random.key(2), "gaussian": jax.random.key(3),
                  "fps": jax.random.key(4)},
        jnp.zeros((2, 2048, 6)), jnp.zeros((2, 16, 3)),
        label=jnp.zeros((2,), jnp.int32))

    def build_chain():
        """Trace under the CURRENT activation dtype (read at trace time)."""
        def chain(k):
            def lat_net_fn(x, ts):
                return lat_net.apply(lat_vars, x, ts=ts, label=lbl)

            def decode_fn(kp_, feat, lbl_, kk):
                return ae.apply(ae_vars, kp_, feat, label=lbl_,
                                method=ae.decode, rngs={"fps": kk})

            return latent_denoise_and_reconstruct(
                lat_net_fn, decode_fn, k, b, 3, (16, 3 + feat_dim), sched,
                label=lbl, keypoint=kp)[0]

        return jax.jit(chain)

    res = {"batch": b, "t_steps": t_steps}
    key = jax.random.key(9)

    chain_f32 = build_chain()
    res["chain_f32_s"] = timeit(lambda i: chain_f32(jax.random.fold_in(key, i)))
    out_f32 = np.asarray(chain_f32(key))[..., :3]

    with activation_dtype_scope("bfloat16"):
        chain_bf16 = build_chain()
        res["chain_bf16_s"] = timeit(
            lambda i: chain_bf16(jax.random.fold_in(key, i)))
        out_bf16 = np.asarray(chain_bf16(key))[..., :3]

    res["speedup_bf16"] = res["chain_f32_s"] / res["chain_bf16_s"]
    res["out_max_abs_diff"] = float(np.abs(out_f32 - out_bf16).max())
    res["out_rms_diff"] = float(np.sqrt(((out_f32 - out_bf16) ** 2).mean()))
    res["out_f32_std"] = float(out_f32.std())

    # stage split (f32): denoise scan alone vs decode alone
    def denoise_only(k):
        from slide_tpu.diffusion.x0 import x0_denoise
        def lat_net_fn(x, ts):
            return lat_net.apply(lat_vars, x, ts=ts, label=lbl)
        return x0_denoise(lat_net_fn, k, (b, 16, 3 + feat_dim), sched,
                          keypoint=kp, keypoint_dim=3)

    jd = jax.jit(denoise_only)
    res["denoise_f32_s"] = timeit(lambda i: jd(jax.random.fold_in(key, i)))
    lat_out = jd(key)

    def decode_only(latent, kk):
        return ae.apply(ae_vars, latent[..., :3], latent[..., 3:], label=lbl,
                        method=ae.decode, rngs={"fps": kk})

    jdec = jax.jit(decode_only)
    res["decode_f32_s"] = timeit(
        lambda i: jdec(lat_out, jax.random.fold_in(jax.random.key(5), i)))

    with activation_dtype_scope("bfloat16"):
        jd16 = jax.jit(denoise_only)
        res["denoise_bf16_s"] = timeit(
            lambda i: jd16(jax.random.fold_in(key, i)))
        jdec16 = jax.jit(decode_only)
        res["decode_bf16_s"] = timeit(
            lambda i: jdec16(lat_out, jax.random.fold_in(jax.random.key(5), i)))

    # fused Pallas latent denoiser (inference-only — round 3 killed only its
    # BACKWARD on VMEM grounds; the forward kernel is the e2e bench's
    # default latent path).  This is the VERDICT r3 item-4 comparison.
    from slide_tpu.models.fused_denoiser import make_fused_net_fn
    fused = make_fused_net_fn(lat_cfg["pointnet_config"], lat_vars["params"],
                              16, block_b=40)
    if fused is not None and fused.batch_ok(b):
        from slide_tpu.diffusion.x0 import x0_denoise

        def denoise_fused(k):
            def net_fn(x, ts):
                return fused(x, ts, lbl)
            return x0_denoise(net_fn, k, (b, 16, 3 + feat_dim), sched,
                              keypoint=kp, keypoint_dim=3)

        jdf = jax.jit(denoise_fused)
        res["denoise_fused_s"] = timeit(
            lambda i: jdf(jax.random.fold_in(key, i)))
        res["speedup_fused_vs_f32"] = (res["denoise_f32_s"]
                                       / res["denoise_fused_s"])
    else:
        res["denoise_fused_s"] = None

    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in res.items()}))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "latent_chain.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
