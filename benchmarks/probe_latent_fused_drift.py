"""Latent-chain optimization with METRIC-level drift (VERDICT r4 item 6).

Round 4's bf16-everywhere attempt gave 1.085x with raw-rms drift 1.31 — but
raw rms after a 1000-step stochastic chain only proves the samples decohered,
not that the DISTRIBUTION moved.  This probe measures the production-relevant
pair on TRAINED weights:

  flax f32 latent chain  vs  fused Pallas latent chain (single-kernel
  denoiser forward, the same kernel family that runs the keypoint stage)

and reports (a) wall per chain at the production tile (b=40, T=1000), and
(b) 1-NNA-CD between the two generated SETS (0.5 = indistinguishable) plus
each set vs the held-out test clouds — the drift measure VERDICT asked for.

Writes benchmarks/results/latent_fused_drift.json.
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


def main(n_samples=200, b=40, t_steps=1000):
    import benchmarks.convergence_campaign as camp
    from slide_tpu.configs import latent_ddpm_config, autoencoder_config
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.models.fused_denoiser import make_fused_net_fn
    from slide_tpu.train import build_autoencoder
    from slide_tpu.train.ema import select_eval_params_from_ckpt
    from slide_tpu.diffusion.x0 import X0Schedule
    from slide_tpu.diffusion.latent import latent_denoise_and_reconstruct
    from slide_tpu.eval.metrics import compute_all_metrics

    lat_ck, lat_path = camp._latest_ckpt(os.path.join(camp.EXPS, "lat"))
    ae_ck, ae_path = camp._latest_ckpt(os.path.join(camp.EXPS, "ae"))
    print("lat:", lat_path, "| ae:", ae_path, flush=True)

    lat_cfg = latent_ddpm_config(camp.CATEGORIES[0])
    lat_cfg["standard_diffusion_config"]["num_diffusion_timesteps"] = t_steps
    lat_rates = tuple(lat_cfg["train_config"].get("ema_rate") or ())
    lat_params, lat_sel = select_eval_params_from_ckpt(lat_ck, lat_rates)
    print("lat eval params:", lat_sel, flush=True)
    ae_params = ae_ck["model_state_dict"]

    lat_net = ConditionalPointNet2(lat_cfg["pointnet_config"])
    sched = X0Schedule.from_config(lat_cfg["standard_diffusion_config"])
    ae = build_autoencoder(
        autoencoder_config(camp.CATEGORIES[0])["pointnet_config"])
    feat_dim = lat_cfg["pointnet_config"]["in_fea_dim"]

    test_pts, _test_nrm, test_lbl = camp._test_clouds(n_samples)
    from slide_tpu.ops import sample_keypoints
    ref_kp = np.asarray(sample_keypoints(jnp.asarray(test_pts), 16,
                                         add_centroid=True)[0])
    gen_lbl = test_lbl.copy()

    def decode_fn(kp, feat, lbl, kk):
        return ae.apply({"params": ae_params}, kp, feat, label=lbl,
                        method=ae.decode, rngs={"fps": kk})

    fused = make_fused_net_fn(lat_cfg["pointnet_config"], lat_params, 16,
                              block_b=40)
    print("fused latent net available:", fused is not None, flush=True)

    def make_chain(use_fused: bool):
        def chain(k, kp, lbl):
            def lat_net_fn(x, ts):
                if use_fused:
                    return fused(x, ts, lbl)
                return lat_net.apply({"params": lat_params}, x, ts=ts,
                                     label=lbl)
            return latent_denoise_and_reconstruct(
                lat_net_fn, decode_fn, k, lbl.shape[0], 3,
                (16, 3 + feat_dim), sched, label=lbl, keypoint=kp)
        return jax.jit(chain)

    res = {"n_samples": n_samples, "batch": b, "t_steps": t_steps,
           "lat_ckpt": lat_path, "lat_eval_params": lat_sel,
           "fused_available": fused is not None}

    def gen(chain, tag):
        key = jax.random.key(977)
        out, walls = [], []
        for i in range(n_samples // b):
            key, ks = jax.random.split(key)
            kp_i = jnp.asarray(ref_kp[i * b:(i + 1) * b])
            lbl_i = jnp.asarray(gen_lbl[i * b:(i + 1) * b], jnp.int32)
            t0 = time.perf_counter()
            pts = jax.block_until_ready(chain(ks, kp_i, lbl_i)[0])
            walls.append(time.perf_counter() - t0)
            out.append(np.asarray(pts)[..., :3])
        # first batch pays the compile; report the post-compile median
        res[f"{tag}_chain_s"] = float(np.median(walls[1:]) if len(walls) > 1
                                      else walls[0])
        print(f"{tag}: {res[f'{tag}_chain_s']:.3f} s/chain-of-{b}", flush=True)
        return np.concatenate(out)

    flax_out = gen(make_chain(False), "flax_f32")
    if fused is None:
        _finish(res)
        return
    fused_out = gen(make_chain(True), "fused")
    res["speedup_fused"] = res["flax_f32_chain_s"] / res["fused_chain_s"]

    def metrics(a, bb, tag):
        m = compute_all_metrics(jnp.asarray(a), jnp.asarray(bb),
                                batch_size=25, with_emd=False)
        m = {k: float(v) for k, v in m.items()}
        res[tag] = m
        print(tag, {k: round(v, 4) for k, v in m.items()}, flush=True)

    # the drift row: fused-generated vs flax-generated (same keys/labels/kp)
    metrics(fused_out, flax_out, "fused_vs_flax")
    # anchors: each set against the held-out reference clouds
    metrics(flax_out, test_pts, "flax_vs_ref")
    metrics(fused_out, test_pts, "fused_vs_ref")
    _finish(res)


def _finish(res):
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "latent_fused_drift.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
