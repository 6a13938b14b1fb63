"""Diagnose — and test a protocol-level fix for — the degenerate 1-NNA t/f
split in the cloud-level suite.

The round-5 campaign's cloud_level block reports 1-NN-CD acc_t~0.05 /
acc_f~1.0 (acc 0.52): nearly every REFERENCE cloud's nearest neighbour is a
generated cloud, and nearly every generated cloud's nearest neighbour is
another generated cloud.  The ae_recon diagnostic shows the same split even
for reconstructions of the test clouds themselves, so the signature cannot
be a property of the generative chain alone.

Hypothesis: AE-decoded clouds carry a *uniformity* signature — the decoder
FPS-trims its upsampled splits (reference point_upsample_decoder.py:149-182),
spreading points evenly — which systematically LOWERS chamfer distances both
among decoded clouds and from any cloud to a decoded cloud, while raw
references are random 2048-subsamples whose sampling noise inflates ref-ref
distances.  Under a 1-NN classifier, a set with a uniformly-smaller distance
scale absorbs every nearest-neighbour edge.

Arms (CD family only; A, B = disjoint stratified halves of the test split):
  raw_vs_raw    1-NNA(A_rand2048,  B_rand2048)  sanity: must be ~balanced
  fps_vs_fps    1-NNA(A_fps2048,   B_fps2048)   sanity: FPS subsampling alone
                                                must stay ~balanced
  recon_vs_raw  1-NNA(recon(A),    B_rand2048)  reproduces the campaign
                                                signature with ZERO generative
                                                modelling (diagnosis)
  recon_vs_fps  1-NNA(recon(A),    B_fps2048)   the PROTOCOL FIX on the
                                                control: matching ref
                                                uniformity should rebalance
  gen_vs_raw    1-NNA(generate(),  B_rand2048)  campaign protocol at small n
  gen_vs_fps    1-NNA(generate(),  B_fps2048)   the headline-relevant number
                                                under the uniformity-matched
                                                protocol
plus nearest-neighbour CD scales within/between every set — the mechanism
quantified directly.

The FPS-matched protocol is fair: both sides are 2048-point uniform covers
of their surfaces (the reference's own eval subsamples both sides the same
way; ours differ only because the decoder trims by FPS while refs were
random subsets — reference evaluation_metrics.py:129-157 never mixes
subsample styles).

OUTCOME (n=120/side, trained r5 ckpts, chip — the committed JSON): the
uniformity hypothesis is only PART of the story.  Sanity arms balanced
(raw 0.55/0.53, fps 0.53/0.52); FPS-matching the refs moves acc_t
0.17->0.28 (gen) and 0.04->0.10 (recon) but acc_f stays ~0.99-1.0 in all
arms.  The nn_scale block isolates the residual: decoded/generated sets
are mutually contracted (within-set NN-CD 0.00198 recon / 0.00223 gen)
well below even FPS-matched raw covers (0.00341) — sampling noise removed
— so the remaining asymmetry is an AE-bottleneck DIVERSITY contraction
(16-keypoint latent smooths shape variety), present identically with zero
generative modelling; the diffusion chain adds almost nothing on top
(gen_gen 0.00223 vs recon_recon 0.00198; cross scales symmetric ~0.0031).
The lever is AE capacity/training, not the samplers or the metric code.

Writes benchmarks/results/probe_nna_asymmetry.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def nn_scale(dmat, rows_self=False):
    """Mean nearest-neighbour distance along rows (exclude diagonal when the
    matrix is a self-comparison)."""
    d = np.asarray(dmat, np.float64).copy()
    if rows_self:
        np.fill_diagonal(d, np.inf)
    return float(d.min(axis=1).mean())


def main(n_half=120, seed=7, t_steps=1000):
    import jax
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # sitecustomize preloads jax for the tunnel; the env var alone is
        # too late (CLAUDE.md) — force the platform through the config too
        jax.config.update("jax_platforms", "cpu")
    else:
        from benchmarks.chip_lock import acquire_chip_lock
        acquire_chip_lock()
    import jax.numpy as jnp

    import benchmarks.convergence_campaign as camp
    from slide_tpu.configs import (autoencoder_config, keypoint_ddpm_config,
                                   latent_ddpm_config)
    from slide_tpu.diffusion import (calc_diffusion_hyperparams,
                                     diffusion_sampling)
    from slide_tpu.diffusion.latent import latent_denoise_and_reconstruct
    from slide_tpu.diffusion.x0 import X0Schedule
    from slide_tpu.eval.metrics import compute_all_metrics, pairwise_emd_cd
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.ops import sample_keypoints
    from slide_tpu.train import build_autoencoder
    from slide_tpu.train.ema import select_eval_params_from_ckpt

    # full-density test clouds (3000 pts as stored), stratified A/B halves
    pts3k, nrm3k, lbl = camp._test_clouds(2 * n_half, npoints=3000)
    ia, ib = [], []
    for c in np.unique(lbl):
        rows = np.flatnonzero(lbl == c)
        ia.extend(rows[: len(rows) // 2])
        ib.extend(rows[len(rows) // 2:])
    ia, ib = np.asarray(ia[:n_half]), np.asarray(ib[:n_half])

    rng = np.random.default_rng(seed)

    def rand2048(full, paired=None):
        sel = np.stack([rng.choice(full.shape[1], 2048, replace=False)
                        for _ in range(full.shape[0])])
        out = np.take_along_axis(full, sel[..., None], axis=1)
        if paired is None:
            return out
        return out, np.take_along_axis(paired, sel[..., None], axis=1)

    A3k, A_lbl = pts3k[ia], lbl[ia]
    B3k, B_lbl = pts3k[ib], lbl[ib]
    # one index draw per cloud, shared by points and normals (the AE encode
    # consumes per-point (xyz, normal) pairs)
    A_pts, A_nrm = rand2048(A3k, nrm3k[ia])
    B_pts = rand2048(B3k)

    report = {"n_half": n_half, "t_steps": t_steps}

    def suite(sample, ref, tag):
        t0 = time.time()
        m = compute_all_metrics(jnp.asarray(sample), jnp.asarray(ref),
                                batch_size=25, with_emd=False)
        m = {k: float(v) for k, v in m.items()}
        m["wall_s"] = round(time.time() - t0, 1)
        print(tag, {k: round(v, 4) for k, v in m.items()}, flush=True)
        report[tag] = m

    key = jax.random.key(seed)
    report["backend"] = jax.default_backend()

    # FPS 3000 -> 2048 uniform covers (random start; actual surface points)
    key, kf1, kf2 = jax.random.split(key, 3)
    A_fps = np.asarray(sample_keypoints(jnp.asarray(A3k), 2048,
                                        add_centroid=False, key=kf1)[0])
    B_fps = np.asarray(sample_keypoints(jnp.asarray(B3k), 2048,
                                        add_centroid=False, key=kf2)[0])

    # 1. sanity arms
    suite(A_pts, B_pts, "raw_vs_raw")
    suite(A_fps, B_fps, "fps_vs_fps")

    # 2. AE round-trip of A (disjoint from B)
    ae_ck, ae_path = camp._latest_ckpt(os.path.join(camp.EXPS, "ae"))
    report["ae_ckpt"] = ae_path
    ae_cfg = autoencoder_config(camp.CATEGORIES[0])
    ae = build_autoencoder(ae_cfg["pointnet_config"])
    ae_params = ae_ck["model_state_dict"]
    kp = sample_keypoints(jnp.asarray(A_pts), 16, add_centroid=True)[0]

    def enc_dec(x, kpts, lab, k1, k2):
        z = ae.apply({"params": ae_params}, x, kpts, label=lab,
                     method=ae.encode, rngs={"gaussian": k1})
        return ae.apply({"params": ae_params}, kpts, z, label=lab,
                        method=ae.decode, rngs={"fps": k2})

    enc_dec = jax.jit(enc_dec)
    recon = []
    b = 40 if n_half % 40 == 0 else min(25, n_half)
    for i in range(0, n_half, b):
        sl = slice(i, min(i + b, n_half))
        key, k1, k2 = jax.random.split(key, 3)
        x6 = jnp.concatenate([jnp.asarray(A_pts[sl]),
                              jnp.asarray(A_nrm[sl])], axis=-1)
        out = enc_dec(x6, kp[sl], jnp.asarray(A_lbl[sl], jnp.int32), k1, k2)
        recon.append(np.asarray(out)[..., :3])
    recon = np.concatenate(recon)
    suite(recon, B_pts, "recon_vs_raw")
    suite(recon, B_fps, "recon_vs_fps")

    # 3. full generation (kp DDPM -> latent DDPM -> decode), labels = B's
    try:
        kp_ck, kp_path = camp._latest_ckpt(os.path.join(camp.EXPS, "kp"))
        lat_ck, lat_path = camp._latest_ckpt(os.path.join(camp.EXPS, "lat"))
    except FileNotFoundError as e:
        print("skipping generation arms:", e)
        kp_ck = lat_ck = None
    gen = None
    if kp_ck is not None:
        report["kp_ckpt"], report["lat_ckpt"] = kp_path, lat_path
        kp_cfg = keypoint_ddpm_config(camp.CATEGORIES[0])
        kp_cfg["diffusion_config"]["T"] = t_steps
        kp_rates = tuple(kp_cfg["train_config"].get("ema_rate") or ())
        kp_params, kp_sel = select_eval_params_from_ckpt(kp_ck, kp_rates)
        kp_net = ConditionalPointNet2(kp_cfg["pointnet_config"])
        kp_sched = calc_diffusion_hyperparams(t_steps, 1e-4, 0.02)
        fused = None
        if jax.default_backend() not in ("cpu",):
            from slide_tpu.models.fused_denoiser import make_fused_net_fn
            fused = make_fused_net_fn(kp_cfg["pointnet_config"], kp_params, 16)

        def kp_net_fn(x, ts, lab):
            if fused is not None and fused.batch_ok(x.shape[0]):
                return fused(x, ts, lab)
            return kp_net.apply({"params": kp_params}, x, ts=ts, label=lab)

        lat_cfg = latent_ddpm_config(camp.CATEGORIES[0])
        lat_cfg["standard_diffusion_config"]["num_diffusion_timesteps"] = t_steps
        lat_rates = tuple(lat_cfg["train_config"].get("ema_rate") or ())
        lat_params, lat_sel = select_eval_params_from_ckpt(lat_ck, lat_rates)
        lat_net = ConditionalPointNet2(lat_cfg["pointnet_config"])
        lat_sched = X0Schedule.from_config(lat_cfg["standard_diffusion_config"])
        feat_dim = lat_cfg["pointnet_config"]["in_fea_dim"]
        report["kp_eval_params"], report["lat_eval_params"] = kp_sel, lat_sel

        def decode_fn(kpts, feat, lab, kk):
            return ae.apply({"params": ae_params}, kpts, feat, label=lab,
                            method=ae.decode, rngs={"fps": kk})

        sample_kp = jax.jit(lambda k, lab: diffusion_sampling(
            lambda x, ts: kp_net_fn(x, ts, lab), k, (b, 16, 3), kp_sched))

        def chain(k, kpts, lab):
            def lat_net_fn(x, ts):
                return lat_net.apply({"params": lat_params}, x, ts=ts,
                                     label=lab)
            return latent_denoise_and_reconstruct(
                lat_net_fn, decode_fn, k, lab.shape[0], 3,
                (16, 3 + feat_dim), lat_sched, label=lab, keypoint=kpts)

        chain = jax.jit(chain)
        gen = []
        t0 = time.time()
        for i in range(0, n_half, b):
            sl = slice(i, min(i + b, n_half))
            lab = jnp.asarray(B_lbl[sl], jnp.int32)
            key, k1, k2 = jax.random.split(key, 3)
            kps = sample_kp(k1, lab)
            pts_i, _k, _f = chain(k2, kps, lab)
            gen.append(np.asarray(pts_i)[..., :3])
        gen = np.concatenate(gen)
        print(f"generated {len(gen)} clouds in {time.time()-t0:.0f}s",
              flush=True)
        suite(gen, B_pts, "gen_vs_raw")
        suite(gen, B_fps, "gen_vs_fps")

    # 4. distance scales (CD family only)
    def pd(a, c):
        return pairwise_emd_cd(jnp.asarray(a), jnp.asarray(c),
                               batch_size=25, with_emd=False)[0]

    scales = {
        "raw_raw": nn_scale(pd(B_pts, B_pts), rows_self=True),
        "fps_fps": nn_scale(pd(B_fps, B_fps), rows_self=True),
        "recon_recon": nn_scale(pd(recon, recon), rows_self=True),
        "recon_to_raw": nn_scale(pd(recon, B_pts)),
        "raw_to_recon": nn_scale(np.asarray(pd(recon, B_pts)).T),
        "recon_to_fps": nn_scale(pd(recon, B_fps)),
        "fps_to_recon": nn_scale(np.asarray(pd(recon, B_fps)).T),
    }
    if gen is not None:
        scales["gen_gen"] = nn_scale(pd(gen, gen), rows_self=True)
        scales["gen_to_fps"] = nn_scale(pd(gen, B_fps))
        scales["fps_to_gen"] = nn_scale(np.asarray(pd(gen, B_fps)).T)
    report["nn_scale"] = scales
    print("nn_scale:", {k: round(v, 5) for k, v in scales.items()})

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "probe_nna_asymmetry.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("->", out)


if __name__ == "__main__":
    main(n_half=int(sys.argv[1]) if len(sys.argv) > 1 else 120)
