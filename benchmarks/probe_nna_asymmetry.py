"""Diagnose the degenerate 1-NNA t/f split in the cloud-level suite.

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
references are random 2048-subsamples of 100k-point clouds whose sampling
noise inflates ref-ref distances.  Under a 1-NN classifier, a set with a
uniformly-smaller distance scale absorbs every nearest-neighbour edge.

Probe (no generation involved — isolates the decode signature):
  A, B = disjoint halves of the held-out test split (same category mix)
  1. 1-NNA(A, B)        -> sanity: raw-vs-raw must be balanced (~0.5/0.5)
  2. 1-NNA(recon(A), B) -> AE round-trips of clouds DISJOINT from B; a
                           degenerate t/f split here reproduces the
                           campaign signature with zero generative modelling
  3. nearest-neighbour CD scale within raw (B-B), within recons, and
     across — quantifies the asymmetry directly.

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


def main(n_half=100, seed=7):
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
    from slide_tpu.configs import autoencoder_config
    from slide_tpu.eval.metrics import compute_all_metrics, pairwise_emd_cd
    from slide_tpu.ops import sample_keypoints
    from slide_tpu.train import build_autoencoder

    pts, nrm, lbl = camp._test_clouds(2 * n_half)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(pts))
    ia, ib = perm[:n_half], perm[n_half:2 * n_half]
    A_pts, A_nrm, A_lbl = pts[ia], nrm[ia], lbl[ia]
    B_pts = pts[ib]

    report = {"n_half": n_half, "backend": jax.default_backend()}

    def suite(sample, ref, tag):
        t0 = time.time()
        m = compute_all_metrics(jnp.asarray(sample), jnp.asarray(ref),
                                batch_size=25, with_emd=False)
        m = {k: float(v) for k, v in m.items()}
        m["wall_s"] = round(time.time() - t0, 1)
        print(tag, {k: round(v, 4) for k, v in m.items()})
        report[tag] = m

    # 1. raw-vs-raw sanity
    suite(A_pts, B_pts, "raw_vs_raw")

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
    key = jax.random.key(seed)
    recon = []
    b = min(25, n_half)
    for i in range(0, n_half, b):
        sl = slice(i, min(i + b, n_half))
        key, k1, k2 = jax.random.split(key, 3)
        x6 = jnp.concatenate([jnp.asarray(A_pts[sl]),
                              jnp.asarray(A_nrm[sl])], axis=-1)
        out = enc_dec(x6, kp[sl], jnp.asarray(A_lbl[sl], jnp.int32), k1, k2)
        recon.append(np.asarray(out)[..., :3])
    recon = np.concatenate(recon)
    suite(recon, B_pts, "recon_vs_raw")

    # 3. distance scales (CD family only)
    d_bb, _ = pairwise_emd_cd(jnp.asarray(B_pts), jnp.asarray(B_pts),
                              batch_size=25, with_emd=False)
    d_rr, _ = pairwise_emd_cd(jnp.asarray(recon), jnp.asarray(recon),
                              batch_size=25, with_emd=False)
    d_rb, _ = pairwise_emd_cd(jnp.asarray(recon), jnp.asarray(B_pts),
                              batch_size=25, with_emd=False)
    report["nn_scale"] = {
        "raw_raw": nn_scale(d_bb, rows_self=True),
        "recon_recon": nn_scale(d_rr, rows_self=True),
        "recon_to_raw": nn_scale(d_rb),
        "raw_to_recon": nn_scale(np.asarray(d_rb).T),
    }
    print("nn_scale:", {k: round(v, 5) for k, v in report["nn_scale"].items()})

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "probe_nna_asymmetry.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("->", out)


if __name__ == "__main__":
    main(n_half=int(sys.argv[1]) if len(sys.argv) > 1 else 100)
