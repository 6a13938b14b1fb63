"""CPU probe: AE reconstruction quality of the campaign checkpoint.

Separates "the AE can't reconstruct" from "the latent samples are
off-manifold" (VERDICT r2 weak #4) without needing the chip: encode+decode
held-out test clouds through the latest campaign AE checkpoint and report the
mean Chamfer-p (plus per-axis std ratios).  The full metric suite runs on the
chip in the campaign eval; this is the cheap diagonal-only diagnostic.

Usage: python benchmarks/ae_recon_cpu_probe.py [n_samples]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from benchmarks.convergence_campaign import _latest_ckpt, _test_clouds, EXPS  # noqa: E402


def main(n=80, b=8):
    from slide_tpu.configs import autoencoder_config
    from slide_tpu.train import build_autoencoder
    from slide_tpu.ops import calc_cd, sample_keypoints

    ck, path = _latest_ckpt(os.path.join(EXPS, "ae"))
    print("AE ckpt:", path)
    ae_params = ck["model_state_dict"]
    cfg = autoencoder_config("airplane")
    ae = build_autoencoder(cfg["pointnet_config"])

    test_pts, test_nrm, _ = _test_clouds(n)
    kp = np.asarray(sample_keypoints(jnp.asarray(test_pts), 16,
                                     add_centroid=True)[0])

    @jax.jit
    def enc_dec(x6, kp, lbl, k1, k2):
        feat = ae.apply({"params": ae_params}, x6, kp, label=lbl,
                        method=ae.encode, rngs={"gaussian": k1})
        return ae.apply({"params": ae_params}, kp, feat, label=lbl,
                        method=ae.decode, rngs={"fps": k2})

    cd_fn = jax.jit(lambda a, bb: calc_cd(a, bb)["cd_p"])
    key = jax.random.key(0)
    cds, recs = [], []
    t0 = time.time()
    for i in range(n // b):
        sl = slice(i * b, (i + 1) * b)
        key, k1, k2 = jax.random.split(key, 3)
        x6 = jnp.concatenate([jnp.asarray(test_pts[sl]),
                              jnp.asarray(test_nrm[sl])], axis=-1)
        out = enc_dec(x6, jnp.asarray(kp[sl]),
                      jnp.zeros((b,), jnp.int32), k1, k2)[..., :3]
        recs.append(np.asarray(out))
        cds.append(np.asarray(cd_fn(out, jnp.asarray(test_pts[sl]))))
        print(f"batch {i}: mean cd_p {cds[-1].mean():.5f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    cds = np.concatenate(cds)
    recs = np.concatenate(recs)
    ref = test_pts[: recs.shape[0]]
    print(f"\nAE recon over {recs.shape[0]} test clouds:")
    print(f"  mean cd_p          {cds.mean():.5f}  (min {cds.min():.5f} "
          f"max {cds.max():.5f})")
    print(f"  recon per-axis std {recs.reshape(-1,3).std(axis=0)}")
    print(f"  ref   per-axis std {ref.reshape(-1,3).std(axis=0)}")
    # nearest-neighbor spacing comparison: clumped decodes recon fine on CD
    # but flag 1-NNA; compare mean nearest-neighbor distance inside clouds
    def mean_nn(x):
        x = jnp.asarray(x[:16])
        d = jnp.sum((x[:, :, None] - x[:, None]) ** 2, -1)
        d = d + jnp.eye(x.shape[1]) * 1e9
        return float(jnp.sqrt(d.min(-1)).mean())
    print(f"  mean 1-NN spacing: recon {mean_nn(recs):.5f} vs "
          f"ref {mean_nn(ref):.5f}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    main(n)
