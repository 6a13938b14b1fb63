"""Synthetic ShapeNet-PSR fixture: writes a tiny dataset tree in the real
on-disk layout so every entry point runs end-to-end without the actual data
(SURVEY.md §4 test strategy item b)."""

from __future__ import annotations

import os

import numpy as np
import yaml

# the 13 ShapeNet-PSR synsets (metadata.yaml), so label indices match
ALL_SYNSETS = {
    "02691156": "airplane,aeroplane,plane",
    "02828884": "bench",
    "02933112": "cabinet",
    "02958343": "car,auto,automobile,machine,motorcar",
    "03001627": "chair",
    "03211117": "display,video display",
    "03636649": "lamp",
    "03691459": "loudspeaker,speaker,speaker unit,loudspeaker system,speaker system",
    "04090263": "rifle",
    "04256520": "sofa,couch,lounge",
    "04379243": "table",
    "04401088": "telephone,phone,telephone set",
    "04530566": "vessel,watercraft",
}


# Category-dependent ellipsoid semi-axis ranges ((lo, hi) per axis) for the
# 5 reference-trained categories (README.md:86-135).  Under shape_variety the
# per-category distributions are clearly separable (airplane: long+flat,
# cabinet: boxy, car: long+low, chair: squat+tall, lamp: thin+tall), so the
# 13-way class embedding does real conditioning work and per-category metric
# blocks are meaningful.  Categories not listed fall back to the generic
# isotropic range.
CATEGORY_AXIS_RANGES = {
    "02691156": ((0.40, 0.48), (0.28, 0.38), (0.08, 0.14)),   # airplane
    "02933112": ((0.32, 0.42), (0.32, 0.42), (0.36, 0.46)),   # cabinet
    "02958343": ((0.40, 0.48), (0.18, 0.26), (0.10, 0.16)),   # car
    "03001627": ((0.20, 0.28), (0.20, 0.28), (0.40, 0.48)),   # chair
    "03636649": ((0.07, 0.13), (0.07, 0.13), (0.42, 0.50)),   # lamp
}
_GENERIC_AXIS_RANGE = ((0.25, 0.45),) * 3


def write_synthetic_shapenet_psr(root: str, categories=("02691156",),
                                 models_per_split: int = 4,
                                 num_points: int = 3000, psr_res: int = 16,
                                 seed: int = 0, with_psr: bool = True,
                                 shape_variety: bool = False,
                                 psr_from_points: bool = False):
    """Write metadata.yaml, .lst splits, and random pointcloud.npz/psr.npz
    files.  Returns the root path.

    shape_variety: sample a random ellipsoid per model (semi-axes in
      [0.25, 0.45]) instead of the fixed radius-0.4 sphere, giving the
      generative models a non-trivial but learnable distribution.
    psr_from_points: compute the psr.npz grid from the model's own
      points+normals with the DPSR operator (like the real dataset's
      precomputed Poisson grids) instead of uniform noise — required for
      meaningful SAP-upsampler training, whose loss targets this grid.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    metadata = {c: {"id": c, "name": ALL_SYNSETS.get(c, c)} for c in ALL_SYNSETS}
    with open(os.path.join(root, "metadata.yaml"), "w") as f:
        yaml.safe_dump(metadata, f)
    dpsr = None
    if with_psr and psr_from_points:
        import jax
        from slide_tpu.sap import DPSR
        # jit: the spectral solve must compile as one program (eager FFT ops
        # are not individually supported on all TPU runtimes)
        dpsr = jax.jit(DPSR((psr_res,) * 3, sig=2))
    for c in categories:
        cdir = os.path.join(root, c)
        os.makedirs(cdir, exist_ok=True)
        for split in ("train", "val", "test"):
            names = [f"{split}_model_{i}" for i in range(models_per_split)]
            with open(os.path.join(cdir, split + ".lst"), "w") as f:
                f.write("\n".join(names) + "\n")
            for name in names:
                mdir = os.path.join(cdir, name)
                os.makedirs(mdir, exist_ok=True)
                # a noisy sphere/ellipsoid cloud in ~[-0.5, 0.5] with normals
                d = rng.standard_normal((num_points, 3)).astype(np.float32)
                n = d / np.linalg.norm(d, axis=1, keepdims=True)
                if shape_variety:
                    rng_lohi = CATEGORY_AXIS_RANGES.get(c, _GENERIC_AXIS_RANGE)
                    axes = np.array([rng.uniform(lo, hi)
                                     for lo, hi in rng_lohi], np.float32)
                else:
                    axes = np.full(3, 0.4, np.float32)
                pts = axes * n + 0.02 * rng.standard_normal(
                    (num_points, 3)).astype(np.float32)
                # ellipsoid surface normal ∝ gradient of Σ (x_i/a_i)^2
                nrm = n / axes if shape_variety else n
                nrm = nrm / np.linalg.norm(nrm, axis=1, keepdims=True)
                np.savez(os.path.join(mdir, "pointcloud.npz"),
                         points=pts.astype(np.float32),
                         normals=nrm.astype(np.float32))
                if with_psr:
                    if dpsr is not None:
                        import jax.numpy as jnp
                        # match the SAP training-path mapping into DPSR's
                        # [0,1) cube (sap/refine.py: raw/1.2 + 0.5)
                        g = np.clip(np.asarray(pts, np.float32) / 1.2 + 0.5,
                                    0.0, 0.99)
                        psr = np.asarray(dpsr(jnp.asarray(g[None]),
                                              jnp.asarray(nrm[None]))[0])
                    else:
                        psr = rng.uniform(-1, 1, (psr_res,) * 3)
                    np.savez(os.path.join(mdir, "psr.npz"),
                             psr=psr.astype(np.float32))
    return root
