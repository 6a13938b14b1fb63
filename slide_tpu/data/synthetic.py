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


def write_synthetic_shapenet_psr(root: str, categories=("02691156",),
                                 models_per_split: int = 4,
                                 num_points: int = 3000, psr_res: int = 16,
                                 seed: int = 0, with_psr: bool = True):
    """Write metadata.yaml, .lst splits, and random pointcloud.npz/psr.npz
    files.  Returns the root path."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    metadata = {c: {"id": c, "name": ALL_SYNSETS.get(c, c)} for c in ALL_SYNSETS}
    with open(os.path.join(root, "metadata.yaml"), "w") as f:
        yaml.safe_dump(metadata, f)
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
                # a noisy sphere-ish cloud in ~[-0.5, 0.5] with unit normals
                d = rng.standard_normal((num_points, 3)).astype(np.float32)
                n = d / np.linalg.norm(d, axis=1, keepdims=True)
                pts = 0.4 * n + 0.02 * rng.standard_normal((num_points, 3)).astype(np.float32)
                np.savez(os.path.join(mdir, "pointcloud.npz"),
                         points=pts.astype(np.float32), normals=n.astype(np.float32))
                if with_psr:
                    psr = rng.uniform(-1, 1, (psr_res, psr_res, psr_res))
                    np.savez(os.path.join(mdir, "psr.npz"),
                             psr=psr.astype(np.float32))
    return root
