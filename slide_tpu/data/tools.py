"""Dataset helper tools — reference `shapenet_psr_dataloader/
{save_reference_data.py, keep_read_data.py, count_number_of_samples.py}`."""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

from slide_tpu.data.loader import BatchLoader
from slide_tpu.data.shapenet_psr import ShapesPSRDataset, load_metadata


def save_reference_data(data_dir: str, out_npz: str, split: str = "val",
                        categories: Optional[Sequence[str]] = None,
                        npoints: int = 2048, scale: float = 1,
                        num_samples: Optional[int] = None, seed: int = 0):
    """Export a dataset split as a reference-format npz
    (points/normals/label/category/category_name) — the validation sets the
    eval CLIs consume (`save_reference_data.py`)."""
    ds = ShapesPSRDataset(data_dir, split=split, categories=categories,
                          scale=scale, num_gt_points=npoints,
                          centered_to_centroid=False, seed=seed,
                          random_subsample=num_samples is not None,
                          num_samples=num_samples or 0)
    acc = {"points": [], "normals": [], "label": [], "category": [],
           "category_name": []}
    for i in range(len(ds)):
        d = ds[i]
        for k in acc:
            acc[k].append(d[k])
    np.savez(out_npz,
             points=np.stack(acc["points"]),
             normals=np.stack(acc["normals"]),
             label=np.asarray(acc["label"]),
             category=np.asarray(acc["category"]),
             category_name=np.asarray(acc["category_name"]))
    return out_npz


def dataset_throughput(dataset, batch_size: int = 32, n_batches: int = 10,
                       seed: int = 0) -> dict:
    """Dataloader throughput probe (`keep_read_data.py`)."""
    loader = BatchLoader(dataset, batch_size, shuffle=True, seed=seed)
    t0 = time.perf_counter()
    n = 0
    for i, batch in enumerate(loader):
        n += len(batch["label"])
        if i + 1 >= n_batches:
            break
    dt = time.perf_counter() - t0
    return {"samples": n, "seconds": dt, "samples_per_sec": n / dt}


def count_samples(data_dir: str, categories: Optional[Sequence[str]] = None) -> dict:
    """Per-category per-split model counts (`count_number_of_samples.py`)."""
    import os
    metadata = load_metadata(data_dir)
    categories = list(categories) if categories else sorted(metadata.keys())
    out = {}
    for c in categories:
        counts = {}
        for split in ("train", "val", "test"):
            path = os.path.join(data_dir, c, split + ".lst")
            if os.path.isfile(path):
                with open(path) as f:
                    counts[split] = len([m for m in f.read().split("\n") if m])
            else:
                counts[split] = 0
        counts["total"] = sum(counts.values())
        out[c] = counts
    return out
