"""Category-distinct synthetic corpus (`data/synthetic.py`).

The round-4 campaign trains/evals the reference's 5 trained categories
(reference README.md:86-135) on synthetic data; per-category metric blocks
are only meaningful if the per-category shape distributions actually differ
and the label indices match metadata.yaml's 13-synset order.  These tests
pin both properties.
"""

import os

import numpy as np
import yaml

from slide_tpu.data.synthetic import (ALL_SYNSETS, CATEGORY_AXIS_RANGES,
                                      write_synthetic_shapenet_psr)

FIVE = ("02691156", "02933112", "02958343", "03001627", "03636649")


def _extents(root, cat):
    """Mean per-axis half-extent over a category's train models."""
    cdir = os.path.join(root, cat)
    names = open(os.path.join(cdir, "train.lst")).read().split()
    ext = []
    for n in names:
        pts = np.load(os.path.join(cdir, n, "pointcloud.npz"))["points"]
        ext.append((pts.max(0) - pts.min(0)) / 2)
    return np.mean(ext, axis=0)


def test_five_category_corpus_layout_and_metadata(tmp_path):
    root = write_synthetic_shapenet_psr(
        str(tmp_path), categories=FIVE, models_per_split=2, num_points=512,
        psr_res=8, shape_variety=True)
    meta = yaml.safe_load(open(os.path.join(root, "metadata.yaml")))
    # all 13 synsets present so label indices match the real metadata.yaml
    assert set(meta) == set(ALL_SYNSETS)
    for c in FIVE:
        for split in ("train", "val", "test"):
            assert os.path.exists(os.path.join(root, c, split + ".lst"))


def test_category_distributions_are_separable(tmp_path):
    root = write_synthetic_shapenet_psr(
        str(tmp_path), categories=FIVE, models_per_split=6, num_points=1024,
        psr_res=8, with_psr=False, shape_variety=True, seed=3)
    ext = {c: _extents(root, c) for c in FIVE}
    # airplane: flat (z much smaller than x); the noise floor is 0.02*3σ
    assert ext["02691156"][2] < 0.6 * ext["02691156"][0]
    # cabinet: boxy — all axes within 40% of each other
    assert ext["02933112"].max() < 1.4 * ext["02933112"].min()
    # car: long and low
    assert ext["02958343"][0] > 1.5 * ext["02958343"][2] * 0.9
    assert ext["02958343"][2] < ext["02958343"][0]
    # chair / lamp: tall (z dominates x)
    assert ext["03001627"][2] > ext["03001627"][0]
    assert ext["03636649"][2] > 2.0 * ext["03636649"][0]
    # sampled extents live inside the declared ranges (+ noise margin)
    for c in FIVE:
        hi = np.array([h for _, h in CATEGORY_AXIS_RANGES[c]])
        assert np.all(ext[c] < hi + 0.12)


def test_unlisted_category_uses_generic_range(tmp_path):
    root = write_synthetic_shapenet_psr(
        str(tmp_path), categories=("04379243",), models_per_split=4,
        num_points=512, psr_res=8, with_psr=False, shape_variety=True)
    e = _extents(root, "04379243")
    assert np.all(e > 0.15) and np.all(e < 0.60)
