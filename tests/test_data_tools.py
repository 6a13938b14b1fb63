"""Dataset helper tool tests."""

import numpy as np
import pytest

from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.data.shapenet_psr import ShapesPSRDataset
from slide_tpu.data.tools import (save_reference_data, dataset_throughput,
                                  count_samples)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = tmp_path_factory.mktemp("shapenet_tools")
    return write_synthetic_shapenet_psr(str(r), categories=("02691156",),
                                        models_per_split=5, num_points=400)


def test_save_reference_data(root, tmp_path):
    out = save_reference_data(root, str(tmp_path / "val.npz"), split="val",
                              categories=["02691156"], npoints=64)
    with np.load(out) as d:
        assert d["points"].shape == (5, 64, 3)
        assert d["normals"].shape == (5, 64, 3)
        assert (d["label"] == 0).all()
        assert d["category"][0] == "02691156"


def test_dataset_throughput(root):
    ds = ShapesPSRDataset(root, split="train", categories=["02691156"],
                          num_gt_points=64, centered_to_centroid=False, seed=0)
    stats = dataset_throughput(ds, batch_size=2, n_batches=2)
    assert stats["samples"] == 4
    assert stats["samples_per_sec"] > 0


def test_count_samples(root):
    counts = count_samples(root, ["02691156"])
    assert counts["02691156"]["train"] == 5
    assert counts["02691156"]["total"] == 15
