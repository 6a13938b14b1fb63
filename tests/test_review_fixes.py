"""Regression tests for the data/cli/vis review findings: loader error
propagation + thread cleanup, npz split key-order independence, dummy-dataset
rank clamping, per-point plot colors, and multi-rank generate + gather."""

import os
import threading
import time

import numpy as np
import pytest

from slide_tpu.data import BatchLoader, GeneralNpzDataset, DummyShapesDataset
from slide_tpu.data.dummy import DummyLabelDataset


class _FailingDataset:
    def __init__(self, n, fail_at):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i == self.fail_at:
            raise RuntimeError(f"corrupt item {i}")
        return {"x": np.full((4,), i, np.float32)}


def test_loader_propagates_dataset_errors():
    loader = BatchLoader(_FailingDataset(20, fail_at=7), batch_size=2,
                         shuffle=False)
    seen = 0
    with pytest.raises(RuntimeError, match="corrupt item 7"):
        for _ in loader:
            seen += 1
    assert seen == 3  # batches before the failure still arrive


def test_loader_releases_producer_on_break():
    before = threading.active_count()
    loader = BatchLoader(_FailingDataset(100, fail_at=-1), batch_size=2,
                         shuffle=False, prefetch=2)
    for _ in loader:
        break  # abandon mid-epoch (data/tools.py throughput probe pattern)
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_npz_split_independent_of_key_order(tmp_path):
    pts = np.random.rand(3, 8, 3).astype(np.float32)
    nrm = np.random.rand(3, 8, 3).astype(np.float32)
    lbl = np.zeros(3, np.int64)
    # normals stored BEFORE points: the split of points(…,3) must neither
    # overwrite the real normals nor fabricate a zero-width slice
    f = str(tmp_path / "a.npz")
    np.savez(f, normals=nrm, points=pts, label=lbl)
    ds = GeneralNpzDataset(f, scale=1, noise_magnitude=0, data_key="points",
                           data_key_split_names=["points", "normals"],
                           data_key_split_dims=[0, 3, 6])
    item = ds[0]
    np.testing.assert_array_equal(item["points"], pts[0])
    np.testing.assert_array_equal(item["normals"], nrm[0])
    # fused layout still splits
    f2 = str(tmp_path / "b.npz")
    np.savez(f2, points=np.concatenate([pts, nrm], axis=-1), label=lbl)
    ds2 = GeneralNpzDataset(f2, scale=1, noise_magnitude=0, data_key="points",
                            data_key_split_names=["points", "normals"],
                            data_key_split_dims=[0, 3, 6])
    item2 = ds2[0]
    np.testing.assert_array_equal(item2["points"], pts[0])
    np.testing.assert_array_equal(item2["normals"], nrm[0])


def test_dummy_datasets_clamp_last_rank(tmp_path):
    from slide_tpu.data import write_synthetic_shapenet_psr
    root = write_synthetic_shapenet_psr(str(tmp_path / "ds"),
                                        categories=("02691156",),
                                        models_per_split=2, num_points=16)
    ds = DummyShapesDataset(root, num_samples=5, rank=3, world_size=4, seed=0)
    assert len(ds) == 0  # 5 - 3*ceil(5/4) would be -1
    assert len(DummyLabelDataset(5, rank=3, world_size=4)) == 0
    # totals across ranks are preserved for a normal split
    total = sum(len(DummyShapesDataset(root, 10, rank=r, world_size=3, seed=0))
                for r in range(3))
    assert total == 10


def test_plot_pcd_accepts_color_array(tmp_path):
    from slide_tpu.vis.plot import plot_pcd
    pts = np.random.rand(32, 3).astype(np.float32)
    out = plot_pcd(pts, str(tmp_path / "c.png"),
                   color=np.random.rand(32))
    assert os.path.exists(out)


def test_gather_cli_merges_rank_shards(tmp_path):
    from slide_tpu.cli import main as cli_main
    for r in range(2):
        np.savez(tmp_path / f"shapenet_psr_generated_data_64_pts_rank_{r}.npz",
                 points=np.full((3, 64, 3), r, np.float32),
                 label=np.full((3,), r, np.int64))
    cli_main(["gather", "--save_dir", str(tmp_path), "--world_size", "2",
              "--num_points", "64"])
    merged = tmp_path / "shapenet_psr_generated_data_64_pts.npz"
    with np.load(merged) as d:
        assert d["points"].shape == (6, 64, 3)
        assert list(d["label"]) == [0, 0, 0, 1, 1, 1]
    assert not (tmp_path / "shapenet_psr_generated_data_64_pts_rank_0.npz").exists()


def test_synthetic_psr_from_points(tmp_path):
    """psr_from_points writes a real DPSR indicator grid (inside/outside sign
    structure) instead of uniform noise; shape_variety varies the ellipsoid."""
    from slide_tpu.data import write_synthetic_shapenet_psr
    root = write_synthetic_shapenet_psr(
        str(tmp_path / "ds"), categories=("02691156",), models_per_split=1,
        num_points=2000, psr_res=32, shape_variety=True, psr_from_points=True)
    with np.load(f"{root}/02691156/train_model_0/psr.npz") as d:
        psr = d["psr"]
    assert psr.shape == (32, 32, 32)
    assert np.isfinite(psr).all()
    center = psr[16, 16, 16]
    corner = psr[1, 1, 1]
    # indicator: opposite signs inside vs outside the closed surface
    assert center * corner < 0
    # two models differ under shape_variety
    root2 = write_synthetic_shapenet_psr(
        str(tmp_path / "ds2"), categories=("02691156",), models_per_split=2,
        num_points=500, psr_res=16, shape_variety=True, psr_from_points=False)
    a = np.load(f"{root2}/02691156/train_model_0/pointcloud.npz")["points"]
    b = np.load(f"{root2}/02691156/train_model_1/pointcloud.npz")["points"]
    assert abs(np.abs(a).max(axis=0) - np.abs(b).max(axis=0)).max() > 0.01
