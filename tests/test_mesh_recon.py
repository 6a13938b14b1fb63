"""Mesh reconstruction path tests: grid-L2 eval history/plot, full
reconstruction to PLY + sampled-points npz, PLY/xyz writers."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.configs import upsampler_config
from slide_tpu.data import write_synthetic_shapenet_psr, get_dataloader
from slide_tpu.eval import (sap_grid_eval, reconstruct_meshes,
                            merge_current_with_previous_eval_results, plot_result)
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.sap import DPSR
from slide_tpu.sap.mesh_sampling import (sample_points_from_mesh,
                                         uniform_sample_points_from_mesh)
from slide_tpu.vis import save_mesh_ply, save_pcd_ply, visualize_pcd


@pytest.fixture(scope="module")
def sap_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_psr_mr")
    write_synthetic_shapenet_psr(str(root), categories=("02691156",),
                                 models_per_split=4, num_points=800,
                                 psr_res=16)
    cfg = upsampler_config(batch_size=4)
    pc = cfg["pointnet_config"]
    pc["architecture"].update(npoint=[32, 16, 8], radius=[0.1, 0.2, 0.4],
                              nsample=[8, 8, 8], feature_dim=[8, 16, 16, 16],
                              decoder_feature_dim=[16, 16, 16, 16], mlp_depth=2)
    pc["t_dim"] = 32
    pc["point_upsample_factor"] = 2
    cfg["dpsr_config"].update(grid_res=16, psr_sigma=2)
    cfg["shapenet_psr_dataset_config"].update(
        npoints=64, num_workers=0, categories=["02691156"], data_dir=str(root),
        eval_batch_size=4, batch_size=4)
    net = ConditionalPointNet2(pc)
    variables = net.init(jax.random.key(0), jnp.zeros((1, 64, 3 + 4)),
                         ts=None, label=jnp.zeros((1,), jnp.int32))
    dpsr = DPSR((16, 16, 16), sig=2)
    return cfg, net, variables["params"], dpsr


def test_sap_grid_eval_and_history(sap_setup, tmp_path):
    cfg, net, params, dpsr = sap_setup
    loader = get_dataloader(cfg["shapenet_psr_dataset_config"], phase="val", seed=0)
    save_dir = str(tmp_path / "eval")
    loss1 = sap_grid_eval(net, params, dpsr, loader, cfg["pointnet_config"],
                          cfg["dpsr_config"], cfg["shapenet_psr_dataset_config"],
                          save_dir, iteration=10, epoch=1)
    loss2 = sap_grid_eval(net, params, dpsr, loader, cfg["pointnet_config"],
                          cfg["dpsr_config"], cfg["shapenet_psr_dataset_config"],
                          save_dir, iteration=20, epoch=2)
    assert np.isfinite(loss1) and np.isfinite(loss2)
    import pickle
    with open(os.path.join(save_dir, "shapenet_psr_dpsr_eval_result.pkl"), "rb") as f:
        hist = pickle.load(f)
    assert hist["iter"] == [10, 20]
    assert len(hist["dpsr_grid_L2_loss"]) == 2
    assert os.path.isfile(os.path.join(
        save_dir, "shapenet_psr_dpsr_eval_result_dpsr_grid_L2_loss.png"))


def test_reconstruct_meshes_end_to_end(sap_setup, tmp_path):
    cfg, net, params, dpsr = sap_setup
    loader = get_dataloader(cfg["shapenet_psr_dataset_config"], phase="val", seed=0)
    save_dir = str(tmp_path / "recon")
    vis_dir = reconstruct_meshes(
        net, params, dpsr, loader, cfg["pointnet_config"], cfg["dpsr_config"],
        cfg["shapenet_psr_dataset_config"], save_dir,
        do_sample_points_from_mesh=True, explicit_normalize=True,
        return_original_scale=True)
    meshes = os.listdir(os.path.join(vis_dir, "reconstructed_mesh"))
    assert len(meshes) >= 1
    assert all(m.endswith(".ply") for m in meshes)
    with np.load(os.path.join(vis_dir, "points_sampled_from_mesh.npz")) as d:
        assert d["points"].shape[1:] == (2048, 3)
        assert d["normals"].shape == d["points"].shape
        assert np.isfinite(d["points"]).all()
    with np.load(os.path.join(vis_dir, "uniform_points_sampled_from_mesh.npz")) as d:
        assert d["points"].shape[1:] == (2048, 3)
    # reconstruction in original scale: roughly within the input's bbox range
    with np.load(os.path.join(vis_dir, "points_sampled_from_mesh.npz")) as d:
        assert np.abs(d["points"]).max() < 3.0


def test_mesh_sampling_on_unit_triangle():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    faces = np.array([[0, 1, 2]])
    pts, normals = sample_points_from_mesh(verts, faces, 500,
                                           np.random.default_rng(0))
    assert (pts[:, 2] == 0).all()
    assert (pts[:, 0] >= 0).all() and (pts[:, 1] >= 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-6).all()
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0)
    up, un = uniform_sample_points_from_mesh(verts, faces, 64, dense_factor=4,
                                             rng=np.random.default_rng(1))
    assert up.shape == (64, 3)


def test_ply_writers_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    normals = np.tile([0, 0, 1.0], (3, 1)).astype(np.float32)
    mp = str(tmp_path / "m.ply")
    save_mesh_ply(mp, verts, faces, normals)
    text = open(mp).read()
    assert "element vertex 3" in text and "element face 1" in text
    assert "3 0 1 2" in text

    pp = str(tmp_path / "p.ply")
    save_pcd_ply(pp, verts, normals=normals, indicator=np.array([1, -1, 1]))
    text = open(pp).read()
    assert "property uchar red" in text
    assert "0 255 0" in text and "255 0 0" in text


def test_visualize_pcd(tmp_path):
    npz = str(tmp_path / "gen.npz")
    np.savez(npz, points=np.random.randn(2, 16, 3).astype(np.float32),
             label=np.array([0, 3]), category=["02691156", "03001627"],
             category_name=["airplane", "chair"],
             keypoint=np.random.randn(2, 4, 3).astype(np.float32))
    out = visualize_pcd(npz)
    files = os.listdir(out)
    assert any("airplane" in f and f.endswith(".xyz") for f in files)
    assert any("keypoint" in f for f in files)
    assert len([f for f in files if f.endswith(".xyz")]) == 4  # 2 pcd + 2 kp
