"""Autoencoder evaluation tests (visual pickle + rank gather + quantitative
history)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_autoencoder import tiny_ae_config
from slide_tpu.data import write_synthetic_shapenet_psr, get_dataloader
from slide_tpu.eval.ae_eval import (ae_visual_eval, ae_quantitative_eval,
                                    gather_ae_visual_results)
from slide_tpu.train import build_autoencoder


@pytest.fixture(scope="module")
def ae_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_psr_aeeval")
    write_synthetic_shapenet_psr(str(root), categories=("02691156",),
                                 models_per_split=4, num_points=600)
    cfg = tiny_ae_config()
    cfg["shapenet_psr_dataset_config"].update(
        data_dir=str(root), num_workers=0, repeat_dataset=1,
        batch_size=4, eval_batch_size=4)
    ae = build_autoencoder(cfg["pointnet_config"])
    variables = ae.init(
        {"params": jax.random.key(0), "gaussian": jax.random.key(1),
         "fps": jax.random.key(2)},
        jnp.zeros((1, 128, 6)), jnp.zeros((1, 8, 3)),
        label=jnp.zeros((1,), jnp.int32))
    return cfg, ae, variables["params"]


def test_ae_visual_eval_and_npz(ae_setup, tmp_path):
    cfg, ae, params = ae_setup
    loader = get_dataloader(cfg["shapenet_psr_dataset_config"], phase="val", seed=0)
    save_dir = str(tmp_path / "vis")
    f = ae_visual_eval(ae, params, loader, save_dir, 100, 1,
                       cfg["shapenet_psr_dataset_config"],
                       save_reconstructed_pcd=True, save_keypoint_feature=True,
                       visualize=True)
    with open(f, "rb") as fh:
        payload = pickle.load(fh)
    levels = payload["hierarchical_pointcloud"]
    assert [l.shape[1] for l in levels] == [8, 32, 64, 128]
    assert payload["gt_points"].shape[1] == 128
    with np.load(os.path.join(save_dir, "reconstructed_pcd.npz")) as d:
        assert d["points"].shape[1:] == (128, 3)
        assert d["normals"].shape[1:] == (128, 3)
        assert d["keypoint_feature"].shape[1:] == (8, 24)
    # hierarchical visualization produced xyz files
    vis_dirs = [d for d in os.listdir(save_dir) if d.endswith("_visualization")]
    assert vis_dirs


def test_ae_rank_gather(ae_setup, tmp_path):
    cfg, ae, params = ae_setup
    save_dir = str(tmp_path / "ranks")
    for rank in range(2):
        loader = get_dataloader(cfg["shapenet_psr_dataset_config"], phase="val",
                                rank=rank, world_size=2, seed=0)
        ae_visual_eval(ae, params, loader, save_dir, 5, 1,
                       cfg["shapenet_psr_dataset_config"], rank=rank,
                       world_size=2)
    merged = gather_ae_visual_results(save_dir, 5, 1, 2)
    with open(merged, "rb") as fh:
        payload = pickle.load(fh)
    assert payload["hierarchical_pointcloud"][0].shape[0] == 4  # 2 ranks x 2
    assert len(os.listdir(save_dir)) == 1


def test_ae_quantitative_history(ae_setup, tmp_path):
    cfg, ae, params = ae_setup
    loader = get_dataloader(cfg["shapenet_psr_dataset_config"], phase="val", seed=0)
    save_dir = str(tmp_path / "quant")
    r1 = ae_quantitative_eval(ae, params, loader, save_dir, 10, 1,
                              cfg["shapenet_psr_dataset_config"])
    r2 = ae_quantitative_eval(ae, params, loader, save_dir, 20, 2,
                              cfg["shapenet_psr_dataset_config"])
    for r in (r1, r2):
        assert {"cd_p", "cd_t", "f1", "training_loss"} <= set(r)
        assert np.isfinite(r["cd_p"])
    with open(os.path.join(
            save_dir, "shapenet_psr_autoencoder_quantitative_eval_result.pkl"),
            "rb") as fh:
        hist = pickle.load(fh)
    assert hist["iter"] == [10, 20]
