"""SAP upsampler training driver test (tiny config, synthetic psr grids)."""

import numpy as np
import pytest

from slide_tpu.configs import upsampler_config
from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.train import train_upsampler


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_psr_sap")
    return write_synthetic_shapenet_psr(str(root), categories=("02691156",),
                                        models_per_split=8, num_points=800,
                                        psr_res=16, with_psr=True)


def test_upsampler_training(synth_root, tmp_path):
    cfg = upsampler_config(batch_size=8)
    pc = cfg["pointnet_config"]
    pc["architecture"].update(npoint=[32, 16, 8], radius=[0.1, 0.2, 0.4],
                              nsample=[8, 8, 8], feature_dim=[8, 16, 16, 16],
                              decoder_feature_dim=[16, 16, 16, 16], mlp_depth=2)
    pc["t_dim"] = 32
    pc["point_upsample_factor"] = 2
    cfg["dpsr_config"].update(grid_res=16, psr_sigma=2)
    cfg["shapenet_psr_dataset_config"].update(
        npoints=64, num_workers=0, categories=["02691156"],
        augmentation={"noise_magnitude": 0.02})
    cfg["train_config"].update(root_directory=str(tmp_path / "sap_exp"),
                               iters_per_logging=1, epochs_per_ckpt=1000)
    state, losses = train_upsampler(cfg, data_dir=synth_root, max_iters=5,
                                    seed=0, verbose=False)
    vals = [l for _, l in losses]
    assert len(vals) == 5
    assert all(np.isfinite(vals))
    # tanh-MSE between random grids is bounded by 4
    assert max(vals) < 4.0
