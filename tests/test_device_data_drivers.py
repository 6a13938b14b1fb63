"""All four training drivers must work with the device-resident corpus
(`train_config["device_data"]`): AE, latent, and SAP exercise batch keys /
frozen-AE closures / psr gathers the keypoint test doesn't."""

import numpy as np
import pytest

from test_train_e2e import tiny_config
from test_autoencoder import tiny_ae_config
from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.train import (train_position_ddpm, train_autoencoder,
                             train_latent_ddpm, train_upsampler)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_devdata")
    return write_synthetic_shapenet_psr(str(root), categories=("02691156",),
                                        models_per_split=8, num_points=500,
                                        psr_res=16, with_psr=True)


def _finite(losses, n):
    assert len(losses) == n
    assert np.isfinite([l for _, l in losses]).all()


def test_ae_device_data(synth_root, tmp_path):
    cfg = tiny_ae_config()
    cfg["shapenet_psr_dataset_config"].update(
        data_dir=synth_root, num_workers=0, repeat_dataset=1, batch_size=8)
    cfg["train_config"].update(root_directory=str(tmp_path / "ae_exp"),
                               iters_per_logging=1, epochs_per_ckpt=10,
                               device_data=True)
    _, losses = train_autoencoder(cfg, max_iters=4, seed=0, verbose=False)
    _finite(losses, 4)


def test_latent_device_data(synth_root, tmp_path):
    import jax
    import jax.numpy as jnp
    from test_latent_pipeline import _tiny_latent_cfg
    from slide_tpu.train import build_autoencoder
    cfg = _tiny_latent_cfg()
    cfg["shapenet_psr_dataset_config"]["data_dir"] = synth_root
    cfg["train_config"].update(root_directory=str(tmp_path / "lat_exp"),
                               device_data=True)
    ae = build_autoencoder(cfg["autoencoder_config"]["pointnet_config"])
    ae_vars = ae.init(
        {"params": jax.random.key(0), "gaussian": jax.random.key(1),
         "fps": jax.random.key(2)},
        jnp.zeros((2, 128, 6)), jnp.zeros((2, 8, 3)),
        label=jnp.zeros((2,), jnp.int32))
    _, losses = train_latent_ddpm(cfg, ae_vars["params"], max_iters=4,
                                  seed=0, verbose=False)
    _finite(losses, 4)


def test_sap_device_data(synth_root, tmp_path):
    from slide_tpu.configs import upsampler_config
    cfg = upsampler_config(batch_size=8)
    pc = cfg["pointnet_config"]
    pc["architecture"].update(npoint=[32, 16, 8], radius=[0.1, 0.2, 0.4],
                              nsample=[8, 8, 8], feature_dim=[8, 16, 16, 16],
                              decoder_feature_dim=[16, 16, 16, 16],
                              mlp_depth=2)
    pc["t_dim"] = 32
    pc["point_upsample_factor"] = 2
    cfg["dpsr_config"].update(grid_res=16, psr_sigma=2)
    cfg["shapenet_psr_dataset_config"].update(
        data_dir=synth_root, npoints=64, num_workers=0,
        categories=["02691156"], augmentation={"noise_magnitude": 0.02})
    cfg["train_config"].update(root_directory=str(tmp_path / "sap_exp"),
                               iters_per_logging=1, epochs_per_ckpt=1000,
                               device_data=True)
    _, losses = train_upsampler(cfg, max_iters=4, seed=0, verbose=False)
    _finite(losses, 4)
