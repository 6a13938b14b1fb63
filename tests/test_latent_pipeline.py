"""AE training driver + latent (feature) DDPM pipeline tests on the virtual
CPU mesh + synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_autoencoder import tiny_ae_config
from slide_tpu.configs import latent_ddpm_config
from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.diffusion.latent import (latent_train_loss, latent_config_weights,
                                        latent_denoise_and_reconstruct)
from slide_tpu.diffusion.x0 import X0Schedule
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.train import train_autoencoder, train_latent_ddpm, build_autoencoder


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_psr_latent")
    return write_synthetic_shapenet_psr(str(root), categories=("02691156",),
                                        models_per_split=8, num_points=1500)


def _tiny_latent_cfg():
    """Latent DDPM config matched to the tiny AE (latent = 8 + 16 = 24)."""
    cfg = latent_ddpm_config("airplane", num_keypoints=8, latent_dim=24,
                             batch_size=8)
    pc = cfg["pointnet_config"]
    pc["architecture"].update(npoint=[8, 8], nsample=[8, 8],
                              feature_dim=[16, 32, 32],
                              decoder_feature_dim=[16, 32, 32])
    pc["t_dim"] = 32
    ae_cfg = tiny_ae_config()
    cfg["autoencoder_config"]["pointnet_config"] = ae_cfg["pointnet_config"]
    cfg["shapenet_psr_dataset_config"].update(
        npoints=128, num_keypoints=8, num_workers=0, repeat_dataset=1,
        eval_batch_size=8, num_samples_tested=8)
    cfg["train_config"].update(iters_per_logging=1, epochs_per_ckpt=1000)
    return cfg


def test_latent_config_weights():
    assert latent_config_weights({"keypoint_conditional": True,
                                  "keypoint_position_loss_weight": 5.0,
                                  "feature_loss_weight": 2.0}) == (0.0, 2.0)
    assert latent_config_weights({}) == (1.0, 1.0)


def test_ae_training_driver(synth_root, tmp_path):
    cfg = tiny_ae_config()
    cfg["shapenet_psr_dataset_config"].update(
        data_dir=synth_root, num_workers=0, repeat_dataset=1, batch_size=8)
    cfg["train_config"].update(root_directory=str(tmp_path / "ae_exp"),
                               iters_per_logging=1, epochs_per_ckpt=1000)
    state, losses = train_autoencoder(cfg, max_iters=6, seed=0, verbose=False)
    vals = [l for _, l in losses]
    assert len(vals) == 6
    assert all(np.isfinite(vals))


def test_latent_ddpm_training_and_generation(synth_root, tmp_path):
    ae_cfg = tiny_ae_config()
    cfg = _tiny_latent_cfg()
    cfg["shapenet_psr_dataset_config"]["data_dir"] = synth_root
    cfg["train_config"]["root_directory"] = str(tmp_path / "latent_exp")

    # frozen AE params (untrained is fine for plumbing)
    ae = build_autoencoder(ae_cfg["pointnet_config"])
    variables = ae.init(
        {"params": jax.random.key(0), "gaussian": jax.random.key(1),
         "fps": jax.random.key(2)},
        jnp.zeros((2, 128, 6)), jnp.zeros((2, 8, 3)),
        label=jnp.zeros((2,), jnp.int32))
    ae_params = variables["params"]

    state, losses = train_latent_ddpm(cfg, ae_params, max_iters=4, seed=0,
                                      verbose=False)
    assert len(losses) == 4
    assert all(np.isfinite(l) for _, l in losses)

    # end-to-end conditional generation: denoise latent + decode
    sched = X0Schedule.from_config(
        dict(cfg["standard_diffusion_config"], num_diffusion_timesteps=5))
    net = ConditionalPointNet2(cfg["pointnet_config"])
    params = jax.device_get(state.params)
    label = jnp.zeros((2,), jnp.int32)
    keypoint = jax.random.normal(jax.random.key(3), (2, 8, 3)) * 0.3

    def net_fn(x, ts):
        return net.apply({"params": params}, x, ts=ts, label=label)

    def decode_fn(kp, feat, lbl, key):
        return ae.apply({"params": ae_params}, kp, feat, label=lbl,
                        method=ae.decode, rngs={"fps": key})

    recon, kp, feat = jax.jit(lambda key: latent_denoise_and_reconstruct(
        net_fn, decode_fn, key, 2, 3, (8, 3 + 24), sched, label=label,
        keypoint=keypoint))(jax.random.key(4))
    assert recon.shape == (2, 128, 6)
    assert np.isfinite(np.asarray(recon)).all()
    np.testing.assert_allclose(np.asarray(kp), np.asarray(keypoint), atol=1e-6)
    assert feat.shape == (2, 8, 24)


def test_latent_train_loss_keypoint_conditional_ignores_positions():
    """With keypoint_conditional, position channels are pinned so the loss has
    no position term (weight 0)."""
    sched = X0Schedule.from_config({
        "beta_schedule": "linear", "beta_start": 1e-4, "beta_end": 0.02,
        "num_diffusion_timesteps": 10, "data_clamp_range": -1,
        "model_output_scale_factor": 1.0, "loss_type": None})
    x = jax.random.normal(jax.random.key(0), (2, 8, 6)) * 0.3
    kp = x[..., :3]
    encode_fn = lambda xx, k, l, key: xx[..., 3:] * 0.5   # fake encoder -> 3 feats
    net_fn = lambda xt, ts: jnp.zeros_like(xt)
    loss = latent_train_loss(net_fn, encode_fn, jax.random.key(1), x, kp, None,
                             sched, keypoint_conditional=True,
                             keypoint_position_loss_weight=0.0,
                             feature_loss_weight=1.0)
    assert loss.shape == (2,)
    assert np.isfinite(np.asarray(loss)).all()
