"""Checkpoint-time auto eval hooks: generation hook writes npz (model + every
EMA shadow dir); AE hook writes visual pickle + quantitative history."""

import glob
import os

import numpy as np
import pytest

from test_train_e2e import tiny_config
from test_autoencoder import tiny_ae_config
from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.train import train_position_ddpm, train_autoencoder


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_hooks")
    return write_synthetic_shapenet_psr(str(root), categories=("02691156",),
                                        models_per_split=8, num_points=500)


def test_generation_eval_hook(synth_root, tmp_path):
    cfg = tiny_config(synth_root, str(tmp_path / "exp"))
    cfg["diffusion_config"]["T"] = 5          # keep checkpoint eval fast
    cfg["shapenet_psr_dataset_config"].update(num_samples_tested=8,
                                              eval_batch_size=8)
    cfg["train_config"].update(epochs_per_ckpt=6, eval_per_ckpt=1)
    train_position_ddpm(cfg, max_iters=6, seed=0, verbose=False,
                        eval_hook="auto")
    eval_dir = os.path.join(str(tmp_path / "exp"),
                            "T5_betaT0.02_keypoint_ddpm_airplane", "eval_result")
    main_npz = glob.glob(os.path.join(eval_dir, "*.npz"))
    assert main_npz, os.listdir(eval_dir)
    with np.load(main_npz[0]) as d:
        assert d["points"].shape == (8, 16, 3)
    for rate in (0.999, 0.9999):
        ema_dir = os.path.join(eval_dir, f"model_ema_{rate:.5f}")
        assert glob.glob(os.path.join(ema_dir, "*.npz")), rate


def test_ae_eval_hook(synth_root, tmp_path):
    cfg = tiny_ae_config()
    cfg["shapenet_psr_dataset_config"].update(
        data_dir=synth_root, num_workers=0, repeat_dataset=1, batch_size=8,
        eval_batch_size=8)
    cfg["train_config"].update(root_directory=str(tmp_path / "ae_exp"),
                               iters_per_logging=10, epochs_per_ckpt=3,
                               eval_per_ckpt=1)
    train_autoencoder(cfg, max_iters=3, seed=0, verbose=False,
                      eval_hook="auto")
    # AE experiment dirs use the plain model name (no T prefix)
    exp = glob.glob(os.path.join(str(tmp_path / "ae_exp"), "*"))[0]
    eval_dir = os.path.join(exp, "eval_result")
    assert glob.glob(os.path.join(
        eval_dir, "shapenet_psr_autoencoder_visualization_result_*.pkl"))
    for sub in ("trainset_eval", "valset_eval"):
        hist = os.path.join(
            eval_dir, sub, "shapenet_psr_autoencoder_quantitative_eval_result.pkl")
        assert os.path.isfile(hist), sub
    # keypoint_noise_magnitude > 0 in the preset -> noise-free variant too
    assert os.path.isdir(os.path.join(eval_dir, "valset_eval_keypoint_noise_0"))


def test_latent_eval_hook(synth_root, tmp_path):
    """Latent-DDPM checkpoint-time auto eval (`train_latent_ddpm.py:283-297`):
    per checkpoint, sample latents conditioned on val keypoints, decode through
    the frozen AE, write the generated npz for model + every EMA."""
    import jax
    import jax.numpy as jnp
    from test_latent_pipeline import _tiny_latent_cfg
    from slide_tpu.train import train_latent_ddpm, build_autoencoder

    cfg = _tiny_latent_cfg()
    cfg["standard_diffusion_config"]["num_diffusion_timesteps"] = 5
    cfg["shapenet_psr_dataset_config"].update(data_dir=synth_root,
                                              num_samples_tested=8,
                                              eval_batch_size=8)
    cfg["train_config"].update(root_directory=str(tmp_path / "lat_exp"),
                               epochs_per_ckpt=2, eval_per_ckpt=1,
                               ema_rate=[0.999])

    ae = build_autoencoder(cfg["autoencoder_config"]["pointnet_config"])
    ae_vars = ae.init(
        {"params": jax.random.key(0), "gaussian": jax.random.key(1),
         "fps": jax.random.key(2)},
        jnp.zeros((2, 128, 6)), jnp.zeros((2, 8, 3)),
        label=jnp.zeros((2,), jnp.int32))
    train_latent_ddpm(cfg, ae_vars["params"], max_iters=2, seed=0,
                      verbose=False, eval_hook="auto")

    exp = glob.glob(os.path.join(str(tmp_path / "lat_exp"), "T5_*"))[0]
    eval_dir = os.path.join(exp, "eval_result")
    main_npz = glob.glob(os.path.join(eval_dir, "*.npz"))
    assert main_npz, os.listdir(eval_dir)
    with np.load(main_npz[0]) as d:
        assert d["points"].shape == (8, 128, 6)   # decoded clouds + normals
        assert d["keypoint"].shape == (8, 8, 3)
        assert np.isfinite(d["points"]).all()
    ema_dir = os.path.join(eval_dir, "model_ema_0.99900")
    assert glob.glob(os.path.join(ema_dir, "*.npz"))
