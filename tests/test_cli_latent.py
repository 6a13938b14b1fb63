"""CLI coverage for latent-generate / encode / decode — the full
keypoint-conditional user workflow driven through the command surface."""

import glob
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_autoencoder import tiny_ae_config
from test_latent_pipeline import _tiny_latent_cfg
from slide_tpu.cli import main
from slide_tpu.config import write_json_file
from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.train import build_autoencoder, build_network
from slide_tpu.train.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_latent")
    root = write_synthetic_shapenet_psr(str(tmp / "ds"),
                                        categories=("02691156",),
                                        models_per_split=4, num_points=400)
    import optax

    ae_cfg = tiny_ae_config()
    ae = build_autoencoder(ae_cfg["pointnet_config"])
    ae_vars = ae.init(
        {"params": jax.random.key(0), "gaussian": jax.random.key(1),
         "fps": jax.random.key(2)},
        jnp.zeros((1, 128, 6)), jnp.zeros((1, 8, 3)),
        label=jnp.zeros((1,), jnp.int32))
    opt = optax.adam(1e-4)
    ae_ckpt = save_checkpoint(str(tmp / "ae_ckpt"), 0, ae_vars["params"],
                              opt.init(ae_vars["params"]), 0)

    cfg = _tiny_latent_cfg()
    cfg["standard_diffusion_config"]["num_diffusion_timesteps"] = 5
    cfg["shapenet_psr_dataset_config"]["data_dir"] = root
    cfg["autoencoder_config"]["ckpt"] = ae_ckpt
    cfg_path = str(tmp / "latent_config.json")
    write_json_file(cfg_path, cfg)

    net = build_network(cfg["pointnet_config"])
    net_vars = net.init(jax.random.key(3), jnp.zeros((1, 8, 27)),
                        ts=jnp.zeros((1,), jnp.int32),
                        label=jnp.zeros((1,), jnp.int32))
    lat_ckpt = save_checkpoint(str(tmp / "lat_ckpt"), 0, net_vars["params"],
                               opt.init(net_vars["params"]), 0,
                               ema_state_list=[net_vars["params"]])

    ae_cfg_path = str(tmp / "ae_config.json")
    write_json_file(ae_cfg_path, ae_cfg)
    return tmp, root, cfg_path, ae_cfg_path, ae_ckpt, lat_ckpt


def test_cli_latent_generate(setup):
    tmp, root, cfg_path, _, ae_ckpt, lat_ckpt = setup
    save = str(tmp / "latgen")
    main(["latent-generate", "-c", cfg_path, "--ckpt", lat_ckpt,
          "--ema_idx", "0", "--ae_ckpt", ae_ckpt, "--num_samples", "4",
          "--batch_size", "4", "--save_dir", save, "--save_keypoint_feature",
          "--no_visualize"])
    npz = glob.glob(os.path.join(save, "*.npz"))
    assert len(npz) == 1
    with np.load(npz[0]) as d:
        # 128-pt decoded clouds with normals split out + conditioning keypoints
        assert d["points"].shape == (4, 128, 3)
        assert d["normals"].shape == (4, 128, 3)
        assert d["keypoint"].shape == (4, 8, 3)
        assert d["keypoint_feature"].shape == (4, 8, 24)
        assert d["gt_points"].shape[0] == 4


def test_cli_encode_then_decode(setup):
    tmp, root, _, ae_cfg_path, ae_ckpt, _ = setup
    # build an input npz from the synthetic val set
    from slide_tpu.data.tools import save_reference_data
    src = save_reference_data(root, str(tmp / "val.npz"), split="val",
                              categories=["02691156"], npoints=128)
    enc_dir = str(tmp / "enc")
    main(["encode", "-c", ae_cfg_path, "--ckpt", ae_ckpt,
          "--dataset_path", src, "--save_dir", enc_dir, "--batch_size", "4",
          "--save_keypoint_feature"])
    enc_npz = os.path.join(enc_dir, "autoencoder_reconstruction.npz")
    with np.load(enc_npz) as d:
        assert d["points"].shape == (4, 128, 6)
        assert d["keypoint"].shape == (4, 8, 3)
        assert d["keypoint_feature"].shape == (4, 8, 24)

    dec_dir = str(tmp / "dec")
    main(["decode", "-c", ae_cfg_path, "--ckpt", ae_ckpt,
          "--dataset_path", enc_npz, "--save_dir", dec_dir,
          "--batch_size", "4"])
    with np.load(os.path.join(dec_dir, "decoded_from_keypoints.npz")) as d:
        assert d["points"].shape == (4, 128, 6)
        assert np.isfinite(d["points"]).all()


def test_cli_latent_generate_local_resampling(setup):
    """--local_resampling_file re-generates only masked keypoints' latents
    (`mesh_evaluation.py:113-118`, `diffusion.py:352-359`).  With an all-ones
    mask the result must equal the plain conditional run (x0 replacement is a
    no-op), proving the plumbing reaches denoising_step."""
    tmp, root, cfg_path, _, ae_ckpt, lat_ckpt = setup
    # external keypoints shared by both runs
    kp = np.random.RandomState(0).randn(4, 8, 3).astype(np.float32) * 0.3
    kp_file = str(tmp / "ext_kp.npz")
    np.savez(kp_file, points=kp, label=np.zeros(4, np.int64),
             category=np.array(["02691156"] * 4),
             category_name=np.array(["airplane"] * 4))

    resample = str(tmp / "resample.npz")
    np.savez(resample, complete_x0=np.zeros((4, 8, 27), np.float32),
             keypoint_mask=np.ones((4, 8), np.float32))

    plain = str(tmp / "lr_plain")
    main(["latent-generate", "-c", cfg_path, "--ckpt", lat_ckpt,
          "--ema_idx", "0", "--ae_ckpt", ae_ckpt, "--batch_size", "4",
          "--save_dir", plain, "--external_keypoint_file", kp_file,
          "--no_visualize", "--seed", "11"])
    masked = str(tmp / "lr_masked")
    main(["latent-generate", "-c", cfg_path, "--ckpt", lat_ckpt,
          "--ema_idx", "0", "--ae_ckpt", ae_ckpt, "--batch_size", "4",
          "--save_dir", masked, "--external_keypoint_file", kp_file,
          "--local_resampling_file", resample,
          "--no_visualize", "--seed", "11"])
    with np.load(glob.glob(os.path.join(plain, "*.npz"))[0]) as d1, \
            np.load(glob.glob(os.path.join(masked, "*.npz"))[0]) as d2:
        np.testing.assert_allclose(d1["points"], d2["points"], atol=1e-5)

    # mask all-zeros: every latent pinned to complete_x0's posterior path ->
    # output differs from the plain run
    resample0 = str(tmp / "resample0.npz")
    np.savez(resample0, complete_x0=np.full((4, 8, 27), 0.5, np.float32),
             keypoint_mask=np.zeros((4, 8), np.float32))
    frozen = str(tmp / "lr_frozen")
    main(["latent-generate", "-c", cfg_path, "--ckpt", lat_ckpt,
          "--ema_idx", "0", "--ae_ckpt", ae_ckpt, "--batch_size", "4",
          "--save_dir", frozen, "--external_keypoint_file", kp_file,
          "--local_resampling_file", resample0,
          "--no_visualize", "--seed", "11"])
    with np.load(glob.glob(os.path.join(plain, "*.npz"))[0]) as d1, \
            np.load(glob.glob(os.path.join(frozen, "*.npz"))[0]) as d3:
        assert not np.allclose(d1["points"], d3["points"], atol=1e-5)
