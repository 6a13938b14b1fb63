"""End-to-end slice (SURVEY.md §7.2 step 3): train the position DDPM on a
synthetic ShapeNet-PSR tree over the virtual 8-device mesh, checkpoint,
resume, and generate the reference-format npz."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.configs import keypoint_ddpm_config
from slide_tpu.data import write_synthetic_shapenet_psr, get_dataloader
from slide_tpu.diffusion import calc_diffusion_hyperparams
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.train import train_position_ddpm, find_max_iter
from slide_tpu.eval import evaluate_per_rank, gather_generated_results


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_psr")
    return write_synthetic_shapenet_psr(str(root), categories=("02691156",),
                                        models_per_split=8, num_points=2500)


def tiny_config(root, exp_root):
    cfg = keypoint_ddpm_config("airplane", batch_size=8)
    pc = cfg["pointnet_config"]
    pc["architecture"]["feature_dim"] = [16, 32, 32]
    pc["architecture"]["decoder_feature_dim"] = [32, 32, 32]
    pc["t_dim"] = 32
    cfg["shapenet_psr_dataset_config"].update(
        data_dir=root, num_workers=0, repeat_dataset=1, npoints=256,
        eval_batch_size=8, num_samples_tested=8)
    cfg["train_config"].update(root_directory=exp_root, n_epochs=1000,
                               iters_per_logging=1, epochs_per_ckpt=20)
    return cfg


def test_dataset_loader(synth_root):
    cfg = keypoint_ddpm_config("airplane", batch_size=4)
    ds_cfg = dict(cfg["shapenet_psr_dataset_config"],
                  data_dir=synth_root, npoints=128, repeat_dataset=1)
    loader = get_dataloader(ds_cfg, phase="train", seed=0)
    batch = next(iter(loader))
    assert batch["points"].shape == (4, 128, 3)
    assert batch["normals"].shape == (4, 128, 3)
    assert batch["label"].shape == (4,)
    assert (batch["label"] == 0).all()      # airplane is label 0 (sorted synsets)
    assert batch["category"][0] == "02691156"
    # scale: synthetic clouds are ~radius .4, x2 scaling -> within ~1
    assert np.abs(batch["points"]).max() < 1.5


def test_train_ckpt_resume_and_generate(synth_root, tmp_path):
    exp_root = str(tmp_path / "exp")
    cfg = tiny_config(synth_root, exp_root)

    state, losses = train_position_ddpm(cfg, max_iters=20, seed=0, verbose=False)
    assert len(losses) == 20
    first = np.mean([l for _, l in losses[:5]])
    last = np.mean([l for _, l in losses[-5:]])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first          # tiny model learns *something* in 20 steps

    ckpt_dir = os.path.join(
        exp_root, "T1000_betaT0.02_keypoint_ddpm_airplane", "checkpoint")
    saved_iter = find_max_iter(ckpt_dir)
    assert saved_iter >= 0

    # resume: next run starts after the saved iteration
    state2, losses2 = train_position_ddpm(cfg, max_iters=saved_iter + 3,
                                          seed=0, verbose=False)
    assert losses2[0][0] == saved_iter + 1

    # generation eval on the dummy dataset writes the reference-format npz
    net = ConditionalPointNet2(cfg["pointnet_config"])
    sched = calc_diffusion_hyperparams(5, 1e-4, 0.02)   # 5 steps for speed
    save_dir = str(tmp_path / "eval")
    f = evaluate_per_rank(net, jax.device_get(state.params),
                          cfg["shapenet_psr_dataset_config"], sched, save_dir,
                          "keypoint_generation", point_feature_dim=3)
    with np.load(f) as d:
        assert d["points"].shape == (8, 16, 3)
        assert set(d.files) >= {"points", "label", "category", "category_name",
                                "timing"}
        assert d["timing"].shape == (8,)
        assert np.isfinite(d["points"]).all()


def test_rank_sharded_eval_gather(synth_root, tmp_path):
    """Two ranks write shards; gather merges and deletes them
    (mesh_evaluation.py:156-186 protocol)."""
    cfg = tiny_config(synth_root, str(tmp_path / "exp"))
    net = ConditionalPointNet2(cfg["pointnet_config"])
    x0 = jnp.zeros((1, 16, 3))
    variables = net.init(jax.random.key(0), x0, ts=jnp.zeros((1,), jnp.int32),
                         label=jnp.zeros((1,), jnp.int32))
    sched = calc_diffusion_hyperparams(3, 1e-4, 0.02)
    save_dir = str(tmp_path / "eval_ranks")
    for rank in range(2):
        evaluate_per_rank(net, variables["params"],
                          cfg["shapenet_psr_dataset_config"], sched, save_dir,
                          "keypoint_generation", rank=rank, world_size=2)
    merged = gather_generated_results(save_dir, 2, num_points=16)
    with np.load(merged) as d:
        assert d["points"].shape[0] == 8     # 2 ranks x ceil(8/2)
    assert len(os.listdir(save_dir)) == 1    # rank shards deleted


def test_x0_engine_position_training(synth_root, tmp_path):
    """The chamfer-loss (x0-engine) position DDPM: configs carrying
    standard_diffusion_config train through x0_training_loss
    (reference train.py:209-215, 355-360)."""
    cfg = tiny_config(synth_root, str(tmp_path / "x0_exp"))
    cfg["standard_diffusion_config"] = {
        "beta_schedule": "linear", "beta_start": 1e-4, "beta_end": 0.02,
        "num_diffusion_timesteps": 1000, "data_clamp_range": 1.0,
        "model_output_scale_factor": 1.0,
        "loss_type": "mixed_cd_t_epsilon_mse", "t_trunction": 100,
        "normal_loss_type": "mse",
    }
    state, losses = train_position_ddpm(cfg, max_iters=5, seed=0, verbose=False)
    vals = [l for _, l in losses]
    # (unclamped x0 chamfer at large t is huge by design — the reference
    # mitigates with the t-truncated mixed loss, which we use here)
    assert len(vals) == 5 and all(np.isfinite(vals))


def test_steps_per_dispatch_boundary_semantics(synth_root, tmp_path):
    """Chunked scan dispatch must reproduce the per-step loop's cadence:
    checkpoints exactly on epochs_per_ckpt boundaries, per-iteration logging
    losses, and identical final-iteration count — for spd both dividing and
    NOT dividing the checkpoint interval."""
    for spd, tag in ((5, "a"), (4, "b"), (1, "c")):
        exp_root = str(tmp_path / f"exp_{tag}")
        cfg = tiny_config(synth_root, exp_root)
        # loader length 1 (8 models, batch 8) -> iters_per_ckpt = 20
        cfg["train_config"]["steps_per_dispatch"] = spd
        state, losses = train_position_ddpm(cfg, max_iters=23, seed=0,
                                            verbose=False)
        assert [i for i, _ in losses] == list(range(23))
        ckpt_dir = os.path.join(
            exp_root, "T1000_betaT0.02_keypoint_ddpm_airplane", "checkpoint")
        # cadence checkpoint at (19+1) % 20 AND the final off-cadence save
        assert os.path.exists(
            os.path.join(ckpt_dir, "pointnet_ckpt_19.pkl"))
        assert find_max_iter(ckpt_dir) == 22
