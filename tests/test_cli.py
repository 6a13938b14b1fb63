"""CLI tests: train dispatch, generation, evaluation — driving the real
subcommand surface end-to-end on the CPU mesh."""

import json
import os
import pickle

import numpy as np
import pytest

from slide_tpu.cli import main, load_inference_params, normalize_point_cloud
from slide_tpu.config import write_json_file
from slide_tpu.data import write_synthetic_shapenet_psr


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_psr_cli")
    return write_synthetic_shapenet_psr(str(root), categories=("02691156",),
                                        models_per_split=8, num_points=800)


@pytest.fixture(scope="module")
def trained(synth_root, tmp_path_factory):
    """Train the tiny keypoint DDPM through the CLI and return the config/ckpt
    paths."""
    from test_train_e2e import tiny_config
    exp = tmp_path_factory.mktemp("cli_exp")
    cfg = tiny_config(synth_root, str(exp))
    cfg["diffusion_config"]["T"] = 20   # short chain so generate is fast
    cfg["train_config"]["epochs_per_ckpt"] = 8
    cfg_path = str(exp / "config.json")
    write_json_file(cfg_path, cfg)
    main(["train", "-c", cfg_path, "--max_iters", "9"])
    ckpt_dir = os.path.join(str(exp), "T20_betaT0.02_keypoint_ddpm_airplane",
                            "checkpoint")
    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith(".pkl")]
    assert ckpts
    return cfg_path, os.path.join(ckpt_dir, ckpts[0])


def test_cli_train_and_generate(trained, tmp_path):
    cfg_path, ckpt = trained
    save = str(tmp_path / "gen")
    main(["generate", "-c", cfg_path, "--ckpt", ckpt, "--ema_idx", "0",
          "--num_samples", "8", "--batch_size", "8", "--save_dir", save])
    files = os.listdir(save)
    npz = [f for f in files if f.endswith(".npz")]
    assert len(npz) == 1
    with np.load(os.path.join(save, npz[0])) as d:
        assert d["points"].shape == (8, 16, 3)
        assert "timing" in d.files
    # visualization directory was produced too
    assert any(f.endswith("_visualization") for f in files)


def test_cli_ema_loading(trained):
    _, ckpt = trained
    p_model = load_inference_params(ckpt, -1)
    p_ema = load_inference_params(ckpt, 1)
    l1 = list(np.asarray(x).ravel()[0] for x in
              [next(iter(_leaves(p_model)))])
    l2 = list(np.asarray(x).ravel()[0] for x in
              [next(iter(_leaves(p_ema)))])
    assert np.isfinite(l1).all() and np.isfinite(l2).all()


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def test_cli_evaluate(tmp_path, capsys):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 32, 3)).astype(np.float32) * 0.3
    gen, ref = str(tmp_path / "g.npz"), str(tmp_path / "r.npz")
    np.savez(gen, points=a)
    np.savez(ref, points=a + 0.01)
    out_json = str(tmp_path / "report.json")
    main(["evaluate", "--gen", gen, "--ref", ref, "--out", out_json])
    with open(out_json) as f:
        report = json.load(f)
    assert "cd_p" in report and "f1" in report
    assert report["cd_t"] < 0.01


def test_normalize_point_cloud_modes():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((3, 50, 3)).astype(np.float32) * 2 + 1
    out, mean, std = normalize_point_cloud(pts)
    np.testing.assert_allclose(out.mean(axis=1), 0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=1), 1, atol=1e-4)
    out2, _, _ = normalize_point_cloud(pts, normalize_per_shape=False)
    np.testing.assert_allclose(out2.reshape(-1, 3).mean(axis=0), 0, atol=1e-5)


@pytest.mark.parametrize("method", ["var", "step"])
def test_cli_generate_fastdpm(trained, tmp_path, method):
    """--sampler fastdpm runs the S-step accelerated chain end-to-end."""
    cfg_path, ckpt = trained
    save = str(tmp_path / f"gen_fast_{method}")
    main(["generate", "-c", cfg_path, "--ckpt", ckpt, "--ema_idx", "0",
          "--num_samples", "8", "--batch_size", "8", "--save_dir", save,
          "--no_visualize", "--sampler", "fastdpm", "--fastdpm_s", "5",
          "--fastdpm_method", method, "--fastdpm_schedule", "linear"])
    npz = [f for f in os.listdir(save) if f.endswith(".npz")]
    with np.load(os.path.join(save, npz[0])) as d:
        assert d["points"].shape == (8, 16, 3)
        assert np.isfinite(d["points"]).all()
