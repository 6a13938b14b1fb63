"""The dual-tower conditional denoiser: condition SA/FP towers +
FeatureMapModule transfer + global PNet, the cacheable-condition contract, and
conditional generation eval (the PDR-style architecture the reference carries;
no shipped SLIDE config enables it, but the class supports it and the
capability is part of the surface)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.configs import keypoint_ddpm_config
from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.diffusion import calc_diffusion_hyperparams
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.eval import evaluate_per_rank


def conditional_config():
    cfg = keypoint_ddpm_config("airplane", num_keypoints=16)
    pc = cfg["pointnet_config"]
    pc.update(include_local_feature=True, include_global_feature=True,
              t_dim=32, partial_in_fea_dim=0,
              pnet_global_feature_architecture=[[3, 8, 8], [16, 16]])
    pc["architecture"].update(npoint=[16, 8], nsample=[8, 8],
                              feature_dim=[8, 16, 16],
                              decoder_feature_dim=[16, 16, 16],
                              radius=[0, 0])
    pc["condition_net_architecture"] = {
        "npoint": [8, 4], "radius": [0, 0], "neighbor_definition": "nn",
        "nsample": [4, 4], "feature_dim": [8, 8, 8], "mlp_depth": 3,
        "decoder_feature_dim": [8, 8, 8], "decoder_mlp_depth": 2,
        "include_grouper": False, "use_knn_FP": True, "K": 4,
    }
    pc["feature_mapper_architecture"] = {
        "neighbor_definition": "nn",
        "encoder_feature_map_dim": [8, 8], "encoder_mlp_depth": 2,
        "encoder_radius": [0, 0], "encoder_nsample": [4, 4],
        "decoder_feature_map_dim": [8, 8, 8], "decoder_mlp_depth": 2,
        "decoder_radius": [0, 0, 0], "decoder_nsample": [4, 4, 4],
    }
    cfg["train_config"]["task"] = "keypoint_conditional_generation"
    return cfg


@pytest.fixture(scope="module")
def cond_net():
    cfg = conditional_config()
    net = ConditionalPointNet2(cfg["pointnet_config"])
    x = jnp.zeros((2, 16, 3))
    cond = jnp.zeros((2, 24, 3))
    variables = net.init(jax.random.key(0), x, condition=cond,
                         ts=jnp.zeros((2,), jnp.int32),
                         label=jnp.zeros((2,), jnp.int32))
    return cfg, net, variables


def test_conditional_forward_and_sensitivity(cond_net):
    cfg, net, variables = cond_net
    x = jax.random.normal(jax.random.key(1), (2, 16, 3)) * 0.4
    cond = jax.random.normal(jax.random.key(2), (2, 24, 3)) * 0.4
    ts = jnp.asarray([5, 100])
    label = jnp.zeros((2,), jnp.int32)
    out = net.apply(variables, x, condition=cond, ts=ts, label=label)
    assert out.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    out2 = net.apply(variables, x, condition=cond + 0.3, ts=ts, label=label)
    assert float(jnp.abs(out - out2).max()) > 1e-4     # condition matters


def test_condition_cache_equivalence(cond_net):
    """forward(condition=c) == forward(cond_cache=encode_condition(c)) — the
    contract that lets sampling encode the towers once per chain."""
    cfg, net, variables = cond_net
    x = jax.random.normal(jax.random.key(3), (2, 16, 3)) * 0.4
    cond = jax.random.normal(jax.random.key(4), (2, 24, 3)) * 0.4
    ts = jnp.asarray([7, 42])
    label = jnp.zeros((2,), jnp.int32)
    direct = net.apply(variables, x, condition=cond, ts=ts, label=label)
    cache = net.apply(variables, cond, method="encode_condition")
    assert set(cache) == {"global", "l_uvw", "enc", "dec"}
    cached = net.apply(variables, x, ts=ts, label=label, cond_cache=cache)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(cached),
                               rtol=1e-5, atol=1e-5)


def test_conditional_generation_eval(cond_net, tmp_path):
    """keypoint_conditional_generation end-to-end: GT keypoints condition the
    chain; npz carries keypoint + gt_points (mesh_evaluation.py:76-98)."""
    cfg, net, variables = cond_net
    root = write_synthetic_shapenet_psr(str(tmp_path / "ds"),
                                        categories=("02691156",),
                                        models_per_split=4, num_points=300)
    ts_cfg = dict(cfg["shapenet_psr_dataset_config"], data_dir=root,
                  npoints=24, num_keypoints=24, eval_batch_size=4,
                  num_samples_tested=4, num_workers=0, repeat_dataset=1,
                  keypoint_noise_magnitude=0.02)
    sched = calc_diffusion_hyperparams(4, 1e-4, 0.02)
    f = evaluate_per_rank(net, variables["params"], ts_cfg, sched,
                          str(tmp_path / "eval"),
                          "keypoint_conditional_generation",
                          point_feature_dim=3)
    with np.load(f) as d:
        assert d["points"].shape == (4, 24, 3)
        assert d["keypoint"].shape == (4, 24, 3)
        assert d["gt_points"].shape == (4, 24, 6)
        assert np.isfinite(d["points"]).all()
