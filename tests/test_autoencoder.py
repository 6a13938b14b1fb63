"""Autoencoder stack tests: point_upsample math, VAE posterior, full
round-trip with per-level chamfer losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.configs import autoencoder_config
from slide_tpu.models import PointAutoencoder, point_upsample
from slide_tpu.nn.distributions import DiagonalGaussian


def test_point_upsample_plain():
    coarse = jnp.asarray(np.array([[[1.0, 2.0, 3.0]]], np.float32))     # (1,1,3)
    disp = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 1, 6))  # factor 2
    out = point_upsample(coarse, disp, 2, output_scale_factor_value=0.1)
    want = np.asarray(coarse)[0, 0] + np.asarray(disp).reshape(2, 3) / np.sqrt(2) * 0.1
    np.testing.assert_allclose(np.asarray(out)[0], want, rtol=1e-6)


def test_point_upsample_refine_first():
    coarse = jnp.ones((1, 2, 3))
    disp = jnp.ones((1, 2, 3 * 3))   # 1 center slot + 2 grid slots (factor 3)
    out = point_upsample(coarse, disp, 3, first_refine_coarse_points=True,
                         output_scale_factor_value=0.5)
    # refined center = 1 + 1*0.5 = 1.5; grid pts = 1.5 + (1/sqrt(3))*0.5
    assert out.shape == (1, 4, 3)    # 2 pts x 2 grid slots
    np.testing.assert_allclose(np.asarray(out), 1.5 + 0.5 / np.sqrt(3), rtol=1e-6)


def test_point_upsample_center_output():
    coarse = jnp.zeros((1, 2, 3))
    disp = jnp.ones((1, 2, 3 * 3))   # center + 2 grid
    out = point_upsample(coarse, disp, 3, first_refine_coarse_points=True,
                         include_displacement_center_to_final_output=True,
                         output_scale_factor_value=1.0)
    assert out.shape == (1, 6, 3)    # 2*2 grid + 2 refined centers
    np.testing.assert_allclose(np.asarray(out)[0, -2:], 1.0)  # centers appended last


def test_diagonal_gaussian():
    params = jnp.concatenate([jnp.zeros((2, 4, 3)), jnp.zeros((2, 4, 3))], -1)
    g = DiagonalGaussian.from_parameters(params)
    np.testing.assert_allclose(np.asarray(g.kl()), 0.0, atol=1e-6)   # N(0,1) vs N(0,1)
    s = g.sample(jax.random.key(0))
    assert s.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(g.mode()), 0.0)
    g2 = DiagonalGaussian.from_parameters(params + 1.0)
    assert float(g2.kl()[0]) > 0


def tiny_ae_config():
    cfg = autoencoder_config("airplane")
    pc = cfg["pointnet_config"]
    enc = pc["encoder_config"]
    enc["architecture"].update(npoint=[32, 16, 8], radius=[0, 0, 0],
                               nsample=[8, 8, 8], feature_dim=[8, 8, 8, 16],
                               mlp_depth=2)
    d1, d2, d3 = pc["decoder_config_list"]
    # level 1 injects global + class conditions -> needs mlp_depth >= 3
    d1["architecture"].update(npoint=[8, 8], nsample=[8, 8],
                              feature_dim=[8, 8, 8], mlp_depth=3)
    d1["pnet_global_feature_architecture"] = [[3, 8, 8], [16, 16]]
    d1["feature_mapper_setting"].update(nsample=8, out_dim=16)
    d1["upsampling_setting"].update(point_upsample_factor=8, num_output_points=32)
    d2["architecture"].update(npoint=[16, 8], radius=[0, 0], nsample=[8, 8],
                              feature_dim=[8, 16, 16], mlp_depth=2,
                              decoder_feature_dim=[16, 16, 16])
    d2["feature_mapper_setting"].update(nsample=4, out_dim=16)
    d2["upsampling_setting"].update(point_upsample_factor=4, num_output_points=64)
    d3["architecture"].update(npoint=[32, 8], radius=[0, 0], nsample=[8, 8],
                              feature_dim=[8, 16, 16], mlp_depth=2,
                              decoder_feature_dim=[16, 16, 16])
    d3["feature_mapper_setting"].update(nsample=8, out_dim=16)
    d3["upsampling_setting"].update(point_upsample_factor=4, num_output_points=128)
    cfg["shapenet_psr_dataset_config"].update(npoints=128, num_keypoints=8)
    return cfg


@pytest.fixture(scope="module")
def tiny_ae():
    cfg = tiny_ae_config()
    pc = cfg["pointnet_config"]
    ae = PointAutoencoder(pc["encoder_config"], tuple(pc["decoder_config_list"]),
                          apply_kl_regularization=pc["apply_kl_regularization"],
                          kl_weight=pc["kl_weight"],
                          feature_weight=tuple(pc["feature_weight"]))
    x = jnp.zeros((2, 128, 6))
    kp = jnp.zeros((2, 8, 3))
    label = jnp.zeros((2,), jnp.int32)
    rngs = {"params": jax.random.key(0), "gaussian": jax.random.key(1),
            "fps": jax.random.key(2)}
    variables = ae.init(rngs, x, kp, label=label)
    return ae, variables, cfg


def test_ae_forward_levels_and_losses(tiny_ae):
    ae, variables, cfg = tiny_ae
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 128, 6)).astype(np.float32) * 0.3)
    kp = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32) * 0.3)
    label = jnp.zeros((2,), jnp.int32)
    l_xyz, losses = ae.apply(variables, x, kp, label=label,
                             rngs={"gaussian": jax.random.key(3),
                                   "fps": jax.random.key(4)})
    # cascade levels: [keypoints, 32, 64, 128]
    assert [l.shape[1] for l in l_xyz] == [8, 32, 64, 128]
    assert l_xyz[-1].shape == (2, 128, 6)
    assert len(losses) == 3
    for ld in losses:
        assert np.isfinite(np.asarray(ld["training_loss"])).all()
    assert "kl_loss" in losses[-1]
    assert float(jnp.mean(losses[-1]["kl_loss"])) >= 0


def test_ae_encode_decode_shapes(tiny_ae):
    ae, variables, cfg = tiny_ae
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 128, 6)).astype(np.float32) * 0.3)
    kp = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32) * 0.3)
    label = jnp.zeros((2,), jnp.int32)
    feat = ae.apply(variables, x, kp, label=label, method=ae.encode,
                    rngs={"gaussian": jax.random.key(5)})
    # latent dim = sampled extractor (8) + sampled mapper (16) = 24
    assert feat.shape == (2, 8, 24)
    recon = ae.apply(variables, kp, feat, label=label, method=ae.decode,
                     rngs={"fps": jax.random.key(6)})
    assert recon.shape == (2, 128, 6)
    assert np.isfinite(np.asarray(recon)).all()
    # reconstruction stays in a sane range (displacement-bounded from keypoints)
    assert float(jnp.abs(recon[..., :3]).max()) < 5.0


def test_ae_deterministic_eval_mode(tiny_ae):
    """sample_posterior=False + no fps rng -> fully deterministic."""
    ae, variables, cfg = tiny_ae
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 128, 6)).astype(np.float32) * 0.3)
    kp = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32) * 0.3)
    label = jnp.zeros((1,), jnp.int32)
    f1 = ae.apply(variables, x, kp, label=label, sample_posterior=False,
                  method=ae.encode)
    f2 = ae.apply(variables, x, kp, label=label, sample_posterior=False,
                  method=ae.encode)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_ae_grads_flow(tiny_ae):
    ae, variables, cfg = tiny_ae
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 128, 6)).astype(np.float32) * 0.3)
    kp = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32) * 0.3)
    label = jnp.zeros((2,), jnp.int32)

    @jax.jit
    def loss_fn(params):
        _, losses = ae.apply({"params": params}, x, kp, label=label,
                             rngs={"gaussian": jax.random.key(7),
                                   "fps": jax.random.key(8)})
        return sum(jnp.mean(ld["training_loss"]) for ld in losses)

    loss, g = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0
