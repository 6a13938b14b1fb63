"""Shape/jit/grad tests for the composite SA/FP/FeatureMap modules (their
building blocks are covered by exact torch parity in test_nn_parity.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.nn import (SAModule, FPModule, KnnFPModule, FeatureMapModule,
                          query_and_group, group_knn_features)

ATT = {"use_attention_module": True, "attention_bn": True,
       "transform_grouped_feat_out": True, "last_activation": True}


def _data(b=2, n=64, c=7, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    return xyz, feat


def test_query_and_group_channel_order():
    xyz, feat = _data()
    out, counts = query_and_group(xyz, xyz[:, :16], feat, nsample=8,
                                  neighbor_def="nn", use_xyz=True,
                                  include_abs_coordinate=True,
                                  include_center_coordinate=True)
    assert out.shape == (2, 16, 8, 7 + 9)
    # nearest neighbor of a subset query is itself: rel part ~0, abs == center
    rel = np.asarray(out[..., 0, 7:10])
    np.testing.assert_allclose(rel, 0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[..., 0, 10:13]),
                               np.asarray(out[..., 0, 13:16]), atol=1e-3)
    assert (np.asarray(counts) == 8).all()


def test_query_and_group_radius_not_subset_fallback():
    xyz, feat = _data()
    far = xyz[:, :4] + 100.0   # no neighbors within radius
    out, counts = query_and_group(xyz, far, feat, nsample=8, radius=0.1,
                                  neighbor_def="radius", use_xyz=True,
                                  include_abs_coordinate=True, subset=False)
    assert (np.asarray(counts) == 0).all()
    np.testing.assert_allclose(np.asarray(out[..., :7]), 0, atol=1e-6)   # zero features
    np.testing.assert_allclose(np.asarray(out[..., 7:10]), 0, atol=1e-6)  # rel = 0
    np.testing.assert_allclose(np.asarray(out[..., 10:13]),
                               np.broadcast_to(np.asarray(far)[:, :, None], (2, 4, 8, 3)),
                               atol=1e-6)  # abs = the center itself


def test_group_knn_features_channels():
    xyz, feat = _data(c=5)
    out = group_knn_features(xyz[:, :32], xyz, feat, 4)
    assert out.shape == (2, 32, 4, 5 + 11)
    # weights sum to 1 over K
    w = np.asarray(out[..., 6])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
    # self is the nearest neighbor: rel ~ 0 at slot 0
    np.testing.assert_allclose(np.asarray(out[:, :, 0, 10:13]), 0, atol=1e-3)


@pytest.mark.parametrize("use_attention", [False, True])
def test_sa_module_shapes_and_grad(use_attention):
    xyz, feat = _data(c=7)
    mod = SAModule(npoint=16, mlp_spec=(7, 32, 32, 64), nsample=8,
                   neighbor_def="nn", include_abs_coordinate=True,
                   include_center_coordinate=True, include_t=True,
                   include_condition=True, res_connect=True, bias=True,
                   attention_setting=ATT if use_attention else None)
    t = jnp.ones((2, 512))
    c = jnp.ones((2, 128))
    variables = mod.init(jax.random.key(0), xyz, feat, t, c)
    new_xyz, new_feat = mod.apply(variables, xyz, feat, t, c)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feat.shape == (2, 16, 64)

    def loss(params):
        _, f = mod.apply({"params": params}, xyz, feat, t, c)
        return jnp.mean(f ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    total = sum(float(jnp.abs(x).sum()) for x in flat)
    assert total > 0


def test_sa_module_identity_when_small():
    # N <= npoint: no FPS, order preserved (pointnet2_modules.py:254-258)
    xyz, feat = _data(n=16, c=4)
    mod = SAModule(npoint=16, mlp_spec=(4, 16, 16, 32), nsample=16,
                   neighbor_def="nn")
    variables = mod.init(jax.random.key(0), xyz, feat)
    new_xyz, new_feat = mod.apply(variables, xyz, feat)
    np.testing.assert_array_equal(np.asarray(new_xyz), np.asarray(xyz))


@pytest.mark.parametrize("use_attention", [False, True])
def test_knn_fp_module(use_attention):
    rng = np.random.default_rng(1)
    unknown = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    known = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(2, 64, 24)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(2, 16, 48)).astype(np.float32))
    # builder dims: mlp1[0]=decoder_dim_{i+1}=48, mlp2[0]=decoder_dim+skip=32+24
    mod = KnnFPModule(mlp1_spec=(48, 32, 32), mlp2_spec=(32 + 24, 32, 32), k=4,
                      include_t=True, include_condition=True, res_connect=True,
                      bias=True, attention_setting=ATT if use_attention else None)
    t = jnp.ones((2, 512))
    c = jnp.ones((2, 128))
    variables = mod.init(jax.random.key(0), unknown, known, skip, kf, t, c)
    out = mod.apply(variables, unknown, known, skip, kf, t, c)
    assert out.shape == (2, 64, 32)


def test_fp_module_three_interp():
    rng = np.random.default_rng(2)
    unknown = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    known = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(2, 64, 24)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(2, 16, 48)).astype(np.float32))
    mod = FPModule(mlp_spec=(48 + 24, 64, 64), include_t=True, res_connect=True)
    t = jnp.ones((2, 512))
    variables = mod.init(jax.random.key(0), unknown, known, skip, kf, t)
    out = mod.apply(variables, unknown, known, skip, kf, t)
    assert out.shape == (2, 64, 64)


def test_feature_map_module():
    rng = np.random.default_rng(3)
    cond_xyz = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
    cond_feat = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
    target_xyz = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    target_feat = jnp.asarray(rng.normal(size=(2, 64, 10)).astype(np.float32))
    mod = FeatureMapModule(mlp_spec=(16, 32, 32), k=8, neighbor_def="nn",
                           include_abs_coordinate=True, bias=True,
                           attention_setting=ATT, query_feature_dim=10)
    variables = mod.init(jax.random.key(0), cond_xyz, cond_feat, target_xyz,
                         target_feat)
    out = mod.apply(variables, cond_xyz, cond_feat, target_xyz, target_feat)
    assert out.shape == (2, 64, 32)


def test_sa_module_jit_cache():
    xyz, feat = _data(c=4)
    mod = SAModule(npoint=16, mlp_spec=(4, 16, 16, 32), nsample=8, neighbor_def="nn")
    variables = mod.init(jax.random.key(0), xyz, feat)
    f = jax.jit(lambda v, x, ft: mod.apply(v, x, ft))
    out1 = f(variables, xyz, feat)
    out2 = f(variables, xyz, feat)
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))
