"""Tests for the small inventory items: append_points_to_keypoints, GroupAll,
checkpoint-selection modes, 5-category batched generation with FastDPM
(BASELINE config 5, CPU mesh)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from slide_tpu.ops.fps import append_points_to_keypoints
from slide_tpu.nn.neighborhood import group_all
from slide_tpu.train.checkpoint import find_max_iter


def test_append_points_to_keypoints():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((2, 40, 3)).astype(np.float32))
    init = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
    out, idx = append_points_to_keypoints(pts, init, 10)
    assert out.shape == (2, 10, 3)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(init), atol=1e-6)
    # appended points come from the cloud
    for b in range(2):
        for r in np.asarray(out)[b, 4:]:
            assert (np.abs(np.asarray(pts)[b] - r).sum(-1) < 1e-5).any()
    # M >= k returns the initial points with -1 indices
    out2, idx2 = append_points_to_keypoints(pts, init, 3)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(init))
    assert (np.asarray(idx2) == -1).all()
    # only the appended tail
    out3, _ = append_points_to_keypoints(pts, init, 10, only_return_appended=True)
    assert out3.shape == (2, 6, 3)


def test_group_all():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.standard_normal((2, 12, 3)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((2, 12, 5)).astype(np.float32))
    g = group_all(xyz, feat)
    assert g.shape == (2, 1, 12, 8)
    np.testing.assert_allclose(np.asarray(g)[..., 5:], np.asarray(xyz)[:, None])
    assert group_all(xyz).shape == (2, 1, 12, 3)
    assert group_all(xyz, feat, use_xyz=False).shape == (2, 1, 12, 5)


def test_find_max_iter_modes(tmp_path):
    d = str(tmp_path / "checkpoint")
    os.makedirs(d)
    for it in (5, 20, 10):
        open(os.path.join(d, f"pointnet_ckpt_{it}.pkl"), "wb").close()
    assert find_max_iter(d) == 20
    assert find_max_iter(d, mode="all") == [20, 10, 5]
    # 'best' resolves ../../eval_result relative to the checkpoint dir
    eval_dir = str(tmp_path / "eval_result")
    os.makedirs(eval_dir)
    with open(os.path.join(eval_dir, "gathered_eval_result.pkl"), "wb") as f:
        pickle.dump({"iter": [5, 20, 10], "avg_cd": [0.5, 0.2, 0.9]}, f)
    nested = str(tmp_path / "x" / "checkpoint")
    os.makedirs(nested)
    assert find_max_iter(nested, mode="best") == 20


def test_five_category_fastdpm_generation(tmp_path):
    """BASELINE config 5: all-category batched generation with FastDPM over
    the (virtual) mesh."""
    from slide_tpu.configs import keypoint_ddpm_config
    from slide_tpu.data import write_synthetic_shapenet_psr, DummyShapesDataset, BatchLoader
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.diffusion import calc_diffusion_hyperparams, fast_sampling
    from slide_tpu.train import make_data_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    root = write_synthetic_shapenet_psr(str(tmp_path / "ds"),
                                        categories=("02691156",),
                                        models_per_split=2, num_points=200)
    cfg = keypoint_ddpm_config("airplane", batch_size=8)
    pc = cfg["pointnet_config"]
    pc["architecture"].update(feature_dim=[16, 32, 32],
                              decoder_feature_dim=[32, 32, 32])
    pc["t_dim"] = 32
    net = ConditionalPointNet2(pc)
    variables = net.init(jax.random.key(0), jnp.zeros((1, 16, 3)),
                         ts=jnp.zeros((1,), jnp.int32),
                         label=jnp.zeros((1,), jnp.int32))
    dc = {"T": 50, "beta_0": 1e-4, "beta_T": 0.02}
    sched = calc_diffusion_hyperparams(**dc)

    # labels across ALL categories from the dummy dataset (no data needed)
    ds = DummyShapesDataset(root, 16, categories=None, seed=0)
    batch = next(iter(BatchLoader(ds, 16, shuffle=False)))
    label = jnp.asarray(batch["label"], jnp.int32)
    assert len(set(batch["category"])) > 3          # multiple categories drawn

    mesh = make_data_mesh()
    data_sh = NamedSharding(mesh, P("data"))
    label = jax.device_put(label, data_sh)

    def net_fn(x, ts):
        return net.apply(variables, x, ts=ts, label=label)

    sample = jax.jit(lambda k: fast_sampling(
        net_fn, k, (16, 16, 3), sched, dc, length=8, sampling_method="var",
        schedule="quadratic", kappa=0.5),
        in_shardings=(None,), out_shardings=data_sh)
    out = sample(jax.random.key(1))
    assert out.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert len(out.sharding.device_set) == 8
