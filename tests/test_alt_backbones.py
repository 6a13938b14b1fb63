"""Tests for the alternative backbones: PointwiseNet parity against the
reference torch implementation, and the PVCNN voxelization ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.models.pointwise_net import (PointwiseNet, get_pointwise_net,
                                            variance_schedule)
from slide_tpu.ops.voxel import (avg_voxelize, trilinear_devoxelize,
                                 normalize_coords_for_voxelization)

torch = pytest.importorskip("torch")


def test_variance_schedule_matches_reference():
    from torch_ref import load_reference_modules
    load_reference_modules()
    import models.pointwise_net as ref_pw
    ref = ref_pw.VarianceSchedule(100, 1e-4, 0.05)
    mine = variance_schedule(100, 1e-4, 0.05)
    np.testing.assert_allclose(np.asarray(mine["betas"]), ref.betas.numpy(),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(mine["alpha_bars"]),
                               ref.alpha_bars.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mine["sigmas_inflex"]),
                               ref.sigmas_inflex.numpy(), atol=1e-6)


def test_pointwise_net_parity():
    """Full-weight-copy parity against the reference PointwiseNet."""
    from torch_ref import load_reference_modules, _conv_kernel, copy_shared_mlp, _set
    load_reference_modules()
    import models.pointwise_net as ref_pw
    args = {"residual": True, "num_steps": 50, "beta_1": 1e-4, "beta_T": 0.05,
            "mode": "linear",
            "pnet_global_feature_architecture": [[4, 16, 16], [32, 32]],
            "global_feature_remove_last_activation": False}
    ref = ref_pw.get_pointwise_net(dict(args))
    ref.eval()
    mine = get_pointwise_net(args)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 3)).astype(np.float32)
    cond = rng.standard_normal((2, 30, 4)).astype(np.float32)
    ts = np.array([3, 40])
    variables = mine.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(cond),
                          jnp.asarray(ts))
    params = jax.tree.map(np.array, variables["params"])
    # copy pnet (bn=False -> convs only)
    for stage, tmlp in (("mlp1", ref.global_pnet.mlp1), ("mlp2", ref.global_pnet.mlp2)):
        _set(params["global_pnet"][stage], ["conv_1", "kernel"],
             _conv_kernel(tmlp.first_mlp[0]))
        _set(params["global_pnet"][stage], ["conv_1", "bias"],
             tmlp.first_mlp[0].bias.detach().numpy())
        _set(params["global_pnet"][stage], ["conv_2", "kernel"],
             _conv_kernel(tmlp.second_mlp[0]))
        _set(params["global_pnet"][stage], ["conv_2", "bias"],
             tmlp.second_mlp[0].bias.detach().numpy())
    for i, tl in enumerate(ref.layers):
        p = params[f"layers_{i}"]
        _set(p, ["layer", "kernel"], _conv_kernel(tl._layer))
        _set(p, ["layer", "bias"], tl._layer.bias.detach().numpy())
        _set(p, ["hyper_gate", "kernel"], _conv_kernel(tl._hyper_gate))
        _set(p, ["hyper_gate", "bias"], tl._hyper_gate.bias.detach().numpy())
        _set(p, ["hyper_bias", "kernel"], _conv_kernel(tl._hyper_bias))
    got = np.asarray(mine.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(cond), jnp.asarray(ts)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(cond),
                   torch.from_numpy(ts)).numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_avg_voxelize_mean_semantics():
    feats = jnp.asarray(np.array([[[1.0], [3.0], [10.0]]], np.float32))
    coords = jnp.asarray(np.array([[[0, 0, 0], [0, 0, 0.4], [1, 1, 1]]], np.float32))
    grid = avg_voxelize(feats, coords, 2)
    assert grid.shape == (1, 2, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(grid)[0, 0, 0, 0, 0], 2.0)  # mean(1,3)
    np.testing.assert_allclose(np.asarray(grid)[0, 1, 1, 1, 0], 10.0)
    np.testing.assert_allclose(np.asarray(grid)[0, 0, 1, 0, 0], 0.0)  # empty -> 0


def test_trilinear_devoxelize_exact_at_corners():
    rng = np.random.default_rng(1)
    grid = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 5)).astype(np.float32))
    # integer coords -> exact grid values
    coords = jnp.asarray(np.array([[[0, 0, 0], [3, 3, 3], [1, 2, 3]]] * 2,
                                  np.float32))
    out = np.asarray(trilinear_devoxelize(grid, coords))
    g = np.asarray(grid)
    np.testing.assert_allclose(out[0, 0], g[0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], g[0, 3, 3, 3], atol=1e-6)
    np.testing.assert_allclose(out[1, 2], g[1, 1, 2, 3], atol=1e-6)
    # midpoint interpolates
    mid = np.asarray(trilinear_devoxelize(grid, jnp.asarray(
        np.array([[[0.5, 0, 0]]] * 2, np.float32))))
    np.testing.assert_allclose(mid[0, 0], (g[0, 0, 0, 0] + g[0, 1, 0, 0]) / 2,
                               atol=1e-6)


def test_voxelize_devoxelize_roundtrip_grad():
    rng = np.random.default_rng(2)
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    coords = normalize_coords_for_voxelization(xyz, 8)
    assert float(coords.min()) >= 0 and float(coords.max()) <= 7

    def f(feats):
        grid = avg_voxelize(feats, coords, 8)
        return jnp.sum(trilinear_devoxelize(grid, coords) ** 2)

    g = jax.grad(f)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
