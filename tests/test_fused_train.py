"""Differentiable fused denoiser (make_fused_train_fn): gradient parity with
the flax path, the Pallas backward kernel in interpret mode, and the
shard_map/mesh variant on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.configs import keypoint_ddpm_config, latent_ddpm_config
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.models.fused_denoiser import make_fused_train_fn


def _setup(cfg_fn, din, b=8, n=16):
    cfg = cfg_fn("airplane")["pointnet_config"]
    net = ConditionalPointNet2(cfg)
    x = jax.random.normal(jax.random.key(1), (b, n, din)) * 0.5
    ts = jnp.asarray(np.random.default_rng(0).integers(0, 1000, b), jnp.int32)
    lbl = jnp.asarray(np.random.default_rng(1).integers(0, 13, b), jnp.int32)
    variables = net.init(jax.random.key(0), x, ts=ts, label=lbl)
    return cfg, net, variables, x, ts, lbl


def _loss_pair(net, fused, x, ts, lbl):
    tgt = jnp.ones_like(x) * 0.3

    def flax_loss(params):
        out = net.apply({"params": params}, x, ts=ts, label=lbl)
        return jnp.mean((out - tgt) ** 2)

    def fused_loss(params):
        return jnp.mean((fused(params, x, ts, lbl) - tgt) ** 2)

    return flax_loss, fused_loss


def _assert_tree_close(a, b, rtol, atol):
    fa, _ = jax.tree.flatten_with_path(a)
    fb, _ = jax.tree.flatten_with_path(b)
    assert len(fa) == len(fb)
    for (pa, va), (_, vb) in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=rtol, atol=atol,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("cfg_fn,din", [(keypoint_ddpm_config, 3),
                                        (latent_ddpm_config, 51)])
def test_fused_grads_match_flax_jnp_path(cfg_fn, din):
    cfg, net, variables, x, ts, lbl = _setup(cfg_fn, din)
    fused = make_fused_train_fn(cfg, 16, use_pallas=False)
    assert fused is not None
    flax_loss, fused_loss = _loss_pair(net, fused, x, ts, lbl)
    l1, g1 = jax.value_and_grad(flax_loss)(variables["params"])
    l2, g2 = jax.value_and_grad(fused_loss)(variables["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    _assert_tree_close(g2, g1, rtol=5e-3, atol=1e-4)


def test_pallas_backward_kernel_interpret_matches_jnp():
    cfg, net, variables, x, ts, lbl = _setup(keypoint_ddpm_config, 3)
    ref = make_fused_train_fn(cfg, 16, use_pallas=False)
    ker = make_fused_train_fn(cfg, 16, block_b=4, use_pallas=True,
                              interpret=True)
    _, ref_loss = _loss_pair(net, ref, x, ts, lbl)
    _, ker_loss = _loss_pair(net, ker, x, ts, lbl)
    l1, g1 = jax.value_and_grad(ref_loss)(variables["params"])
    l2, g2 = jax.value_and_grad(ker_loss)(variables["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    _assert_tree_close(g2, g1, rtol=1e-4, atol=1e-6)


def test_mesh_shard_map_variant_matches_single_device():
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))
    cfg, net, variables, x, ts, lbl = _setup(keypoint_ddpm_config, 3, b=16)
    ref = make_fused_train_fn(cfg, 16, use_pallas=False)
    dist = make_fused_train_fn(cfg, 16, block_b=2, use_pallas=True,
                               interpret=True, mesh=mesh)
    _, ref_loss = _loss_pair(net, ref, x, ts, lbl)
    _, dist_loss = _loss_pair(net, dist, x, ts, lbl)
    l1, g1 = jax.value_and_grad(ref_loss)(variables["params"])
    l2, g2 = jax.value_and_grad(dist_loss)(variables["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    # psum/tile accumulation order differs from the single-device sum; the
    # tight numerical checks live in the single-device tests above — this
    # one guards the shard_map plumbing (a missing psum would be off by 8x)
    _assert_tree_close(g2, g1, rtol=1e-3, atol=2e-4)


def test_fused_train_fn_gating():
    cfg = keypoint_ddpm_config("airplane")["pointnet_config"]
    assert make_fused_train_fn(cfg, 2048) is None       # npoint < N
    bad = dict(cfg)
    bad["bn_first"] = True
    assert make_fused_train_fn(bad, 16) is None


def test_mesh_fused_net_fn_matches_single_device():
    """Inference fused path (make_fused_net_fn) under shard_map on the data
    mesh — the sharded-generation wiring in eval/generation.py."""
    from jax.sharding import Mesh
    from slide_tpu.models.fused_denoiser import make_fused_net_fn

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))
    cfg, net, variables, x, ts, lbl = _setup(keypoint_ddpm_config, 3, b=16)
    ref = make_fused_net_fn(cfg, variables["params"], 16, use_pallas=False)
    dist = make_fused_net_fn(cfg, variables["params"], 16, block_b=2,
                             use_pallas=True, interpret=True, mesh=mesh)
    assert dist.block_b == 8 and dist.batch_ok(16) and not dist.batch_ok(12)
    out_ref = ref(x, ts, lbl)
    out_dist = dist(x, ts, lbl)
    # per-shard tiling changes f32 accumulation order slightly
    np.testing.assert_allclose(np.asarray(out_dist), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
