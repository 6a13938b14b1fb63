"""End-to-end tests of the ConditionalPointNet2 denoiser built from the
shipped-equivalent configs, plus diffusion train/sample round trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.configs import keypoint_ddpm_config
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.diffusion import (calc_diffusion_hyperparams,
                                 diffusion_training_loss, diffusion_sampling)


@pytest.fixture(scope="module")
def keypoint_net():
    cfg = keypoint_ddpm_config("airplane")
    net = ConditionalPointNet2(cfg["pointnet_config"])
    x = jnp.zeros((2, 16, 3))
    ts = jnp.zeros((2,), jnp.int32)
    label = jnp.zeros((2,), jnp.int32)
    variables = net.init(jax.random.key(0), x, ts=ts, label=label)
    return net, variables


def test_keypoint_net_forward_shape(keypoint_net):
    net, variables = keypoint_net
    x = jax.random.normal(jax.random.key(1), (4, 16, 3))
    ts = jnp.asarray([0, 10, 500, 999], jnp.int32)
    label = jnp.asarray([0, 3, 7, 12], jnp.int32)
    out = net.apply(variables, x, ts=ts, label=label)
    assert out.shape == (4, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_keypoint_net_param_count(keypoint_net):
    # The reference airplane keypoint model is a small PointNet++ (~1M params);
    # identical channel arithmetic should land in the same ballpark.
    _, variables = keypoint_net
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 2e5 < n < 5e6, n


def test_keypoint_net_t_sensitivity(keypoint_net):
    net, variables = keypoint_net
    x = jax.random.normal(jax.random.key(2), (2, 16, 3))
    label = jnp.zeros((2,), jnp.int32)
    o1 = net.apply(variables, x, ts=jnp.asarray([0, 0]), label=label)
    o2 = net.apply(variables, x, ts=jnp.asarray([999, 999]), label=label)
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_keypoint_net_label_sensitivity(keypoint_net):
    net, variables = keypoint_net
    x = jax.random.normal(jax.random.key(3), (2, 16, 3))
    ts = jnp.asarray([10, 10])
    o1 = net.apply(variables, x, ts=ts, label=jnp.asarray([0, 0]))
    o2 = net.apply(variables, x, ts=ts, label=jnp.asarray([5, 5]))
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_training_loss_and_grad(keypoint_net):
    net, variables = keypoint_net
    sched = calc_diffusion_hyperparams(1000, 1e-4, 0.02)
    x0 = jax.random.normal(jax.random.key(4), (4, 16, 3))
    label = jnp.zeros((4,), jnp.int32)

    @jax.jit
    def loss_fn(params, key):
        net_fn = lambda x, ts: net.apply({"params": params}, x, ts=ts, label=label)
        return diffusion_training_loss(net_fn, key, x0, sched)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"], jax.random.key(5))
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0


def test_sampling_scan(keypoint_net):
    net, variables = keypoint_net
    sched = calc_diffusion_hyperparams(20, 1e-4, 0.02)  # short chain for test
    label = jnp.zeros((3,), jnp.int32)
    net_fn = lambda x, ts: net.apply(variables, x, ts=ts, label=label)
    sample = jax.jit(lambda key: diffusion_sampling(net_fn, key, (3, 16, 3), sched))(
        jax.random.key(6))
    assert sample.shape == (3, 16, 3)
    assert np.isfinite(np.asarray(sample)).all()


def test_sampling_t_slices(keypoint_net):
    net, variables = keypoint_net
    sched = calc_diffusion_hyperparams(20, 1e-4, 0.02)
    label = jnp.zeros((2,), jnp.int32)
    net_fn = lambda x, ts: net.apply(variables, x, ts=ts, label=label)
    x0, slices = diffusion_sampling(net_fn, jax.random.key(7), (2, 16, 3), sched,
                                    t_slices=[5, 10])
    assert set(slices) == {5, 10}
    for v in slices.values():
        assert v.shape == (2, 16, 3)
        assert np.abs(np.asarray(v)).sum() > 0   # actually recorded


def test_sampling_warm_start(keypoint_net):
    net, variables = keypoint_net
    sched = calc_diffusion_hyperparams(20, 1e-4, 0.02)
    label = jnp.zeros((2,), jnp.int32)
    net_fn = lambda x, ts: net.apply(variables, x, ts=ts, label=label)
    xT = jax.random.normal(jax.random.key(8), (2, 16, 3))
    out = diffusion_sampling(net_fn, jax.random.key(9), (2, 16, 3), sched,
                             xT=xT, start_step=10)
    assert out.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
