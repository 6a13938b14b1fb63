"""PVCNN2 backbone tests (shapes, grad, t/condition sensitivity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.models.pvcnn import PVCNN2, PVConv


@pytest.fixture(scope="module")
def tiny_pvcnn():
    net = PVCNN2(out_dim=3, embed_dim=16, use_att=True,
                 sa_blocks=(((8, 1, 8), (64, 0.2, 8, (8, 16))),
                            (None, (4, 0.4, 8, (16, 32)))),
                 fp_blocks=(((16, 16), (16, 1, 8)), ((8, 8), (8, 1, 8))))
    x = jax.random.normal(jax.random.key(0), (2, 128, 3)) * 0.4
    cond = jax.random.normal(jax.random.key(1), (2, 32, 3)) * 0.4
    ts = jnp.asarray([3, 7])
    variables = net.init(jax.random.key(2), x, cond, ts)
    return net, variables, x, cond, ts


def test_pvcnn_output_cropped_to_noisy_part(tiny_pvcnn):
    net, variables, x, cond, ts = tiny_pvcnn
    out = net.apply(variables, x, cond, ts)
    assert out.shape == (2, 128, 3)        # condition part cropped
    assert np.isfinite(np.asarray(out)).all()


def test_pvcnn_t_sensitivity(tiny_pvcnn):
    net, variables, x, cond, _ = tiny_pvcnn
    o1 = net.apply(variables, x, cond, jnp.asarray([0, 0]))
    o2 = net.apply(variables, x, cond, jnp.asarray([900, 900]))
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_pvcnn_condition_sensitivity(tiny_pvcnn):
    net, variables, x, cond, ts = tiny_pvcnn
    o1 = net.apply(variables, x, cond, ts)
    o2 = net.apply(variables, x, cond + 0.5, ts)
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_pvcnn_grad(tiny_pvcnn):
    net, variables, x, cond, ts = tiny_pvcnn

    def loss(params):
        return jnp.mean(net.apply({"params": params}, x, cond, ts) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_pvconv_fuses_voxel_and_point_branches():
    conv = PVConv(out_channels=8, resolution=4, attention=False, with_se=True,
                  dropout=None)
    feats = jax.random.normal(jax.random.key(0), (2, 64, 5))
    coords = jax.random.normal(jax.random.key(1), (2, 64, 3))
    variables = conv.init(jax.random.key(2), feats, coords)
    out = conv.apply(variables, feats, coords)
    assert out.shape == (2, 64, 8)
    assert {"vconv_1", "vconv_2", "point_features", "se"} <= set(
        variables["params"].keys())
