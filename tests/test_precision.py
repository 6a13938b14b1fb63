"""bf16 activation mode (nn/precision.py): params stay f32, activations run
bf16, neighbor distances stay f32, and a train step stays finite.  No
reference counterpart (the reference trains pure f32); this is the TPU
bandwidth answer to its training-throughput story."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slide_tpu.nn import precision as mp
from slide_tpu.nn.precision import activation_dtype_scope


def test_dense_dtype_follows_scope():
    x = jnp.ones((2, 8))
    layer = mp.Dense(4)
    params = layer.init(jax.random.key(0), x)
    assert params["params"]["kernel"].dtype == jnp.float32
    assert layer.apply(params, x).dtype == jnp.float32

    with activation_dtype_scope("bfloat16"):
        layer16 = mp.Dense(4)
    p16 = layer16.init(jax.random.key(0), x)
    assert p16["params"]["kernel"].dtype == jnp.float32  # params stay f32
    assert layer16.apply(p16, x).dtype == jnp.bfloat16


def test_groupnorm_bf16_output_f32_scale():
    x = jnp.ones((2, 5, 8))
    with activation_dtype_scope("bfloat16"):
        gn = mp.GroupNorm(num_groups=2)
    p = gn.init(jax.random.key(0), x)
    assert p["params"]["scale"].dtype == jnp.float32
    assert gn.apply(p, x).dtype == jnp.bfloat16


def test_unknown_name_raises():
    with pytest.raises(ValueError):
        mp.set_activation_dtype("float8")


def test_sqdist_stays_f32_under_bf16():
    from slide_tpu.ops.neighbors import pairwise_sqdist
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 3)),
                    jnp.bfloat16)
    d = pairwise_sqdist(x, x)
    assert d.dtype == jnp.float32


def test_ae_train_step_finite_bf16():
    import optax
    from slide_tpu.configs import autoencoder_config
    from slide_tpu.train import build_autoencoder
    from slide_tpu.train.driver import TrainState, make_ae_train_step
    from slide_tpu.train.ema import ema_init

    b, npts = 2, 1024       # smallest cloud the encoder tower accepts
    cfg = autoencoder_config("airplane", batch_size=b)
    ts_cfg = dict(cfg["shapenet_psr_dataset_config"], npoints=npts)
    with activation_dtype_scope("bfloat16"):
        ae = build_autoencoder(cfg["pointnet_config"])
        variables = ae.init({"params": jax.random.key(3),
                             "gaussian": jax.random.key(4),
                             "fps": jax.random.key(5)},
                            jnp.zeros((2, npts, 6)), jnp.zeros((2, 16, 3)),
                            label=jnp.zeros((2,), jnp.int32))
        optimizer = optax.adam(2e-4)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           opt_state=optimizer.init(variables["params"]),
                           ema=ema_init(variables["params"], ()))
        step = jax.jit(make_ae_train_step(ae, optimizer, (), ts_cfg))
        batch = {"points": jax.random.normal(jax.random.key(1), (b, npts, 3)),
                 "normals": jax.random.normal(jax.random.key(2), (b, npts, 3)),
                 "label": jnp.zeros((b,), jnp.int32)}
        st, loss = step(state, batch, jax.random.key(7))
    assert np.isfinite(float(loss))
    # params and optimizer state remain f32
    leaf = jax.tree_util.tree_leaves(st.params)[0]
    assert leaf.dtype == jnp.float32
