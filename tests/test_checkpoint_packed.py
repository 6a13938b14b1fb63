"""Packed checkpoint fetch (round 4): save_checkpoint must roundtrip a
mixed-dtype device pytree exactly while fetching one transfer per dtype
(the per-leaf np.asarray path cost minutes/checkpoint on the tunnel —
see slide_tpu/train/checkpoint.py::_fetch_tree)."""

import numpy as np
import jax
import jax.numpy as jnp

from slide_tpu.train.checkpoint import (_fetch_tree, save_checkpoint,
                                        load_checkpoint)


def test_fetch_tree_mixed_dtypes_exact():
    tree = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) * 0.1,
        "b": jnp.ones((5,), jnp.bfloat16) * 1.5,
        "count": jnp.asarray(7, jnp.int32),
        "nested": [jnp.full((2, 2, 2), -3.25, jnp.float32),
                   np.arange(3, dtype=np.float64)],   # host leaf passthrough
        "scalar": 4,
    }
    out = _fetch_tree(tree)
    assert isinstance(out["w"], np.ndarray) and out["w"].dtype == np.float32
    np.testing.assert_array_equal(out["w"], np.asarray(tree["w"]))
    assert out["b"].dtype == jnp.bfloat16 and out["b"].shape == (5,)
    np.testing.assert_array_equal(np.asarray(out["b"], np.float32),
                                  np.full((5,), 1.5, np.float32))
    assert out["count"].shape == () and int(out["count"]) == 7
    np.testing.assert_array_equal(out["nested"][0],
                                  np.asarray(tree["nested"][0]))
    np.testing.assert_array_equal(out["nested"][1], tree["nested"][1])


def test_save_load_roundtrip(tmp_path):
    params = {"k": jnp.linspace(0, 1, 7, dtype=jnp.float32)}
    opt = (jnp.asarray(3, jnp.int32), {"m": jnp.zeros((2, 3), jnp.float32)})
    ema = [{"k": jnp.linspace(1, 2, 7, dtype=jnp.float32)}]
    p = save_checkpoint(str(tmp_path), 42, params, opt, 123,
                        ema_state_list=ema)
    ck = load_checkpoint(str(tmp_path), None)
    assert ck["iter"] == 42 and ck["training_time_seconds"] == 123
    np.testing.assert_array_equal(ck["model_state_dict"]["k"],
                                  np.asarray(params["k"]))
    assert int(jax.tree.leaves(ck["optimizer_state_dict"])[0]) == 3
    np.testing.assert_array_equal(ck["ema_state_list"][0]["k"],
                                  np.asarray(ema[0]["k"]))
    assert p.endswith("pointnet_ckpt_42.pkl")
