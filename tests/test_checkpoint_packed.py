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


def test_fetch_tree_chunked_and_mixed_device(monkeypatch):
    """ADVICE r4: packing must bound the transient device copy (chunking)
    and must not mix leaves committed to different devices in one
    concatenate."""
    import slide_tpu.train.checkpoint as ckpt_mod
    monkeypatch.setattr(ckpt_mod, "_PACK_CHUNK_BYTES", 64)  # force chunking
    devs = jax.devices()
    tree = {
        "a": jax.device_put(jnp.arange(10, dtype=jnp.float32), devs[0]),
        "b": jax.device_put(jnp.arange(10, 20, dtype=jnp.float32),
                            devs[-1]),   # different device when multi-dev
        "c": jax.device_put(jnp.arange(30, dtype=jnp.float32), devs[0]),
        "d": jax.device_put(jnp.arange(6, dtype=jnp.int32), devs[0]),
    }
    out = ckpt_mod._fetch_tree(tree)
    for k in tree:
        np.testing.assert_array_equal(out[k], np.asarray(tree[k]))
        assert isinstance(out[k], np.ndarray)


def test_mirror_and_restore(tmp_path):
    """Durable-mirror semantics (VERDICT r4 item 1a): every save is mirrored,
    older mirrors are pruned, and restore_from_mirror repopulates a wiped
    experiment dir with the newest mirrored checkpoint."""
    from slide_tpu.train.checkpoint import (mirror_checkpoint,
                                            restore_from_mirror,
                                            find_max_iter)
    exp = tmp_path / "exp"
    durable = tmp_path / "durable"
    params = {"k": jnp.arange(4, dtype=jnp.float32)}
    for it in (9, 19):
        p = save_checkpoint(str(exp), it, params, (), 1)
        mirror_checkpoint(p, str(durable))
    # prune: only the newest mirror remains
    import os
    assert sorted(os.listdir(durable)) == ["pointnet_ckpt_19.pkl"]
    # wipe the experiment dir (the VM-reset scenario) and restore
    import shutil
    shutil.rmtree(exp)
    restored = restore_from_mirror(str(exp), str(durable))
    assert restored and restored.endswith("pointnet_ckpt_19.pkl")
    assert find_max_iter(str(exp)) == 19
    ck = load_checkpoint(str(exp))
    np.testing.assert_array_equal(ck["model_state_dict"]["k"],
                                  np.asarray(params["k"]))
    # no-op when the experiment dir already has checkpoints
    assert restore_from_mirror(str(exp), str(durable)) is None


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
