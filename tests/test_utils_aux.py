"""Tests for auxiliary subsystems: scalar logging, step timing, neighbor-stat
observability, multi-host batch assembly."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from slide_tpu.utils import (ScalarLogger, AverageMeter, StepTimer, print_size,
                             param_count)
from slide_tpu.parallel import global_batch_from_local, world_info
from slide_tpu.train import make_data_mesh


def test_scalar_logger_and_plot(tmp_path):
    lg = ScalarLogger(str(tmp_path))
    for i in range(5):
        lg.scalar("loss", 1.0 / (i + 1), step=i)
    lg.scalar("other", 3.0, step=0)
    lg.close()
    with open(lg.path) as f:
        recs = [json.loads(line) for line in f]
    assert len(recs) == 6
    png = ScalarLogger(str(tmp_path)).plot("loss")
    assert os.path.isfile(png)


def test_average_meter():
    m = AverageMeter("x")
    m.update(2.0, n=2)
    m.update(5.0, n=1)
    assert abs(m.avg - 3.0) < 1e-9
    assert m.count == 3


def test_step_timer():
    t = StepTimer(skip_first=1)
    for _ in range(4):
        with t:
            sum(range(1000))
    s = t.summary()
    assert s["n"] == 3
    assert s["steps_per_sec"] > 0


def test_param_count():
    params = {"a": {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}}
    assert param_count(params) == 16
    assert print_size(params, "tiny") == 16


def test_neighbor_stats_observability():
    from slide_tpu.nn import SAModule
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((2, 64, 4)).astype(np.float32))
    mod = SAModule(npoint=16, mlp_spec=(4, 16, 16, 32), nsample=8,
                   neighbor_def="radius", radius=0.8,
                   record_neighbor_stats=True)
    variables = mod.init(jax.random.key(0), xyz, feat)
    (_, _), stats = mod.apply(variables, xyz, feat,
                              mutable=["neighbor_stats"])
    flat = jax.tree_util.tree_leaves(stats["neighbor_stats"])
    assert flat, "neighbor stats were not recorded"
    mmm = np.asarray(flat[0])
    assert mmm.shape[-1] in (3, 11)
    # counts bounded by nsample
    assert mmm.max() <= 8


def test_global_batch_from_local_single_process():
    mesh = make_data_mesh()
    assert world_info()[1] == 1     # single process in tests
    batch = {"points": np.ones((8, 16, 3), np.float32),
             "label": np.zeros((8,), np.int64),
             "category": ["02691156"] * 8}
    out = global_batch_from_local(mesh, batch)
    assert out["points"].shape == (8, 16, 3)
    assert out["category"] == ["02691156"] * 8
    # array is sharded over the data axis
    assert len(out["points"].sharding.device_set) == mesh.devices.size


def test_assert_tree_finite():
    import pytest
    from slide_tpu.utils import assert_tree_finite, tree_nonfinite_paths
    good = {"a": jnp.ones((2,)), "b": {"c": jnp.zeros((3,))}}
    assert_tree_finite(good)
    bad = {"a": jnp.ones((2,)), "b": {"c": jnp.asarray([1.0, np.nan])}}
    paths = tree_nonfinite_paths(bad)
    assert len(paths) == 1 and "c" in paths[0]
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_tree_finite(bad, "params")
