"""Multi-chip sharded generation test on the virtual 8-device mesh
(BASELINE.md config 5: batched generation sharded over a TPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from test_train_e2e import tiny_config
from slide_tpu.data import write_synthetic_shapenet_psr
from slide_tpu.diffusion import calc_diffusion_hyperparams
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.train import make_data_mesh
from slide_tpu.eval import evaluate_per_rank


def test_sharded_generation(tmp_path):
    root = write_synthetic_shapenet_psr(str(tmp_path / "ds"),
                                        categories=("02691156",),
                                        models_per_split=4, num_points=400)
    cfg = tiny_config(root, str(tmp_path / "exp"))
    ts_cfg = dict(cfg["shapenet_psr_dataset_config"],
                  num_samples_tested=12, eval_batch_size=12)  # not /8 -> pads
    net = ConditionalPointNet2(cfg["pointnet_config"])
    variables = net.init(jax.random.key(0), jnp.zeros((1, 16, 3)),
                         ts=jnp.zeros((1,), jnp.int32),
                         label=jnp.zeros((1,), jnp.int32))
    sched = calc_diffusion_hyperparams(5, 1e-4, 0.02)
    mesh = make_data_mesh()
    assert mesh.devices.size == 8
    f = evaluate_per_rank(net, variables["params"], ts_cfg, sched,
                          str(tmp_path / "eval"), "keypoint_generation",
                          mesh=mesh)
    with np.load(f) as d:
        assert d["points"].shape == (12, 16, 3)
        assert np.isfinite(d["points"]).all()

    # same params, single-chip path: distribution-level agreement (same seed
    # gives identical samples since rngs are identical and sharding only
    # changes layout)
    f2 = evaluate_per_rank(net, variables["params"], ts_cfg, sched,
                           str(tmp_path / "eval2"), "keypoint_generation")
    with np.load(f) as d1, np.load(f2) as d2:
        np.testing.assert_allclose(d1["points"], d2["points"], atol=2e-4)


def test_sharded_generation_fused_interpret(tmp_path, monkeypatch):
    """Mesh + fused kernel + T-step scan composition: SLIDE_TPU_FUSED=interpret
    routes sharded generation through make_fused_net_fn(mesh=...) with the
    Pallas kernel in interpret mode; result must match the flax mesh path."""
    monkeypatch.setenv("SLIDE_TPU_FUSED", "interpret")
    root = write_synthetic_shapenet_psr(str(tmp_path / "ds"),
                                        categories=("02691156",),
                                        models_per_split=4, num_points=400)
    cfg = tiny_config(root, str(tmp_path / "exp"))
    ts_cfg = dict(cfg["shapenet_psr_dataset_config"],
                  num_samples_tested=16, eval_batch_size=16)  # 2 per device
    net = ConditionalPointNet2(cfg["pointnet_config"])
    variables = net.init(jax.random.key(0), jnp.zeros((1, 16, 3)),
                         ts=jnp.zeros((1,), jnp.int32),
                         label=jnp.zeros((1,), jnp.int32))
    sched = calc_diffusion_hyperparams(3, 1e-4, 0.02)
    mesh = make_data_mesh()
    f = evaluate_per_rank(net, variables["params"], ts_cfg, sched,
                          str(tmp_path / "eval"), "keypoint_generation",
                          mesh=mesh)
    monkeypatch.setenv("SLIDE_TPU_FUSED", "0")
    f2 = evaluate_per_rank(net, variables["params"], ts_cfg, sched,
                           str(tmp_path / "eval2"), "keypoint_generation",
                           mesh=mesh)
    with np.load(f) as d1, np.load(f2) as d2:
        assert np.isfinite(d1["points"]).all()
        np.testing.assert_allclose(d1["points"], d2["points"], atol=2e-4)
