"""Measure the REFERENCE's position-DDPM per-step sampling cost on this host's
CPU (torch eager), to anchor bench.py's `vs_baseline` to a measurement instead
of a guess (VERDICT r1 weak #2).

What runs: the reference `PointNet2CloudCondition` built from the SHIPPED
airplane keypoint config (`ddpm_keypoint_training_configs/..._airplane_
02691156.json`), driven by the exact per-step body of `util.sampling`
(`/root/reference/pointnet2/util.py:235-253`) — net forward + x-update — in a
python loop, batch 200, K=16 points.  The reference loop itself calls
`.cuda()`, so the loop body is re-typed here verbatim minus device moves; the
model code is the reference's own.

The reference's CUDA extension and pytorch3d are not in this image; we install
*working* torch-CPU implementations of the handful of native ops the forward
needs (FPS / gather / group / three_nn+interpolate / knn_points).  These are
ordinary torch ops, representative of eager dispatch cost.

Also measures OUR flax forward in the same eager-style python loop on the same
CPU for a same-hardware framework comparison.

Output: one JSON line; commit the result as benchmarks/reference_baseline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["JAX_PLATFORMS"] = "cpu"

import torch

_REF_OPS_LIB = "/root/reference/pointnet2_ops_lib"
_REF_PNET2 = "/root/reference/pointnet2"
_REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# working torch-CPU implementations of the reference's native ops

def _fps(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    b, n, _ = xyz.shape
    idx = torch.zeros(b, npoint, dtype=torch.int32)
    dist = torch.full((b, n), 1e10)
    farthest = torch.zeros(b, dtype=torch.long)
    ar = torch.arange(b)
    for i in range(npoint):
        idx[:, i] = farthest.int()
        centroid = xyz[ar, farthest][:, None]
        d = ((xyz - centroid) ** 2).sum(-1)
        dist = torch.minimum(dist, d)
        farthest = dist.argmax(-1)
    return idx


def _gather_points(features: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    # features (B,C,N), idx (B,m) -> (B,C,m)
    b, c, _ = features.shape
    return torch.gather(features, 2,
                        idx.long().unsqueeze(1).expand(b, c, idx.shape[1]))


def _group_points(features: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    # features (B,C,N), idx (B,m,K) -> (B,C,m,K)
    b, c, _ = features.shape
    _, m, k = idx.shape
    flat = idx.long().reshape(b, 1, m * k).expand(b, c, m * k)
    return torch.gather(features, 2, flat).reshape(b, c, m, k)


def _three_nn(unknown: torch.Tensor, known: torch.Tensor):
    d2 = torch.cdist(unknown, known) ** 2
    dist2, idx = torch.topk(d2, 3, dim=-1, largest=False, sorted=True)
    return dist2, idx.int()


def _three_interpolate(features: torch.Tensor, idx: torch.Tensor,
                       weight: torch.Tensor) -> torch.Tensor:
    # features (B,C,m), idx (B,n,3), weight (B,n,3) -> (B,C,n)
    g = _group_points(features, idx)             # (B,C,n,3)
    return (g * weight.unsqueeze(1)).sum(-1)


def _ball_query(new_xyz, xyz, radius, nsample):
    d2 = torch.cdist(new_xyz, xyz) ** 2
    within = d2 <= radius * radius
    counts = within.sum(-1).clamp(max=nsample).int()
    order = torch.argsort((~within).float() * 1e6
                          + torch.arange(xyz.shape[1])[None, None], dim=-1)
    idx = order[..., :nsample]
    first = idx[..., :1]
    k_in = torch.arange(nsample)[None, None]
    idx = torch.where(k_in < counts.long().unsqueeze(-1), idx, first)
    return idx.int(), counts


def _knn_points(x, y, K=1, lengths1=None, lengths2=None, return_nn=False,
                return_sorted=True, **kw):
    d2 = torch.cdist(x, y) ** 2
    if lengths2 is not None:
        n2 = y.shape[1]
        mask = torch.arange(n2)[None, None] >= lengths2[:, None, None]
        d2 = d2.masked_fill(mask, float("inf"))
    dists, idx = torch.topk(d2, K, dim=-1, largest=False, sorted=True)
    nn = None
    if return_nn:
        b, n1, _ = x.shape
        nn = torch.gather(
            y.unsqueeze(1).expand(b, n1, y.shape[1], y.shape[2]), 2,
            idx.unsqueeze(-1).expand(b, n1, K, y.shape[2]))
    return dists, idx, nn


def _knn_gather(y, idx):
    # y (B,M,C), idx (B,N,K) -> (B,N,K,C)
    b, n, k = idx.shape
    c = y.shape[2]
    return torch.gather(
        y.unsqueeze(1).expand(b, n, y.shape[1], c), 2,
        idx.unsqueeze(-1).expand(b, n, k, c))


def install_stubs():
    for p in (_REF_OPS_LIB, _REF_PNET2, _REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    ext = types.ModuleType("pointnet2_ops._ext")
    ext.furthest_point_sampling = _fps
    ext.gather_points = _gather_points
    ext.group_points = _group_points
    ext.three_nn = _three_nn
    ext.three_interpolate = _three_interpolate
    ext.ball_query = _ball_query
    sys.modules["pointnet2_ops._ext"] = ext
    p3d = types.ModuleType("pytorch3d")
    p3d_ops = types.ModuleType("pytorch3d.ops")
    p3d_knn = types.ModuleType("pytorch3d.ops.knn")
    p3d_knn.knn_points = _knn_points
    p3d_knn.knn_gather = _knn_gather
    p3d_ops.knn = p3d_knn
    p3d_ops.knn_points = _knn_points
    p3d.ops = p3d_ops
    sys.modules.setdefault("pytorch3d", p3d)
    sys.modules["pytorch3d"].ops = p3d_ops
    sys.modules["pytorch3d.ops"] = p3d_ops
    sys.modules["pytorch3d.ops.knn"] = p3d_knn


def reference_steps_per_sec(batch=200, k_pts=16, t_steps=10, warmup=2):
    install_stubs()
    from data_utils.json_reader import restore_string_to_list_in_a_dict
    cfg_path = os.path.join(
        _REF_PNET2, "configs/shapenet_psr_configs/ddpm_keypoint_training_configs",
        "config_standard_attention_batchsize_32_s3_ema_model_keypoint_airplane_02691156.json")
    with open(cfg_path) as f:
        config = json.load(f)
    config = restore_string_to_list_in_a_dict(config)
    from models.pointnet2_with_pcld_condition import PointNet2CloudCondition
    net = PointNet2CloudCondition(config["pointnet_config"]).eval()

    # diffusion constants (util.py:167-194, linear beta), T=1000; we time a
    # contiguous slice of reverse steps — per-step cost is t-independent
    T = 1000
    beta = torch.linspace(1e-4, 0.02, T)
    alpha = 1 - beta
    alpha_bar = torch.cumprod(alpha, 0)
    beta_tilde = beta.clone()
    beta_tilde[1:] *= (1 - alpha_bar[:-1]) / (1 - alpha_bar[1:])
    sigma = torch.sqrt(beta_tilde)

    label = torch.zeros(batch, dtype=torch.long)
    x = torch.randn(batch, k_pts, 3)
    times = []
    with torch.no_grad():
        for j, t in enumerate(range(T - 1, T - 1 - (t_steps + warmup), -1)):
            t0 = time.perf_counter()
            ts = t * torch.ones(batch)
            eps = net(x, ts=ts, label=label)                    # util.py:244
            x = (x - (1 - alpha[t]) / torch.sqrt(1 - alpha_bar[t]) * eps) \
                / torch.sqrt(alpha[t])                          # util.py:249
            if t > 0:
                x = x + sigma[t] * torch.randn(x.shape)         # util.py:253
            dt = time.perf_counter() - t0
            if j >= warmup:
                times.append(dt)
    assert torch.isfinite(x).all()
    return 1.0 / float(np.mean(times)), float(np.mean(times))


def ours_cpu_steps_per_sec(batch=200, k_pts=16, t_steps=10, warmup=2):
    """Our flax forward, same eager-style python loop, same host CPU.
    (Our production path is a jitted lax.scan; this isolates the framework
    comparison at identical hardware + loop structure.)"""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from slide_tpu.configs import keypoint_ddpm_config
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.diffusion import calc_diffusion_hyperparams

    cfg = keypoint_ddpm_config("airplane")
    net = ConditionalPointNet2(cfg["pointnet_config"])
    label = jnp.zeros((batch,), jnp.int32)
    variables = net.init(jax.random.key(0), jnp.zeros((2, k_pts, 3)),
                         ts=jnp.zeros((2,), jnp.int32),
                         label=jnp.zeros((2,), jnp.int32))
    sched = calc_diffusion_hyperparams(1000, 1e-4, 0.02)
    alpha, alpha_bar, sigma = (np.asarray(sched.alpha),
                               np.asarray(sched.alpha_bar),
                               np.asarray(sched.sigma))
    fwd = jax.jit(lambda xx, ts: net.apply(variables, xx, ts=ts, label=label))

    key = jax.random.key(1)
    x = jax.random.normal(key, (batch, k_pts, 3))
    times = []
    for j, t in enumerate(range(999, 999 - (t_steps + warmup), -1)):
        t0 = time.perf_counter()
        ts = jnp.full((batch,), t, jnp.int32)
        eps = fwd(x, ts)
        x = (x - (1 - alpha[t]) / np.sqrt(1 - alpha_bar[t]) * eps) \
            / np.sqrt(alpha[t])
        key, sub = jax.random.split(key)
        x = x + sigma[t] * jax.random.normal(sub, x.shape)
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        if j >= warmup:
            times.append(dt)
    return 1.0 / float(np.mean(times)), float(np.mean(times))


def count_reference_dispatches(batch=200):
    """Count aten op dispatches of one reference forward (kp and latent nets)
    with torch.profiler — the input to the eager-mode dispatch-bound ceiling
    used as an honest (reference-favoring) A100 baseline in bench.py."""
    install_stubs()
    from torch.profiler import profile, ProfilerActivity
    from data_utils.json_reader import restore_string_to_list_in_a_dict
    from models.pointnet2_with_pcld_condition import PointNet2CloudCondition

    def _count(cfg_rel, in_dim):
        with open(os.path.join(_REF_PNET2, "configs/shapenet_psr_configs",
                               cfg_rel)) as f:
            cfg = restore_string_to_list_in_a_dict(json.load(f))
        net = PointNet2CloudCondition(cfg["pointnet_config"]).eval()
        x = torch.randn(batch, 16, in_dim)
        ts, label = torch.ones(batch), torch.zeros(batch, dtype=torch.long)
        with torch.no_grad():
            net(x, ts=ts, label=label)
            with profile(activities=[ProfilerActivity.CPU]) as prof:
                net(x, ts=ts, label=label)
        return sum(e.count for e in prof.key_averages()
                   if e.key.startswith("aten::"))

    kp = _count("ddpm_keypoint_training_configs/config_standard_attention_"
                "batchsize_32_s3_ema_model_keypoint_airplane_02691156.json", 3)
    lat = _count("latent_ddpm_training_configs/config_latent_ddpm_s3_dim_16_32"
                 "_ae_kp_noise_0.04_keypoint_conditional_airplane_ae_trained_"
                 "on_airplane.json", 51)
    return kp, lat


def measure_dispatch_overhead_us(n=20000):
    """Per-op eager dispatch cost on this host for a tiny tensor op."""
    a = torch.randn(8)
    with torch.no_grad():
        for _ in range(1000):
            a.add(1.0)
        t0 = time.perf_counter()
        for _ in range(n):
            a.add(1.0)
        return (time.perf_counter() - t0) / n * 1e6


def main():
    t_steps = int(os.environ.get("BASELINE_STEPS", "10"))
    ref_sps, ref_dt = reference_steps_per_sec(t_steps=t_steps)
    ours_sps, ours_dt = ours_cpu_steps_per_sec(t_steps=t_steps)
    kp_ops, lat_ops = count_reference_dispatches()
    disp_us = measure_dispatch_overhead_us()
    out = {
        "workload": "position-DDPM reverse step, batch 200, K=16 (README.md:83-90)",
        "host": "cpu (torch eager reference vs jitted flax forward)",
        "reference_torch_cpu_steps_per_sec": round(ref_sps, 3),
        "reference_torch_cpu_sec_per_step": round(ref_dt, 4),
        "ours_flax_cpu_steps_per_sec": round(ours_sps, 3),
        "ours_flax_cpu_sec_per_step": round(ours_dt, 4),
        "cpu_count": os.cpu_count(),
        "torch_threads": torch.get_num_threads(),
        # eager dispatch-bound ceiling inputs (see bench.py docstring)
        "kp_net_aten_dispatches_per_forward": kp_ops,
        "latent_net_aten_dispatches_per_forward": lat_ops,
        "per_op_dispatch_us": round(disp_us, 3),
        "a100_eager_ceiling_steps_per_sec_kp": round(1e6 / (kp_ops * disp_us), 1),
        "a100_eager_ceiling_steps_per_sec_latent": round(1e6 / (lat_ops * disp_us), 1),
    }
    print(json.dumps(out))
    with open(os.path.join(_REPO, "benchmarks", "reference_baseline.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
