"""SAP and latent roofline breakdown on the real chip (VERDICT r4 item 5):
repeat the profile_ae treatment — per-stage wall time + compiled-module
FLOPs/bytes from cost_analysis — for the two stages that had no bytes/step
analysis (SAP train 0.15% MFU, latent train 0.12%, sap_dpsr inference
0.74%).  States bandwidth-vs-latency-vs-flops per component so the next
optimization targets the real bound.

Timing methodology (round-4 operating notes): single-call timings on the
tunnel read the ~27-40 ms per-call sync floor, not the op — every component
here is timed as scan-of-2N minus scan-of-N with the carry chained through a
digest of the op's output (defeats loop-invariant hoisting) and a freshly
salted carry per timed call (defeats identical-re-execution caching); the
sync is an in-graph element fetch.  Train steps reuse
train_throughput._time_steps (same method, state carry).

Writes benchmarks/results/profile_sap_latent.json (incremental prints so a
hang loses nothing).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from benchmarks.tpu_cache import enable_tpu_only_cache  # noqa: E402
enable_tpu_only_cache()

from benchmarks.train_throughput import _cpu_init, _time_steps


def dev_time(fn, x0, n=16, reps=3):
    """DEVICE sec/call of unary `fn` via scan-of-2N-minus-N differencing.

    The carry runs through a scalar digest of fn's output so the body is
    loop-variant (XLA cannot hoist it — the round-2 trap), each timed call
    gets a freshly salted input buffer (the tunnel can serve an identical
    (executable, args) re-execution from cache — round-4 probe_emd), and the
    sync is an in-graph element fetch (block_until_ready alone is not
    trustworthy on this tunnel)."""
    def body(x, _):
        out = fn(x)
        leaves = [l for l in jax.tree.leaves(out)
                  if hasattr(l, "dtype")
                  and jnp.issubdtype(l.dtype, jnp.inexact)]
        s = sum(jnp.mean(l).astype(jnp.float32) for l in leaves)
        return x + (1e-6 * s).astype(x.dtype), None

    times = {}
    for k in (n, 2 * n):
        jfn = jax.jit(lambda x, k=k: jax.lax.scan(body, x, None, length=k)[0])
        jax.block_until_ready(jfn(x0))          # compile + warmup
        ts = []
        for r in range(reps):
            xs = x0 + np.float32(1e-3 * (r + 1))   # fresh, distinct buffer
            jax.block_until_ready(xs)
            t0 = time.perf_counter()
            out = jfn(xs)
            np.asarray(jnp.ravel(out)[0])           # fetch = the real sync
            ts.append(time.perf_counter() - t0)
        times[k] = float(np.min(ts))
    return max(times[2 * n] - times[n], 1e-9) / n


def cost(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    return (float(c.get("flops", 0)) / 1e9,
            float(c.get("bytes accessed", 0)) / 1e9)


class _Res(dict):
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        print(f"{k}: {v:.5f}" if isinstance(v, float) else f"{k}: {v}",
              flush=True)


def profile_sap(res, b=8):
    from slide_tpu.configs import upsampler_config
    from slide_tpu.sap import DPSR
    from slide_tpu.train.driver import (TrainState, build_network,
                                        make_upsampler_train_step)
    from slide_tpu.train.ema import ema_init

    cfg = upsampler_config(batch_size=b)
    ts_cfg = cfg["shapenet_psr_dataset_config"]
    pc = cfg["pointnet_config"]
    dc = cfg["dpsr_config"]
    r = dc["grid_res"]
    dpsr = DPSR((r,) * 3, sig=dc["psr_sigma"])
    net = build_network(pc)
    optimizer = optax.adam(cfg["train_config"]["learning_rate"])
    rates = tuple(cfg["train_config"].get("ema_rate") or ())
    npts = ts_cfg["npoints"]
    in_dim = 3 + pc["in_fea_dim"]
    variables = _cpu_init(net.init, jax.random.key(0),
                          jnp.zeros((2, npts, in_dim)), ts=None,
                          label=jnp.zeros((2,), jnp.int32))
    params = variables["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=_cpu_init(optimizer.init, params),
                       ema=ema_init(params, rates))
    pts = 0.4 * jax.random.normal(jax.random.key(1), (b, npts, 3))
    nrm = jax.random.normal(jax.random.key(2), (b, npts, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    psr = jax.random.normal(jax.random.key(3), (b, r, r, r))
    label = jnp.zeros((b,), jnp.int32)
    batch = {"points": pts, "normals": nrm, "psr": psr, "label": label}

    step = make_upsampler_train_step(net, dpsr, optimizer, rates,
                                     ts_cfg, dc, pc)
    _dt, _loss, detail = _time_steps(step, state, batch, n_steps=6)
    res["sap_train_step_s"] = detail["device_sec_per_step"]
    res["sap_train_dispatch_overhead_s"] = detail["dispatch_overhead_sec"]
    gf, gb = cost(jax.jit(step), state, batch, jax.random.key(7))
    res["sap_train_step_gflops"] = gf
    res["sap_train_step_gbytes"] = gb

    # components: net fwd (displacement prediction), DPSR solve, fwd loss
    from slide_tpu.sap import mirror_and_concat, network_output_to_dpsr_grid
    mirror_first = dc.get("mirror_before_upsampling", False)
    x = jnp.concatenate([pts, nrm], axis=-1)
    if mirror_first:
        x = mirror_and_concat(x, axis=2, num_points=(), attach_label=True,
                              permute=False)[0]

    net_fwd = jax.jit(lambda p, xx: net.apply({"params": p}, xx, ts=None,
                                              label=label))
    res["sap_net_fwd_s"] = dev_time(lambda xx: net_fwd(params, xx), x, n=8)
    gf, gb = cost(net_fwd, params, x)
    res["sap_net_fwd_gflops"] = gf
    res["sap_net_fwd_gbytes"] = gb
    disp = net_fwd(params, x)

    grid_fn = jax.jit(lambda xx, dd: network_output_to_dpsr_grid(
        xx, dd, dpsr, ts_cfg["scale"], pc,
        last_dim_as_indicator=mirror_first,
        only_original_points_split=dc.get("only_original_points_split",
                                          False))[0])
    res["sap_to_grid_s"] = dev_time(lambda dd: grid_fn(x, dd), disp, n=12)
    gf, gb = cost(grid_fn, x, disp)
    res["sap_to_grid_gflops"] = gf
    res["sap_to_grid_gbytes"] = gb

    # raw DPSR solve at the upsampled point count (isolates the FFT stack)
    n_up = int(x.shape[1]) * int(pc.get("point_upsample_factor", 1))
    pts_up = 0.5 + 0.2 * jax.random.normal(jax.random.key(5), (b, n_up, 3))
    nrm_up = jax.random.normal(jax.random.key(6), (b, n_up, 3))
    dpsr_fn = jax.jit(lambda p_, n_: dpsr(p_, n_))
    res["sap_dpsr_solve_s"] = dev_time(lambda p_: dpsr_fn(p_, nrm_up),
                                       pts_up, n=12)
    gf, gb = cost(dpsr_fn, pts_up, nrm_up)
    res["sap_dpsr_solve_gflops"] = gf
    res["sap_dpsr_solve_gbytes"] = gb


def profile_latent(res, b=32):
    from slide_tpu.configs import latent_ddpm_config, autoencoder_config
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.train import build_autoencoder
    from slide_tpu.train.driver import (TrainState, make_latent_train_step,
                                        sample_train_keypoints)
    from slide_tpu.train.ema import ema_init
    from slide_tpu.diffusion.x0 import X0Schedule

    cfg = latent_ddpm_config("airplane", batch_size=b)
    ts_cfg = cfg["shapenet_psr_dataset_config"]
    sdc = cfg["standard_diffusion_config"]
    sched = X0Schedule.from_config(sdc)
    feat_dim = cfg["pointnet_config"]["in_fea_dim"]
    net = ConditionalPointNet2(cfg["pointnet_config"])
    ae = build_autoencoder(autoencoder_config("airplane")["pointnet_config"])
    optimizer = optax.adam(cfg["train_config"]["learning_rate"])
    rates = tuple(cfg["train_config"].get("ema_rate") or ())

    lat_vars = _cpu_init(net.init, jax.random.key(0),
                         jnp.zeros((2, 16, 3 + feat_dim)),
                         ts=jnp.zeros((2,), jnp.int32),
                         label=jnp.zeros((2,), jnp.int32))
    ae_vars = _cpu_init(
        ae.init, {"params": jax.random.key(2), "gaussian": jax.random.key(3),
                  "fps": jax.random.key(4)},
        jnp.zeros((2, 2048, 6)), jnp.zeros((2, 16, 3)),
        label=jnp.zeros((2,), jnp.int32))
    params, ae_params = lat_vars["params"], ae_vars["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=_cpu_init(optimizer.init, params),
                       ema=ema_init(params, rates))
    npts = ts_cfg["npoints"]
    pts = 0.4 * jax.random.normal(jax.random.key(1), (b, npts, 3))
    nrm = jax.random.normal(jax.random.key(2), (b, npts, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    label = jnp.zeros((b,), jnp.int32)
    batch = {"points": pts, "normals": nrm, "label": label}

    step = make_latent_train_step(net, ae, ae_params, sched, sdc,
                                  optimizer, rates, ts_cfg)
    _dt, _loss, detail = _time_steps(step, state, batch, n_steps=12)
    res["lat_train_step_s"] = detail["device_sec_per_step"]
    res["lat_train_dispatch_overhead_s"] = detail["dispatch_overhead_sec"]
    gf, gb = cost(jax.jit(step), state, batch, jax.random.key(7))
    res["lat_train_step_gflops"] = gf
    res["lat_train_step_gbytes"] = gb

    # frozen-AE encode (per-batch cost inside every train step)
    kp = sample_train_keypoints(pts, ts_cfg, jax.random.key(9))
    x6 = jnp.concatenate([pts, nrm], axis=-1)
    enc = jax.jit(lambda xx, kk: ae.apply({"params": ae_params}, xx, kp,
                                          label=label, method=ae.encode,
                                          rngs={"gaussian": kk}))
    res["lat_ae_encode_s"] = dev_time(
        lambda xx: enc(xx, jax.random.key(10)), x6, n=12)
    gf, gb = cost(enc, x6, jax.random.key(10))
    res["lat_ae_encode_gflops"] = gf
    res["lat_ae_encode_gbytes"] = gb

    # denoiser forward at the inference shape (the chain's per-step unit)
    xt = jax.random.normal(jax.random.key(11), (b, 16, 3 + feat_dim))
    tsv = jnp.full((b,), 500, jnp.int32)
    fwd = jax.jit(lambda p, xx: net.apply({"params": p}, xx, ts=tsv,
                                          label=label))
    res["lat_net_fwd_s"] = dev_time(lambda xx: fwd(params, xx), xt, n=32)
    gf, gb = cost(fwd, params, xt)
    res["lat_net_fwd_gflops"] = gf
    res["lat_net_fwd_gbytes"] = gb

    # params footprint: if fwd bytes ~= params bytes * passes, it's weight
    # traffic; if fwd wall >> bytes/bandwidth, it's op-dispatch/latency
    n_param_bytes = sum(x.size * x.dtype.itemsize
                        for x in jax.tree.leaves(params))
    res["lat_param_mbytes"] = n_param_bytes / 1e6

    grad = jax.jit(lambda xx: jax.grad(lambda p: jnp.mean(jnp.square(
        net.apply({"params": p}, xx, ts=tsv, label=label))))(params))
    res["lat_net_grad_s"] = dev_time(grad, xt, n=16)


def main():
    res = _Res()
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("sap", "both"):
        profile_sap(res)
    if which in ("latent", "both"):
        profile_latent(res)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "profile_sap_latent.json")
    with open(out, "w") as f:
        json.dump({k: (round(v, 6) if isinstance(v, float) else v)
                   for k, v in res.items()}, f, indent=1)
    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
