"""AE train-step breakdown on the real chip (VERDICT r2 item 3): time the
full step, forward+loss, encode, decode, and the chamfer loss separately,
plus compiled-module flops/bytes, to locate the bottleneck before
optimizing.  One-off diagnostic; numbers land in the session notes."""

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

from benchmarks.train_throughput import _cpu_init


def timeit(fn, *args, n=10, chain=None):
    """Median wall of n calls (block_until_ready), after one warmup."""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from slide_tpu.configs import autoencoder_config
    from slide_tpu.train import build_autoencoder
    from slide_tpu.train.driver import (TrainState, make_ae_train_step,
                                        sample_train_keypoints)
    from slide_tpu.train.ema import ema_init
    from slide_tpu.ops import calc_cd

    b = int(os.environ.get("PROFILE_AE_B", "32"))
    cfg = autoencoder_config("airplane", batch_size=b)
    ts_cfg = cfg["shapenet_psr_dataset_config"]
    ae = build_autoencoder(cfg["pointnet_config"])
    variables = _cpu_init(ae.init, {"params": jax.random.key(3),
                          "gaussian": jax.random.key(4), "fps": jax.random.key(5)},
                          jnp.zeros((2, 2048, 6)), jnp.zeros((2, 16, 3)),
                          label=jnp.zeros((2,), jnp.int32))
    params = variables["params"]
    optimizer = optax.adam(2e-4)
    rates = (0.999, 0.9999)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=_cpu_init(optimizer.init, params),
                       ema=ema_init(params, rates))
    npts = ts_cfg["npoints"]
    pts = jax.random.normal(jax.random.key(1), (b, npts, 3))
    nrm = jax.random.normal(jax.random.key(2), (b, npts, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    label = jnp.zeros((b,), jnp.int32)
    x = jnp.concatenate([pts, nrm], axis=-1)
    kp = sample_train_keypoints(pts, ts_cfg, jax.random.key(9))

    class _Res(dict):
        # print incrementally: a later-stage hang/timeout must not lose the
        # measurements already taken (the round-3 run died in the dense
        # control and printed nothing)
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(f"{k}: {v:.5f}" if isinstance(v, float) else f"{k}: {v}",
                  flush=True)

    res = _Res()

    # full train step (single-step jit; campaign runs scans of these)
    step = jax.jit(make_ae_train_step(ae, optimizer, rates, ts_cfg))
    batch = {"points": pts, "normals": nrm, "label": label}
    res["train_step_s"] = timeit(lambda: step(state, batch, jax.random.key(7)))
    c = step.lower(state, batch, jax.random.key(7)).compile().cost_analysis()
    res["train_step_gflops"] = float(c.get("flops", 0)) / 1e9
    res["train_step_gbytes"] = float(c.get("bytes accessed", 0)) / 1e9

    # forward + loss, no grad
    def fwd_loss(params, key):
        kg, kf = jax.random.split(key)
        _, loss_list = ae.apply({"params": params}, x, kp, label=label,
                                loss_type="cd_p",
                                rngs={"gaussian": kg, "fps": kf})
        return sum(jnp.mean(ld["training_loss"]) for ld in loss_list)

    jf = jax.jit(fwd_loss)
    res["fwd_loss_s"] = timeit(lambda: jf(params, jax.random.key(8)))
    c = jf.lower(params, jax.random.key(8)).compile().cost_analysis()
    res["fwd_loss_gflops"] = float(c.get("flops", 0)) / 1e9
    res["fwd_loss_gbytes"] = float(c.get("bytes accessed", 0)) / 1e9

    # encode only
    enc = jax.jit(lambda p, k: ae.apply({"params": p}, x, kp, label=label,
                                        method=ae.encode,
                                        rngs={"gaussian": k}))
    res["encode_s"] = timeit(lambda: enc(params, jax.random.key(10)))
    feat = enc(params, jax.random.key(10))

    # decode only
    dec = jax.jit(lambda p, f, k: ae.apply({"params": p}, kp, f, label=label,
                                           method=ae.decode,
                                           rngs={"fps": k}))
    res["decode_s"] = timeit(lambda: dec(params, feat, jax.random.key(11)))

    # grad (forward + backward, no optimizer): isolates the backward residual
    jg = jax.jit(jax.grad(fwd_loss))
    res["grad_s"] = timeit(lambda: jg(params, jax.random.key(8)))
    c = jg.lower(params, jax.random.key(8)).compile().cost_analysis()
    res["grad_gflops"] = float(c.get("flops", 0)) / 1e9
    res["grad_gbytes"] = float(c.get("bytes accessed", 0)) / 1e9
    res["bwd_only_est_s"] = res["grad_s"] - res["fwd_loss_s"]

    # scatter microprobe: grad of a group_points chain (scatter-add backward)
    # vs a same-traffic dense matmul control — quantifies TPU scatter cost
    from slide_tpu.ops import group_points
    idx = jax.random.randint(jax.random.key(13), (b, 1024, 32), 0, npts)
    feats = jax.random.normal(jax.random.key(14), (b, npts, 32))

    def gp_loss(f):
        return jnp.sum(group_points(f, idx) ** 2)

    jgp = jax.jit(jax.grad(gp_loss))
    res["scatter_grad_group1024x32_s"] = timeit(lambda: jgp(feats))

    # (round 4: the opt-in sort+prefix-sum backward measured 2x SLOWER than
    # the native scatter-add here — 0.104 s vs 0.050 s, full step 0.636 s vs
    # 0.478 s — and was deleted from ops/grouping.py)

    # dense matmul control, sized to the same OUTPUT traffic class as the
    # grouped gather (b x 8192 x 32 vs b x 32768 x 32 — scaled 4x down so the
    # operand fits; the original (b, 32768, 2048) f32 weight was 8.6 GB and,
    # captured as a closure CONSTANT, was serialized through the tunnel at
    # lowering time, wedging the probe).  Passed as an ARGUMENT.
    m_ctl = 8192
    wmat = jax.random.normal(jax.random.key(15), (b, m_ctl, npts))

    def mm_loss(w, f):
        return jnp.sum(jnp.einsum("bmn,bnc->bmc", w, f) ** 2)

    jmm = jax.jit(jax.grad(mm_loss, argnums=1))
    res["dense_grad_control8192_s"] = timeit(lambda: jmm(wmat, feats))

    # chamfer at 2048 (per-level losses run at several sizes; this is the max)
    y = jax.random.normal(jax.random.key(12), (b, npts, 6))
    cd = jax.jit(lambda a, bb: calc_cd(a, bb)["cd_p"].mean())
    res["chamfer_2048_s"] = timeit(lambda: cd(x, y))

    # FPS 2048 -> 1024 (the encoder's first level) and kNN costs
    from slide_tpu.ops import furthest_point_sample, knn_points
    fps_fn = jax.jit(lambda p: furthest_point_sample(p, 1024))
    res["fps_2048_to_1024_s"] = timeit(lambda: fps_fn(pts))
    knn_fn = jax.jit(lambda a, bb: knn_points(a, bb, 32)[0])
    res["knn_2048x2048_k32_s"] = timeit(lambda: knn_fn(pts, pts))

    print(json.dumps({k: round(v, 5) for k, v in res.items()}))


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
