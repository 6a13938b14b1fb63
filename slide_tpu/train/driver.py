"""Task training drivers — reference `train.py` / `train_autoencoder.py` /
`train_latent_ddpm.py` ported to single pjit-sharded processes.

Data parallelism: one `jax.sharding.Mesh` over all local devices with a 'data'
axis.  The batch is sharded on axis 0, params/EMA/opt-state are replicated,
and XLA inserts the gradient all-reduce — replacing the reference's
process-per-GPU launcher + hand-rolled allreduce hooks
(`distributed.py:99-151`).  Keypoint FPS sampling runs ON DEVICE inside the
jitted step (the reference calls pytorch3d CUDA FPS per batch,
`train.py:190-192`).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slide_tpu.data import get_dataloader
from slide_tpu.diffusion import calc_diffusion_hyperparams, diffusion_training_loss
from slide_tpu.diffusion.latent import latent_train_loss
from slide_tpu.diffusion.x0 import X0Schedule
from slide_tpu.models import ConditionalPointNet2, PointAutoencoder
from slide_tpu.ops import sample_keypoints
from slide_tpu.nn.precision import set_activation_dtype
from slide_tpu.train.checkpoint import (load_checkpoint, mirror_checkpoint,
                                        restore_from_mirror, save_checkpoint)
from slide_tpu.train.ema import ema_init, ema_update


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: dict
    opt_state: optax.OptState
    ema: tuple  # tuple of param pytrees, parallel to ema_rates


def build_network(pointnet_config: dict):
    """network_type dispatch (`train.py:101-107`, `train_latent_ddpm.py:
    95-101`): 'pointnet++' (default) -> ConditionalPointNet2,
    'pointwise_net' -> PointwiseNet(network_args), 'pvd' -> PVCNN2."""
    nt = pointnet_config.get("network_type", "pointnet++")
    if nt == "pointnet++":
        return ConditionalPointNet2(pointnet_config)
    if nt == "pointwise_net":
        from slide_tpu.models import get_pointwise_net
        return get_pointwise_net(pointnet_config["network_args"])
    if nt == "pvd":
        from slide_tpu.models import PVCNN2
        args = dict(pointnet_config.get("network_args", {}))
        return PVCNN2(**args)
    raise ValueError(f"network_type {nt} is not supported")


def make_data_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), ("data",))


def experiment_dirs(config: dict) -> tuple[str, str]:
    """(experiment_root, checkpoint_dir) — layout
    root/T{T}_betaT{betaT}_{model_name}/<output_directory>
    (`train.py:59-60`)."""
    tc = config["train_config"]
    name = config["pointnet_config"]["model_name"]
    if "diffusion_config" in config:
        dc = config["diffusion_config"]
        local = "T{}_betaT{}_{}".format(dc["T"], dc["beta_T"], name)
    elif "standard_diffusion_config" in config:
        dc = config["standard_diffusion_config"]
        local = "T{}_betaT{}_{}".format(dc["num_diffusion_timesteps"],
                                        dc["beta_end"], name)
    else:
        # AE / SAP drivers use the plain model name
        # (`train_autoencoder.py:51`, `train_upsampler.py`)
        local = name
    exp_root = os.path.join(tc["root_directory"], local)
    return exp_root, os.path.join(exp_root, tc["output_directory"])


def sample_train_keypoints(points, trainset_config: dict, key=None):
    """FPS keypoints + optional gaussian noise, per the train drivers
    (`train.py:188-194`, `train_autoencoder.py:169-176`)."""
    if trainset_config.get("keypoints_source", "farthest_points_sampling") \
            != "farthest_points_sampling":
        raise ValueError("only farthest_points_sampling keypoints supported")
    sub_key = None
    if trainset_config.get("random_sample_keypoints", False) or \
            not trainset_config.get("add_centroid_to_keypoints", True):
        key, sub_key = jax.random.split(key)
    keypoint, _ = sample_keypoints(
        points, trainset_config["num_keypoints"],
        add_centroid=trainset_config.get("add_centroid_to_keypoints", True),
        random_subsample=trainset_config.get("random_sample_keypoints", False),
        key=sub_key)
    nm = trainset_config.get("keypoint_noise_magnitude", 0)
    if nm > 0:
        if key is None:
            raise ValueError("keypoint noise requires a PRNG key")
        key, k2 = jax.random.split(key)
        keypoint = keypoint + nm * jax.random.normal(k2, keypoint.shape)
    return keypoint


def _device_batch(batch: dict, sharding) -> dict:
    multi = jax.process_count() > 1
    out = {}
    for k, dtype in [("points", jnp.float32), ("normals", jnp.float32),
                     ("psr", jnp.float32), ("label", jnp.int32)]:
        if k not in batch:
            continue
        arr = jnp.asarray(batch[k], dtype)
        if multi:
            # each process holds its rank's shard; assemble the global array
            out[k] = jax.make_array_from_process_local_data(sharding,
                                                            np.asarray(arr))
        else:
            out[k] = jax.device_put(arr, sharding)
    return out


def run_training(config: dict, state: TrainState, train_step: Callable, *,
                 data_dir: Optional[str] = None, mesh: Optional[Mesh] = None,
                 max_iters: Optional[int] = None, seed: int = 0,
                 eval_hook: Optional[Callable] = None, verbose: bool = True,
                 resume_opt_structure=None):
    """Shared training scaffold: resume, sharded step, logging, checkpoints.

    train_step(state, device_batch, key) -> (state, scalar loss), already
    built for the task.  Returns (final state, [(iter, loss), ...]).

    `train_config["steps_per_dispatch"]` (default 8) runs that many steps as
    ONE jitted lax.scan over a stacked (K, B, ...) super-batch: host dispatch
    / tunnel latency is paid once per K steps instead of per step, and XLA
    overlaps the inter-step glue.  Chunks are clamped to checkpoint/eval
    boundaries so the reference's cadence semantics (train.py:160-240) are
    exact; K=1 restores the one-call-per-step loop.
    """
    train_config = config["train_config"]
    trainset_config = dict(config["shapenet_psr_dataset_config"])
    if data_dir is not None:
        trainset_config["data_dir"] = data_dir

    mesh = mesh or make_data_mesh()
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    _, output_directory = experiment_dirs(config)

    # resume-by-default (train.py:128-158)
    time_offset = 0
    ckpt_iter = -1
    ema_rates = tuple(train_config.get("ema_rate") or ())
    ckpt_sel = train_config.get("ckpt_iter")
    # durable mirror (no reference counterpart): checkpoints additionally
    # copied into a git-tracked dir so a VM reset wiping the (gitignored)
    # experiment tree costs a restore, not the training run
    durable_dir = train_config.get("durable_ckpt_dir")
    if durable_dir and jax.process_index() == 0 and ckpt_sel == "max":
        restored = restore_from_mirror(output_directory, durable_dir)
        if restored and verbose:
            print(f"restored checkpoint from durable mirror: {restored}",
                  flush=True)
    if ckpt_sel == "max" or isinstance(ckpt_sel, int):
        ckpt = load_checkpoint(output_directory,
                               None if ckpt_sel == "max" else ckpt_sel)
        if ckpt is not None:
            # re-seat the saved leaves in the freshly-built optax structure;
            # validate leaf count AND shapes first — a silent mismatch (optax
            # version drift, changed optimizer config) would scramble moments
            saved = jax.tree.leaves(ckpt["optimizer_state_dict"])
            fresh = jax.tree.leaves(state.opt_state)
            if len(saved) != len(fresh):
                raise ValueError(
                    f"optimizer state in checkpoint has {len(saved)} leaves, "
                    f"the configured optimizer expects {len(fresh)} — resume "
                    "with the original optimizer or clear ckpt_iter")
            for i, (s, f) in enumerate(zip(saved, fresh)):
                if jnp.shape(s) != jnp.shape(f):
                    raise ValueError(
                        f"optimizer-state leaf {i} shape {jnp.shape(s)} != "
                        f"expected {jnp.shape(f)} — checkpoint/optimizer "
                        "mismatch")
            state = state.replace(
                step=jnp.asarray(ckpt["iter"] + 1, jnp.int32),
                params=ckpt["model_state_dict"],
                opt_state=jax.tree.unflatten(
                    jax.tree.structure(state.opt_state), saved),
                ema=tuple(ckpt["ema_state_list"]) if ema_rates else state.ema)
            ckpt_iter = ckpt["iter"]
            time_offset = ckpt.get("training_time_seconds", 0)
            if verbose:
                print(f"resumed from iteration {ckpt_iter}", flush=True)
    state = jax.device_put(state, repl)

    base_key = jax.random.key(seed + 1)
    stacked_sh = NamedSharding(mesh, P(None, "data"))

    # under jax.distributed each process loads its rank's shard (the data
    # layer's rank/world_size split); batch assembly goes through
    # make_array_from_process_local_data in _device_batch
    rank, world = jax.process_index(), jax.process_count()
    loader = get_dataloader(trainset_config, phase="train", seed=seed,
                            rank=rank, world_size=world)

    # device-resident corpus (data/device_corpus.py): the whole split lives
    # in HBM and batch assembly fuses into the training scan — the host
    # pipeline's per-dispatch super-batch transfer + sync floors cost
    # ~320 ms/step through the tunnel vs 3.5 ms of device compute.
    # Single-process only (multi-host keeps the rank-sharded host loader).
    use_device_data = bool(train_config.get("device_data", False)) and \
        world == 1
    if use_device_data:
        from slide_tpu.data.device_corpus import (DeviceCorpus,
                                                  make_assemble_fn)
        corpus_dev = DeviceCorpus.from_dataset(loader.dataset).device_put(repl)
        assemble = make_assemble_fn(trainset_config)
        data_key = jax.random.key(seed + 101)   # distinct from the step keys

    def multi_step(state, batches, iter_idx):
        # batches: (K, B, ...) stacked; iter_idx: (K,) global iteration ids
        def body(s, xs):
            b, i = xs
            return train_step(s, b, jax.random.fold_in(base_key, i))

        return jax.lax.scan(body, state, (batches, iter_idx))

    def multi_step_dev(state, corpus, idx_kb, iter_idx):
        # idx_kb: (K, B) model indices; assembly runs inside the scan body so
        # the chunk is ONE executable with no host-visible batch at all
        def body(s, xs):
            ib, i = xs
            batch = assemble(corpus, ib, jax.random.fold_in(data_key, i))
            return train_step(s, batch, jax.random.fold_in(base_key, i))

        return jax.lax.scan(body, state, (idx_kb, iter_idx))

    # donation halves state memory on directly-attached devices, but on the
    # remote-tunnel backend it forces buffer round-trips costing ~4 s per
    # call (measured: 223 ms/step donated vs 5.4 ms/step without, B=32);
    # newer tunnel runtimes reject donated executions with INVALID_ARGUMENT
    from slide_tpu.utils.platform import donation_safe
    donate = (0,) if donation_safe() else ()
    if use_device_data:
        step_fn = jax.jit(multi_step_dev,
                          in_shardings=(repl, repl, stacked_sh, repl),
                          out_shardings=(repl, repl), donate_argnums=donate)
    else:
        step_fn = jax.jit(multi_step, in_shardings=(repl, stacked_sh, repl),
                          out_shardings=(repl, repl), donate_argnums=donate)
    loader_len = len(loader)
    n_iters = int(loader_len * train_config["n_epochs"])
    if max_iters is not None:
        n_iters = min(n_iters, max_iters)
    iters_per_ckpt = max(1, int(loader_len * train_config["epochs_per_ckpt"]))
    iters_per_logging = train_config["iters_per_logging"]

    local_dev = max(1, n_dev // world)
    local_bs = trainset_config["batch_size"] // world
    if local_bs % local_dev != 0:
        raise ValueError(
            f"per-process batch size {local_bs} is not divisible by the "
            f"{local_dev} local mesh devices — nothing would ever train "
            f"(pick batch_size as a multiple of {local_dev * world})")

    spd = max(1, int(train_config.get("steps_per_dispatch", 8)))
    spd_capped = False

    def _cap_spd(first_batch):
        # keep the stacked super-batch under ~256 MB (a 128^3 psr grid batch
        # is 67 MB alone — blindly stacking 8 would 8x host+HBM pressure)
        nonlocal spd, spd_capped
        if spd_capped:
            return
        nbytes = sum(np.asarray(v).nbytes for k, v in first_batch.items()
                     if k in ("points", "normals", "psr", "label"))
        spd = max(1, min(spd, (256 << 20) // max(1, nbytes)))
        spd_capped = True
    losses = []
    n_iter = ckpt_iter + 1
    t0 = time.time()
    log_t = time.time()
    warned_partial = False
    pending: list = []               # host batches, or (B,) index arrays
    ep_rng = np.random.default_rng(seed)   # device-data epoch permutations

    def _dispatch(state):
        nonlocal n_iter, log_t, warned_partial
        k = len(pending)
        idx = jax.device_put(
            jnp.arange(n_iter, n_iter + k, dtype=jnp.int32), repl)
        if use_device_data:
            # the only per-chunk transfer: a (K, B) int32 model-index array
            db = {"_idx": jax.device_put(
                jnp.asarray(np.stack(pending), jnp.int32), stacked_sh)}
            pending.clear()
            state, chunk_losses = step_fn(state, corpus_dev, db["_idx"], idx)
        else:
            stacked = {key_: np.stack([np.asarray(b[key_]) for b in pending])
                       for key_ in pending[0]
                       if key_ in ("points", "normals", "psr", "label")}
            db = _device_batch(stacked, stacked_sh)
            pending.clear()
            state, chunk_losses = step_fn(state, db, idx)
        # bound in-flight dispatches: without a sync the async queue grows
        # without backpressure and every queued chunk pins its host/device
        # batch buffers (SAP's 200 MB psr super-batches OOM-killed the host
        # after ~1400 iters).  One sync per K-step chunk costs ~ms.
        jax.block_until_ready(chunk_losses)
        # free the consumed super-batch deterministically — the remote-device
        # runtime's staging copies otherwise accumulate (~67 MB/step with
        # 128^3 psr grids) faster than GC reclaims them
        for v in db.values():
            try:
                v.delete()
            except Exception:                                # noqa: BLE001
                pass
        logged = [(n_iter + j) for j in range(k)
                  if (n_iter + j) % iters_per_logging == 0]
        if logged:
            vals = np.asarray(chunk_losses)
            for it in logged:
                loss_v = float(vals[it - n_iter])
                if not np.isfinite(loss_v):
                    raise FloatingPointError(
                        f"non-finite training loss at iteration {it}")
                losses.append((it, loss_v))
                if verbose:
                    print(f"iteration: {it} \tloss: {loss_v:.6f} "
                          f"\ttime: {time.time() - log_t:.2f}s", flush=True)
                log_t = time.time()
        n_iter += k
        if n_iter % iters_per_ckpt == 0 and rank == 0:
            # params/EMA are replicated; only process 0 writes (shared
            # storage would otherwise be clobbered by every host)
            path = save_checkpoint(
                output_directory, n_iter - 1, state.params, state.opt_state,
                int(time.time() - t0) + time_offset,
                ema_state_list=list(state.ema) if ema_rates else None)
            if durable_dir:
                mirror_checkpoint(path, durable_dir)
            if eval_hook is not None:
                if world > 1:
                    # hand hooks host copies: jitting a global (non-fully-
                    # addressable) array from one process alone would hang
                    eval_hook(jax.device_get(state.params),
                              jax.device_get(list(state.ema)), n_iter - 1)
                else:
                    eval_hook(state.params, list(state.ema), n_iter - 1)
        return state

    while use_device_data and n_iter < n_iters:
        # device-data epoch: only index math happens on the host.  Full
        # batches of a fresh permutation; the ragged tail is dropped (the
        # host path equivalently skips partial batches).
        n_models = len(loader.dataset)
        if n_models // local_bs == 0:
            raise ValueError(
                f"no full batches of {local_bs} in the dataset — "
                f"batch_size exceeds the usable dataset size")
        perm = ep_rng.permutation(n_models)
        for bi in range(n_models // local_bs):
            if n_iter + len(pending) >= n_iters:
                break
            pending.append(perm[bi * local_bs:(bi + 1) * local_bs])
            boundary = min(iters_per_ckpt - n_iter % iters_per_ckpt,
                           n_iters - n_iter)
            if len(pending) >= min(spd, boundary):
                state = _dispatch(state)
        if pending and n_iter + len(pending) >= n_iters:
            state = _dispatch(state)
    while not use_device_data and n_iter < n_iters:
        epoch_start_iter = n_iter
        epoch_start_pending = len(pending)
        for batch in loader:
            if n_iter + len(pending) >= n_iters:
                break
            if batch["label"].shape[0] != local_bs:
                # ragged final batch (dataset not divisible): skip, loudly
                if not warned_partial:
                    print(f"warning: skipping partial batch of "
                          f"{batch['label'].shape[0]} (batch_size {local_bs})",
                          flush=True)
                    warned_partial = True
                continue
            _cap_spd(batch)
            pending.append(batch)
            # clamp the chunk to the next checkpoint / end-of-run boundary so
            # save/eval cadence is identical to the per-step loop
            boundary = min(iters_per_ckpt - n_iter % iters_per_ckpt,
                           n_iters - n_iter)
            if len(pending) >= min(spd, boundary):
                state = _dispatch(state)
        if pending and n_iter + len(pending) >= n_iters:
            state = _dispatch(state)
        if n_iter == epoch_start_iter and len(pending) == epoch_start_pending:
            # a whole epoch yielded no usable batch (every batch smaller than
            # the per-process batch size): erroring beats spinning forever
            raise ValueError(
                f"no full batches of {local_bs} in the dataset — "
                f"batch_size exceeds the usable dataset size")
    if n_iter > ckpt_iter + 1 and n_iter % iters_per_ckpt != 0 and rank == 0:
        # the run ended off-cadence (max_iters cut, or iters_per_ckpt counts
        # skipped partial batches): persist the final state anyway so no
        # trained iterations are lost on resume/eval
        path = save_checkpoint(
            output_directory, n_iter - 1, state.params, state.opt_state,
            int(time.time() - t0) + time_offset,
            ema_state_list=list(state.ema) if ema_rates else None)
        if durable_dir:
            mirror_checkpoint(path, durable_dir)
    return state, losses


# ---------------------------------------------------------------------------
# Checkpoint-time evaluation hooks (reference `train.py:256-292`,
# `train_autoencoder.py:220-234`, `train_upsampler.py` eval):
# every checkpoint evaluates the live model AND each EMA shadow; EMA results
# land under eval_result/model_ema_<rate>/.


def make_generation_eval_hook(config: dict, net, sched, *,
                              data_dir: Optional[str] = None, seed: int = 0,
                              x0_sched: Optional[X0Schedule] = None):
    """Eval hook for the DDPM drivers: sample a test set per checkpoint
    (model + every EMA) via `evaluate_per_rank`.  With `x0_sched`, sampling
    runs the x0-engine reverse chain (the reference's diffusion_model.denoise
    path, `mesh_evaluation.py:103-125`)."""
    from slide_tpu.eval import evaluate_per_rank

    train_config = config["train_config"]
    trainset_config = dict(config["shapenet_psr_dataset_config"])
    if data_dir is not None:
        trainset_config["data_dir"] = data_dir
    ema_rates = tuple(train_config.get("ema_rate") or ())
    task = train_config["task"]
    exp_root, _ = experiment_dirs(config)
    state = {"num_ckpts": 0}
    pfd = 3 + config["pointnet_config"]["in_fea_dim"]
    num_points = trainset_config["num_keypoints"] if task == "keypoint_generation" \
        else trainset_config["npoints"]

    def x0_sampler_for(params):
        from slide_tpu.diffusion.x0 import x0_denoise

        def sampler(key, label, condition):
            def net_fn(x, ts):
                return net.apply({"params": params}, x, condition=condition,
                                 ts=ts, label=label)
            return x0_denoise(net_fn, key, (label.shape[0], num_points, pfd),
                              x0_sched)
        return sampler

    def run_eval(params, save_dir, ckpt_info):
        params = jax.device_get(params)
        evaluate_per_rank(
            net, params, trainset_config, sched, save_dir, task,
            point_feature_dim=pfd, ckpt_info=ckpt_info, seed=seed,
            custom_sampler=x0_sampler_for(params) if x0_sched is not None else None)

    def hook(params, ema_list, n_iter):
        state["num_ckpts"] += 1
        if state["num_ckpts"] % train_config.get("eval_per_ckpt", 1) != 0:
            return
        save_dir = os.path.join(exp_root, "eval_result")
        ckpt_info = f"_iter_{n_iter}"
        run_eval(params, save_dir, ckpt_info)
        for rate, ema in zip(ema_rates, ema_list):
            run_eval(ema, os.path.join(save_dir, f"model_ema_{rate:.5f}"),
                     ckpt_info)

    return hook


def make_ae_eval_hook(config: dict, ae, *, data_dir: Optional[str] = None,
                      seed: int = 0):
    """Eval hook for the AE driver: hierarchical visual eval + quantitative
    history on train and val splits (`train_autoencoder.py:220-234`)."""
    from slide_tpu.data import get_dataloader
    from slide_tpu.eval.ae_eval import ae_visual_eval, ae_quantitative_eval

    train_config = config["train_config"]
    trainset_config = dict(config["shapenet_psr_dataset_config"])
    if data_dir is not None:
        trainset_config["data_dir"] = data_dir
    exp_root, _ = experiment_dirs(config)
    state = {"num_ckpts": 0}

    def hook(params, ema_list, n_iter):
        state["num_ckpts"] += 1
        if state["num_ckpts"] % train_config.get("eval_per_ckpt", 1) != 0:
            return
        save_dir = os.path.join(exp_root, "eval_result")
        params_h = jax.device_get(params)
        vis_loader = get_dataloader(trainset_config, phase="val", seed=seed)
        ae_visual_eval(ae, params_h, vis_loader, save_dir, n_iter, 0,
                       trainset_config, seed=seed)
        for phase, sub in (("train", "trainset_eval"), ("val", "valset_eval")):
            loader = get_dataloader(trainset_config, phase=phase, seed=seed)
            ae_quantitative_eval(ae, params_h, loader,
                                 os.path.join(save_dir, sub), n_iter, 0,
                                 trainset_config, seed=seed)
        if trainset_config.get("keypoint_noise_magnitude", 0) > 0:
            cfg0 = dict(trainset_config, keypoint_noise_magnitude=0)
            loader = get_dataloader(trainset_config, phase="val", seed=seed)
            ae_quantitative_eval(ae, params_h, loader,
                                 os.path.join(save_dir, "valset_eval_keypoint_noise_0"),
                                 n_iter, 0, cfg0, seed=seed)

    return hook


def make_latent_eval_hook(config: dict, net, ae, ae_params, sched: X0Schedule, *,
                          data_dir: Optional[str] = None, seed: int = 0):
    """Eval hook for the latent-DDPM driver: per checkpoint, sample latents
    conditioned on val-set keypoints, decode through the frozen AE, and write
    the generated npz for model + every EMA — the reference's
    `train_latent_ddpm.py:283-297` `evaluate_and_gather` per-checkpoint call
    (`:260-276`)."""
    from slide_tpu.diffusion.latent import latent_denoise_and_reconstruct
    from slide_tpu.eval import evaluate_per_rank

    train_config = config["train_config"]
    trainset_config = dict(config["shapenet_psr_dataset_config"])
    if data_dir is not None:
        trainset_config["data_dir"] = data_dir
    ema_rates = tuple(train_config.get("ema_rate") or ())
    task = train_config["task"]
    exp_root, _ = experiment_dirs(config)
    state = {"num_ckpts": 0}
    k = trainset_config["num_keypoints"]
    feat_dim = config["pointnet_config"]["in_fea_dim"]

    def run_eval(params, save_dir, ckpt_info):
        params = jax.device_get(params)

        def latent_sampler(key, label, keypoint):
            def net_fn(x, ts):
                return net.apply({"params": params}, x, ts=ts, label=label)

            def decode_fn(kp, feat, lbl, kk):
                return ae.apply({"params": ae_params}, kp, feat, label=lbl,
                                method=ae.decode, rngs={"fps": kk})

            return latent_denoise_and_reconstruct(
                net_fn, decode_fn, key, label.shape[0], 3, (k, 3 + feat_dim),
                sched, label=label, keypoint=keypoint)

        evaluate_per_rank(net, params, trainset_config, None, save_dir, task,
                          point_feature_dim=feat_dim, ckpt_info=ckpt_info,
                          latent_sampler=latent_sampler, seed=seed)

    def hook(params, ema_list, n_iter):
        state["num_ckpts"] += 1
        if state["num_ckpts"] % train_config.get("eval_per_ckpt", 1) != 0:
            return
        save_dir = os.path.join(exp_root, "eval_result")
        ckpt_info = f"_iter_{n_iter}"
        run_eval(params, save_dir, ckpt_info)
        for rate, ema in zip(ema_rates, ema_list):
            run_eval(ema, os.path.join(save_dir, f"model_ema_{rate:.5f}"),
                     ckpt_info)

    return hook


def make_sap_eval_hook(config: dict, net, dpsr, *,
                       data_dir: Optional[str] = None, seed: int = 0):
    """Eval hook for the SAP driver: DPSR-grid L2 on the val split — the
    checkpoint-selection metric (`train_upsampler.py` + `dpsr_evaluation.py:
    88-150`)."""
    from slide_tpu.data import get_dataloader
    from slide_tpu.eval import sap_grid_eval

    train_config = config["train_config"]
    trainset_config = dict(config["shapenet_psr_dataset_config"])
    if data_dir is not None:
        trainset_config["data_dir"] = data_dir
    exp_root, _ = experiment_dirs(config)
    state = {"num_ckpts": 0}

    def hook(params, ema_list, n_iter):
        state["num_ckpts"] += 1
        if state["num_ckpts"] % train_config.get("eval_per_ckpt", 1) != 0:
            return
        loader = get_dataloader(trainset_config, phase="val", seed=seed)
        sap_grid_eval(net, jax.device_get(params), dpsr, loader,
                      config["pointnet_config"], config["dpsr_config"],
                      trainset_config, os.path.join(exp_root, "eval_result"),
                      n_iter, 0, scale=trainset_config["scale"], seed=seed)

    return hook


# ---------------------------------------------------------------------------
# Position / point DDPM (train.py)


def _prepare_x(task: str, trainset_config: dict, points, normals, key):
    """Task-specific training target assembly (`train.py:188-204`)."""
    condition = None
    keypoint = None
    if task in ("keypoint_generation", "keypoint_conditional_generation"):
        keypoint = sample_train_keypoints(points, trainset_config, key)
    if task in ("generation", "keypoint_conditional_generation") and \
            trainset_config.get("include_normals", True):
        points = jnp.concatenate([points, normals], axis=-1)
    if task == "keypoint_generation":
        return keypoint, None
    if task == "generation":
        return points, None
    if task == "keypoint_conditional_generation":
        return points, keypoint
    raise ValueError(f"task {task} not handled by this driver")


def maybe_fused_train_apply(pointnet_config: dict, n_points: int,
                            batch_size: int, mesh) -> Optional[Callable]:
    """Differentiable fused-denoiser apply `(params, x, ts, label) -> out`
    for the hot DDPM train steps, or None when unavailable.

    Both directions run as single Pallas kernels under shard_map on `mesh`'s
    'data' axis (models/fused_denoiser.make_fused_train_fn) — the training
    answer to the GroupNorm HBM-traffic pathology.  Gating:
    `SLIDE_TPU_FUSED_TRAIN=0` disables, `=interpret` forces the kernels in
    interpret mode (CPU tests); otherwise TPU-like backends only."""
    env = os.environ.get("SLIDE_TPU_FUSED_TRAIN", "1")
    if env == "0":
        return None
    interpret = env == "interpret"
    if not interpret and jax.default_backend() in ("cpu",):
        return None
    # The backward kernel's recompute residuals must fit VMEM at the minimum
    # batch tile (8, the Mosaic sublane floor).  The keypoint-scale config
    # (channels <= 128) fits in the v5e's 128 MiB; the latent config's
    # 256-512-wide stages exceed it, and the flax backward is within ~8% of
    # the fused one anyway (CLAUDE.md round-2 findings) — so gate on width.
    # SLIDE_TPU_FUSED_TRAIN=force skips the gate (bigger-VMEM parts).
    if env != "force" and not interpret:
        arch = pointnet_config.get("architecture", {})
        widths = list(arch.get("feature_dim", [])) + \
            list(arch.get("decoder_feature_dim", []))
        if widths and max(widths) > 128:
            return None
    n_dev = mesh.devices.size if mesh is not None else 1
    if batch_size % n_dev != 0:
        return None
    local_b = batch_size // n_dev
    # Mosaic accepts a batch tile that is a multiple of 8 (sublane floor) or
    # equal to the whole per-device batch.  Prefer the biggest tile that fits
    # VMEM (bb=40 proven on v5e); local batches not divisible by 8 can only
    # run as ONE tile, which is VMEM-safe for the backward only when <= 8.
    if local_b % 8 == 0:
        block_b = next(d for d in (40, 32, 16, 8) if local_b % d == 0)
    elif local_b <= 8:
        block_b = local_b                     # single tile, both directions
    else:
        return None                           # e.g. 12, 20: no lowerable tile
    from slide_tpu.models.fused_denoiser import make_fused_train_fn
    return make_fused_train_fn(pointnet_config, n_points, block_b=block_b,
                               interpret=interpret, mesh=mesh)


def make_train_step(net: ConditionalPointNet2, sched, optimizer, ema_rates,
                    task: str, trainset_config: dict,
                    fused_apply: Optional[Callable] = None) -> Callable:
    def train_step(state: TrainState, batch: dict, key: jax.Array):
        k_prep, k_loss = jax.random.split(key)
        x, condition = _prepare_x(task, trainset_config, batch["points"],
                                  batch["normals"], k_prep)
        label = batch["label"]

        def loss_fn(params):
            def net_fn(xt, ts):
                if fused_apply is not None and condition is None:
                    return fused_apply(params, xt, ts, label)
                return net.apply({"params": params}, xt, condition=condition,
                                 ts=ts, label=label)
            return diffusion_training_loss(net_fn, k_loss, x, sched)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_rates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, ema=ema), loss

    return train_step


def make_x0_train_step(net, x0_sched: X0Schedule, standard_diffusion_config: dict,
                       optimizer, ema_rates, task: str,
                       trainset_config: dict,
                       fused_apply: Optional[Callable] = None) -> Callable:
    """x0-parameterized (chamfer-loss) train step — the reference routes
    training through `Diffusion.train_loss` whenever the config carries
    `standard_diffusion_config` (`train.py:209-215, 355-360`)."""
    from slide_tpu.diffusion.x0 import x0_training_loss

    loss_type = standard_diffusion_config["loss_type"]
    normal_loss_type = standard_diffusion_config.get("normal_loss_type", "cos")

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        k_prep, k_loss = jax.random.split(key)
        x, condition = _prepare_x(task, trainset_config, batch["points"],
                                  batch["normals"], k_prep)
        label = batch["label"]

        def loss_fn(params):
            def net_fn(xt, ts):
                if fused_apply is not None and condition is None:
                    return fused_apply(params, xt, ts, label)
                return net.apply({"params": params}, xt, condition=condition,
                                 ts=ts, label=label)
            out = x0_training_loss(net_fn, k_loss, x, x0_sched,
                                   loss_type=loss_type,
                                   normal_loss_type=normal_loss_type)
            return out["training_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_rates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, ema=ema), loss

    return train_step


def _init_state(params, optimizer, ema_rates) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params),
                      ema=ema_init(params, ema_rates))


def _host_init_device():
    """Device scope for model/optimizer init.

    flax `Module.init` runs EAGERLY (it is not jitted), so against a remote
    accelerator tunnel every one of its thousands of small ops pays a full
    round trip (~30 ms sync floor) plus a first-time remote compile — a
    full-size autoencoder init measured 35+ minutes on the tunnel vs seconds
    on the host CPU (round-4 campaign hang).  Trace init on CPU instead;
    `run_training` device_puts the state onto the mesh, so nothing else
    changes.  No-op when CPU already is the backend (tests) or when no CPU
    platform is registered."""
    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def _apply_precision(train_config: dict) -> None:
    """Honor `train_config["activation_dtype"]` ("bfloat16" halves the HBM
    traffic of the bandwidth-bound AE/SAP steps — nn/precision.py; params,
    optimizer state, norm statistics, and neighbor distances stay f32).
    Must run before the step is built/traced; no reference counterpart
    (the reference trains pure f32)."""
    if "activation_dtype" in train_config:
        set_activation_dtype(train_config["activation_dtype"])


def train_position_ddpm(config: dict, *, data_dir: Optional[str] = None,
                        max_iters: Optional[int] = None,
                        mesh: Optional[Mesh] = None, seed: int = 0,
                        eval_hook: Optional[Callable] = None,
                        verbose: bool = True):
    """Train the position/point DDPM per `train_config` (reference
    `train.py`)."""
    train_config = config["train_config"]
    _apply_precision(train_config)
    trainset_config = config["shapenet_psr_dataset_config"]
    task = train_config["task"]
    # x0 engine takes over when standard_diffusion_config is present
    # (train.py:355-360); diffusion_config still defines the schedule for
    # directories / eps-engine eval
    use_x0 = "standard_diffusion_config" in config
    sched = None
    if "diffusion_config" in config:
        dc = config["diffusion_config"]
        sched = calc_diffusion_hyperparams(dc["T"], dc["beta_0"], dc["beta_T"])
    net = build_network(config["pointnet_config"])
    optimizer = optax.adam(train_config["learning_rate"])
    ema_rates = tuple(train_config.get("ema_rate") or ())

    npts = trainset_config["num_keypoints"] if task == "keypoint_generation" \
        else trainset_config["npoints"]
    in_dim = 3 + config["pointnet_config"]["in_fea_dim"]
    cond0 = jnp.zeros((2, trainset_config["num_keypoints"], 3)) \
        if task == "keypoint_conditional_generation" else None
    with _host_init_device():
        variables = net.init(jax.random.key(seed),
                             jnp.zeros((2, npts, in_dim)),
                             condition=cond0, ts=jnp.zeros((2,), jnp.int32),
                             label=jnp.zeros((2,), jnp.int32))
        state = _init_state(variables["params"], optimizer, ema_rates)
    mesh = mesh or make_data_mesh()
    fused_apply = None
    if task == "keypoint_generation":     # conditionless fixed-N hot path
        fused_apply = maybe_fused_train_apply(
            config["pointnet_config"], npts, trainset_config["batch_size"],
            mesh)
    if use_x0:
        sdc = config["standard_diffusion_config"]
        step = make_x0_train_step(net, X0Schedule.from_config(sdc), sdc,
                                  optimizer, ema_rates, task, trainset_config,
                                  fused_apply=fused_apply)
    else:
        step = make_train_step(net, sched, optimizer, ema_rates, task,
                               trainset_config, fused_apply=fused_apply)
    if eval_hook == "auto":
        eval_hook = make_generation_eval_hook(
            config, net, sched, data_dir=data_dir, seed=seed,
            x0_sched=X0Schedule.from_config(config["standard_diffusion_config"])
            if use_x0 else None)
    return run_training(config, state, step, data_dir=data_dir, mesh=mesh,
                        max_iters=max_iters, seed=seed, eval_hook=eval_hook,
                        verbose=verbose)


# ---------------------------------------------------------------------------
# Autoencoder (train_autoencoder.py)


def build_autoencoder(pointnet_config: dict) -> PointAutoencoder:
    return PointAutoencoder(
        pointnet_config["encoder_config"],
        tuple(pointnet_config["decoder_config_list"]),
        apply_kl_regularization=pointnet_config.get("apply_kl_regularization", False),
        kl_weight=pointnet_config.get("kl_weight", 0),
        feature_weight=tuple(pointnet_config["feature_weight"])
        if pointnet_config.get("feature_weight") else None)


def make_ae_train_step(ae: PointAutoencoder, optimizer, ema_rates,
                       trainset_config: dict) -> Callable:
    def train_step(state: TrainState, batch: dict, key: jax.Array):
        k_kp, k_g, k_f = jax.random.split(key, 3)
        points = batch["points"]
        normals = batch["normals"]
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        keypoints = sample_train_keypoints(points, trainset_config, k_kp)
        x = jnp.concatenate([points, normals], axis=-1)
        label = batch["label"]

        def loss_fn(params):
            _, loss_list = ae.apply({"params": params}, x, keypoints,
                                    label=label, loss_type="cd_p",
                                    rngs={"gaussian": k_g, "fps": k_f})
            return sum(jnp.mean(ld["training_loss"]) for ld in loss_list)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_rates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, ema=ema), loss

    return train_step


def train_autoencoder(config: dict, *, data_dir: Optional[str] = None,
                      max_iters: Optional[int] = None,
                      mesh: Optional[Mesh] = None, seed: int = 0,
                      eval_hook: Optional[Callable] = None,
                      verbose: bool = True):
    """Train the point autoencoder (reference `train_autoencoder.py:30-236`;
    no EMA there — honored unless config sets ema_rate)."""
    train_config = config["train_config"]
    _apply_precision(train_config)
    trainset_config = config["shapenet_psr_dataset_config"]
    pc = config["pointnet_config"]
    ae = build_autoencoder(pc)
    optimizer = optax.adam(train_config["learning_rate"])
    ema_rates = tuple(train_config.get("ema_rate") or ())

    npts = trainset_config["npoints"]
    k = trainset_config["num_keypoints"]
    with _host_init_device():
        variables = ae.init(
            {"params": jax.random.key(seed),
             "gaussian": jax.random.key(seed + 1),
             "fps": jax.random.key(seed + 2)},
            jnp.zeros((2, npts, 6)), jnp.zeros((2, k, 3)),
            label=jnp.zeros((2,), jnp.int32))
        state = _init_state(variables["params"], optimizer, ema_rates)
    step = make_ae_train_step(ae, optimizer, ema_rates, trainset_config)
    if eval_hook == "auto":
        eval_hook = make_ae_eval_hook(config, ae, data_dir=data_dir, seed=seed)
    return run_training(config, state, step, data_dir=data_dir, mesh=mesh,
                        max_iters=max_iters, seed=seed, eval_hook=eval_hook,
                        verbose=verbose)


# ---------------------------------------------------------------------------
# Latent (feature) DDPM (train_latent_ddpm.py)


def make_upsampler_train_step(net: ConditionalPointNet2, dpsr, optimizer,
                              ema_rates, trainset_config: dict,
                              dpsr_config: dict, pointnet_config: dict,
                              ae=None, ae_params=None,
                              noise_magnitude: float = 0.0) -> Callable:
    """SAP refine+upsample step (`train_upsampler.py:200-258`): optionally
    corrupt the cloud through a frozen AE round trip, mirror+tag, predict
    displacements, split, DPSR, (tanh-)MSE against the ground-truth grid."""
    from slide_tpu.sap import mirror_and_concat, network_output_to_dpsr_grid

    mirror_first = dpsr_config.get("mirror_before_upsampling", False)
    only_orig = dpsr_config.get("only_original_points_split", False)
    psr_tanh = dpsr_config.get("psr_tanh", True)
    use_ae = ae is not None
    include_normals = trainset_config.get("include_normals", True)

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        k_kp, k_ae, k_noise, k_perm = jax.random.split(key, 4)
        points = batch["points"]
        normals = batch["normals"]
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        label = batch["label"]
        psr_gt = batch["psr"]
        if include_normals:
            x = jnp.concatenate([points, normals], axis=-1)
        else:
            x = jnp.concatenate([points, jnp.zeros_like(points)], axis=-1)
        if use_ae:
            keypoint = sample_train_keypoints(points, trainset_config, k_kp)
            feat = ae.apply({"params": ae_params}, x, keypoint, label=label,
                            method=ae.encode, rngs={"gaussian": k_ae})
            x = ae.apply({"params": ae_params}, keypoint, feat, label=label,
                         method=ae.decode)
            x = jax.lax.stop_gradient(x)
            if noise_magnitude > 0:
                if dpsr_config.get("split_before_refine", False):
                    sf = dpsr_config["split_factor"]
                    b, n, f = x.shape
                    noise = noise_magnitude * jax.random.normal(
                        k_noise, (b, n, sf, f), x.dtype)
                    x = (x[:, :, None, :] + noise).reshape(b, n * sf, f)
                else:
                    x = x + noise_magnitude * jax.random.normal(k_noise, x.shape)
        if mirror_first:
            x = mirror_and_concat(x, axis=2, num_points=(), attach_label=True,
                                  permute=not only_orig, key=k_perm)[0]

        def loss_fn(params):
            disp = net.apply({"params": params}, x, ts=None, label=label)
            grid, _, _ = network_output_to_dpsr_grid(
                x, disp, dpsr, trainset_config["scale"], pointnet_config,
                last_dim_as_indicator=mirror_first,
                only_original_points_split=only_orig)
            if psr_tanh:
                return jnp.mean((jnp.tanh(grid) - jnp.tanh(psr_gt)) ** 2)
            return jnp.mean((grid - psr_gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_rates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, ema=ema), loss

    return train_step


def train_upsampler(config: dict, *, ae_params=None,
                    data_dir: Optional[str] = None,
                    max_iters: Optional[int] = None,
                    mesh: Optional[Mesh] = None, seed: int = 0,
                    eval_hook: Optional[Callable] = None,
                    verbose: bool = True):
    """Train the SAP refine+upsample network (reference
    `train_upsampler.py:40-311`)."""
    from slide_tpu.sap import DPSR

    train_config = config["train_config"]
    _apply_precision(train_config)
    trainset_config = config["shapenet_psr_dataset_config"]
    pc = config["pointnet_config"]
    dpsr_config = config["dpsr_config"]
    res = (dpsr_config["grid_res"],) * 3
    dpsr = DPSR(res, sig=dpsr_config["psr_sigma"])
    net = build_network(pc)
    optimizer = optax.adam(train_config["learning_rate"])
    ema_rates = tuple(train_config.get("ema_rate") or ())

    ae = None
    noise_magnitude = 0.0
    if config.get("autoencoder_config") and ae_params is not None:
        ae = build_autoencoder(config["autoencoder_config"]["pointnet_config"])
        noise_magnitude = config["autoencoder_config"].get("noise_magnitude", 0.0)

    npts = trainset_config["npoints"]
    in_dim = 3 + pc["in_fea_dim"]
    with _host_init_device():
        variables = net.init(jax.random.key(seed),
                             jnp.zeros((2, npts, in_dim)),
                             ts=None, label=jnp.zeros((2,), jnp.int32))
        state = _init_state(variables["params"], optimizer, ema_rates)
    step = make_upsampler_train_step(net, dpsr, optimizer, ema_rates,
                                     trainset_config, dpsr_config, pc,
                                     ae=ae, ae_params=ae_params,
                                     noise_magnitude=noise_magnitude)
    if eval_hook == "auto":
        eval_hook = make_sap_eval_hook(config, net, dpsr, data_dir=data_dir,
                                       seed=seed)
    return run_training(config, state, step, data_dir=data_dir, mesh=mesh,
                        max_iters=max_iters, seed=seed, eval_hook=eval_hook,
                        verbose=verbose)


def make_latent_train_step(net: ConditionalPointNet2, ae: PointAutoencoder,
                           ae_params, sched: X0Schedule, diffusion_config: dict,
                           optimizer, ema_rates, trainset_config: dict,
                           fused_apply: Optional[Callable] = None) -> Callable:
    kp_cond = diffusion_config.get("keypoint_conditional", False)
    from slide_tpu.diffusion.latent import latent_config_weights
    kp_w, feat_w = latent_config_weights(diffusion_config)

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        k_kp, k_loss = jax.random.split(key)
        points = batch["points"]
        keypoint = sample_train_keypoints(points, trainset_config, k_kp)
        x = points
        if trainset_config.get("include_normals", True):
            x = jnp.concatenate([x, batch["normals"]], axis=-1)
        label = batch["label"]

        def encode_fn(xx, kp, lbl, kk):
            return ae.apply({"params": ae_params}, xx, kp, label=lbl,
                            method=ae.encode, rngs={"gaussian": kk})

        def loss_fn(params):
            def net_fn(xt, ts):
                if fused_apply is not None:
                    return fused_apply(params, xt, ts, label)
                return net.apply({"params": params}, xt, ts=ts, label=label)
            per_sample = latent_train_loss(
                net_fn, encode_fn, k_loss, x, keypoint, label, sched,
                keypoint_conditional=kp_cond,
                keypoint_position_loss_weight=kp_w, feature_loss_weight=feat_w)
            return jnp.mean(per_sample)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_rates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, ema=ema), loss

    return train_step


def train_latent_ddpm(config: dict, ae_params, *, data_dir: Optional[str] = None,
                      max_iters: Optional[int] = None,
                      mesh: Optional[Mesh] = None, seed: int = 0,
                      eval_hook: Optional[Callable] = None,
                      verbose: bool = True):
    """Train the feature (latent) DDPM against a FROZEN autoencoder
    (reference `train_latent_ddpm.py:35-280`).  `ae_params` are the loaded AE
    parameters; the AE structure comes from
    config['autoencoder_config']['pointnet_config']."""
    train_config = config["train_config"]
    _apply_precision(train_config)
    trainset_config = config["shapenet_psr_dataset_config"]
    sdc = config["standard_diffusion_config"]
    sched = X0Schedule.from_config(sdc)
    net = build_network(config["pointnet_config"])
    ae = build_autoencoder(config["autoencoder_config"]["pointnet_config"])
    optimizer = optax.adam(train_config["learning_rate"])
    ema_rates = tuple(train_config.get("ema_rate") or ())

    k = trainset_config["num_keypoints"]
    in_dim = 3 + config["pointnet_config"]["in_fea_dim"]
    with _host_init_device():
        variables = net.init(jax.random.key(seed), jnp.zeros((2, k, in_dim)),
                             ts=jnp.zeros((2,), jnp.int32),
                             label=jnp.zeros((2,), jnp.int32))
        state = _init_state(variables["params"], optimizer, ema_rates)
    mesh = mesh or make_data_mesh()
    fused_apply = maybe_fused_train_apply(
        config["pointnet_config"], k, trainset_config["batch_size"], mesh)
    step = make_latent_train_step(net, ae, ae_params, sched, sdc, optimizer,
                                  ema_rates, trainset_config,
                                  fused_apply=fused_apply)
    if eval_hook == "auto":
        eval_hook = make_latent_eval_hook(config, net, ae, ae_params, sched,
                                          data_dir=data_dir, seed=seed)
    return run_training(config, state, step, data_dir=data_dir, mesh=mesh,
                        max_iters=max_iters, seed=seed, eval_hook=eval_hook,
                        verbose=verbose)
