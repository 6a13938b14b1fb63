"""Position/point DDPM training driver — reference `train.py:33-293` ported to
a single pjit-sharded process.

Data parallelism: one `jax.sharding.Mesh` over all local devices with a 'data'
axis.  The batch is sharded on axis 0, params/EMA/opt-state are replicated,
and XLA inserts the gradient all-reduce — replacing the reference's
process-per-GPU launcher + hand-rolled allreduce hooks
(`distributed.py:99-151`).  Keypoint FPS sampling runs ON DEVICE inside the
jitted step (the reference calls pytorch3d CUDA FPS per batch,
`train.py:190-192`).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slide_tpu.data import get_dataloader
from slide_tpu.diffusion import calc_diffusion_hyperparams, diffusion_training_loss
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.ops import sample_keypoints
from slide_tpu.train.checkpoint import (find_max_iter, load_checkpoint,
                                        save_checkpoint)
from slide_tpu.train.ema import ema_init, ema_update


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: dict
    opt_state: optax.OptState
    ema: tuple  # tuple of param pytrees, parallel to ema_rates


def make_data_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), ("data",))


def _prepare_x(task: str, trainset_config: dict, points, normals):
    """Task-specific training target assembly (`train.py:188-204`)."""
    condition = None
    if task in ("keypoint_generation", "keypoint_conditional_generation"):
        if trainset_config.get("keypoints_source", "farthest_points_sampling") \
                != "farthest_points_sampling":
            raise ValueError("only farthest_points_sampling keypoints supported")
        keypoint, _ = sample_keypoints(
            points, trainset_config["num_keypoints"],
            add_centroid=trainset_config.get("add_centroid_to_keypoints", True))
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


def make_train_step(net: ConditionalPointNet2, sched, optimizer, ema_rates,
                    task: str, trainset_config: dict) -> Callable:
    def train_step(state: TrainState, batch: dict, key: jax.Array):
        x, condition = _prepare_x(task, trainset_config, batch["points"],
                                  batch["normals"])
        label = batch["label"]

        def loss_fn(params):
            def net_fn(xt, ts):
                return net.apply({"params": params}, xt, condition=condition,
                                 ts=ts, label=label)
            return diffusion_training_loss(net_fn, key, x, sched)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_rates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, ema=ema), loss

    return train_step


def _device_batch(batch: dict, sharding) -> dict:
    out = {}
    for k in ("points", "normals"):
        if k in batch:
            out[k] = jax.device_put(jnp.asarray(batch[k], jnp.float32), sharding)
    out["label"] = jax.device_put(jnp.asarray(batch["label"], jnp.int32), sharding)
    return out


def train_position_ddpm(config: dict, *, data_dir: Optional[str] = None,
                        max_iters: Optional[int] = None,
                        mesh: Optional[Mesh] = None, seed: int = 0,
                        eval_hook: Optional[Callable] = None,
                        verbose: bool = True):
    """Train the position/point DDPM per `train_config` (reference
    `train.py`).  Returns (final TrainState, list of losses).

    eval_hook(params, ema_list, n_iter): called at every checkpoint.
    """
    train_config = config["train_config"]
    trainset_config = dict(config["shapenet_psr_dataset_config"])
    if data_dir is not None:
        trainset_config["data_dir"] = data_dir
    diffusion_config = config["diffusion_config"]
    task = train_config["task"]

    mesh = mesh or make_data_mesh()
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    # experiment dir layout: root/T{T}_betaT{betaT}_{model_name}/checkpoint
    local_path = "T{}_betaT{}_{}".format(diffusion_config["T"],
                                         diffusion_config["beta_T"],
                                         config["pointnet_config"]["model_name"])
    root = train_config["root_directory"]
    output_directory = os.path.join(root, local_path,
                                    train_config["output_directory"])

    sched = calc_diffusion_hyperparams(diffusion_config["T"],
                                       diffusion_config["beta_0"],
                                       diffusion_config["beta_T"])
    net = ConditionalPointNet2(config["pointnet_config"])
    optimizer = optax.adam(train_config["learning_rate"])
    ema_rates = tuple(train_config.get("ema_rate") or ())

    # init params (shapes depend on task)
    npts = trainset_config["num_keypoints"] if task == "keypoint_generation" \
        else trainset_config["npoints"]
    in_dim = 3 + config["pointnet_config"]["in_fea_dim"]
    x0 = jnp.zeros((2, npts, in_dim))
    cond0 = None
    if task == "keypoint_conditional_generation":
        cond0 = jnp.zeros((2, trainset_config["num_keypoints"], 3))
    variables = net.init(jax.random.key(seed), x0, condition=cond0,
                         ts=jnp.zeros((2,), jnp.int32),
                         label=jnp.zeros((2,), jnp.int32))
    params = variables["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema=ema_init(params, ema_rates))

    # resume-by-default (train.py:128-158)
    time_offset = 0
    ckpt_iter = -1
    if train_config.get("ckpt_iter") == "max":
        ckpt = load_checkpoint(output_directory)
        if ckpt is not None:
            state = state.replace(
                step=jnp.asarray(ckpt["iter"] + 1, jnp.int32),
                params=ckpt["model_state_dict"],
                opt_state=jax.tree.unflatten(
                    jax.tree.structure(state.opt_state),
                    jax.tree.leaves(ckpt["optimizer_state_dict"])),
                ema=tuple(ckpt.get("ema_state_list", state.ema)))
            ckpt_iter = ckpt["iter"]
            time_offset = ckpt.get("training_time_seconds", 0)
            if verbose:
                print(f"resumed from iteration {ckpt_iter}", flush=True)

    state = jax.device_put(state, repl)

    train_step = jax.jit(
        make_train_step(net, sched, optimizer, ema_rates, task, trainset_config),
        in_shardings=(repl, data_sh, repl), out_shardings=(repl, repl),
        donate_argnums=0)

    loader = get_dataloader(trainset_config, phase="train", seed=seed)
    loader_len = len(loader)
    n_iters = int(loader_len * train_config["n_epochs"])
    if max_iters is not None:
        n_iters = min(n_iters, max_iters)
    iters_per_ckpt = max(1, int(loader_len * train_config["epochs_per_ckpt"]))
    iters_per_logging = train_config["iters_per_logging"]

    base_key = jax.random.key(seed + 1)
    losses = []
    n_iter = ckpt_iter + 1
    t0 = time.time()
    log_t = time.time()
    while n_iter < n_iters:
        for batch in loader:
            if n_iter >= n_iters:
                break
            if batch["label"].shape[0] % n_dev != 0:
                continue  # static sharding needs divisible batches
            db = _device_batch(batch, data_sh)
            state, loss = train_step(state, db, jax.random.fold_in(base_key, n_iter))
            if n_iter % iters_per_logging == 0:
                loss_v = float(loss)
                losses.append((n_iter, loss_v))
                if verbose:
                    print(f"iteration: {n_iter} \tloss: {loss_v:.6f} "
                          f"\ttime: {time.time() - log_t:.2f}s", flush=True)
                log_t = time.time()
            if (n_iter + 1) % iters_per_ckpt == 0:
                save_checkpoint(output_directory, n_iter, state.params,
                                state.opt_state,
                                int(time.time() - t0) + time_offset,
                                ema_state_list=list(state.ema) if ema_rates else None)
                if eval_hook is not None:
                    eval_hook(state.params, list(state.ema), n_iter)
            n_iter += 1
    return state, losses
