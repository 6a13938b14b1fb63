"""Generation evaluation — reference `pointnet2/mesh_evaluation.py:15-186`.

Per rank: sample a test set's worth of shapes, record per-sample wall time,
and write `shapenet_psr_generated_data_<N>_pts[_rank_<r>]<info>.npz` with the
reference's exact key layout:
  points (B,N,3+F), label, category, category_name, timing
  [, keypoint, keypoint_feature, gt_points, normals].
The rank files are merged and deleted by `gather_generated_results`
(`mesh_evaluation.py:156-186`), preserving the reference's inter-stage npz
protocol (SURVEY.md §0).

TPU-first: the T-step reverse chain is a single jitted lax.scan (batched over
the eval batch); only the finished samples cross back to host.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slide_tpu.data import (BatchLoader, DummyShapesDataset, GeneralNpzDataset,
                            get_dataloader)
from slide_tpu.diffusion import diffusion_sampling
from slide_tpu.ops import sample_keypoints

TASKS = ("generation", "keypoint_generation", "keypoint_conditional_generation",
         "latent_generation", "latent_keypoint_conditional_generation")


def evaluate_per_rank(net, params, trainset_config: dict, sched, save_dir: str,
                      task: str, *, point_feature_dim: int = 3,
                      latent_sampler: Optional[Callable] = None,
                      rank: int = 0, world_size: int = 1, ckpt_info: str = "",
                      keypoint_dim: int = 3, test_external_keypoint: bool = False,
                      external_keypoint_file: Optional[str] = None,
                      split_points_and_normals: bool = False,
                      save_keypoint_feature: bool = False, seed: int = 0,
                      use_dummy_dataset: Optional[bool] = None,
                      visualize: bool = False, mesh=None,
                      custom_sampler: Optional[Callable] = None,
                      local_resampling: bool = False,
                      complete_x0=None, keypoint_mask=None,
                      sampler: str = "ddpm",
                      fastdpm_kw: Optional[dict] = None):
    """Sample and write this rank's npz shard.

    sampler="fastdpm" replaces the T-step eps chain with the S-step FastDPM
    chain (`diffusion/fastdpm.py`; fastdpm_kw: length / sampling_method /
    schedule / kappa) — BASELINE.md config 5's accelerated sharded
    generation.  Latent tasks pass the sampler choice through their own
    `latent_sampler` closure instead (see cli/main.py::cmd_latent_generate).

    latent_sampler, if given, replaces the eps-engine chain (latent diffusion
    tasks): latent_sampler(key, label, keypoint) ->
    (points, keypoint, keypoint_feature).
    custom_sampler(key, label, condition) -> points replaces the chain for
    non-latent tasks (e.g. the x0/chamfer-loss engine, whose reverse chain the
    reference drives via `diffusion_model.denoise`,
    `mesh_evaluation.py:103-125`).

    local_resampling (`mesh_evaluation.py:18, 113-118`): with
    `complete_x0` (B, K, 3+F) and `keypoint_mask` (B, K), only masked
    keypoints' latents are re-generated; the rest stay pinned to complete_x0
    (partial shape editing).  Rows are consumed batch-by-batch in loader
    order; requires a latent task.
    """
    if task not in TASKS:
        raise ValueError(task)
    if local_resampling:
        if latent_sampler is None:
            raise ValueError("local_resampling requires a latent task/sampler")
        if complete_x0 is None or keypoint_mask is None:
            raise ValueError("local_resampling requires complete_x0 and keypoint_mask")
    if trainset_config["dataset"] != "shapenet_psr_dataset":
        raise ValueError("only shapenet_psr_dataset is supported")

    num_points = trainset_config["num_keypoints"] if task == "keypoint_generation" \
        else trainset_config["npoints"]
    os.makedirs(save_dir, exist_ok=True)
    if world_size == 1:
        save_file = os.path.join(
            save_dir, f"shapenet_psr_generated_data_{num_points}_pts{ckpt_info}.npz")
    else:
        save_file = os.path.join(
            save_dir,
            f"shapenet_psr_generated_data_{num_points}_pts_rank_{rank}{ckpt_info}.npz")

    conditional = task in ("keypoint_conditional_generation",
                           "latent_keypoint_conditional_generation")
    eval_bs = int(trainset_config["eval_batch_size"] / world_size)
    if test_external_keypoint:
        loader = BatchLoader(
            GeneralNpzDataset(external_keypoint_file, scale=1, noise_magnitude=0,
                              rank=rank, world_size=world_size),
            eval_bs, shuffle=False)
    elif use_dummy_dataset or (use_dummy_dataset is None and not conditional):
        # unconditional tasks need only labels — run with no data on disk
        n = int(np.ceil(trainset_config["num_samples_tested"] / world_size))
        loader = BatchLoader(
            DummyShapesDataset(trainset_config["data_dir"], n,
                               categories=trainset_config.get("categories"),
                               seed=seed),
            eval_bs, shuffle=False)
    else:
        cfg = dict(trainset_config)
        cfg["batch_size"] = cfg["eval_batch_size"]
        loader = get_dataloader(cfg, phase="train", rank=rank,
                                world_size=world_size,
                                append_samples_to_last_rank=False,
                                shuffle_before_rank_split=False,
                                random_subsample=True,
                                num_samples=cfg["num_samples_tested"], seed=seed)

    def _uses_condition_cache():
        from slide_tpu.models import ConditionalPointNet2
        if not isinstance(net, ConditionalPointNet2):
            return False
        hp = net.config
        return hp.get("include_local_feature", True) or \
            hp.get("include_global_feature", False)

    # The fused single-kernel denoiser (models/fused_denoiser.py, ~1.8x) is
    # the default unconditional path on TPU backends; under a mesh it runs
    # per-shard via shard_map.  SLIDE_TPU_FUSED=0 disables,
    # =interpret forces the kernel in interpret mode (CPU tests).
    fused = None
    fused_env = os.environ.get("SLIDE_TPU_FUSED", "1")
    if fused_env != "0" and (jax.default_backend() not in ("cpu",)
                             or fused_env == "interpret"):
        from slide_tpu.models import ConditionalPointNet2
        from slide_tpu.models.fused_denoiser import make_fused_net_fn
        if isinstance(net, ConditionalPointNet2):
            fused = make_fused_net_fn(net.config, params, num_points,
                                      interpret=fused_env == "interpret",
                                      mesh=mesh)

    def _sample_impl(key, label, condition):
        # encode the condition towers ONCE, outside the T-step scan
        # (the denoiser's cacheable-condition contract; replaces the
        # reference's use_retained_condition_feature mutation)
        cache = None
        if condition is not None and _uses_condition_cache():
            cache = net.apply({"params": params}, condition,
                              method="encode_condition")

        def net_fn(x, ts):
            # shapes are static under jit: ragged final batches fall back
            if fused is not None and condition is None \
                    and fused.batch_ok(x.shape[0]):
                return fused(x, ts, label)
            if cache is not None:
                return net.apply({"params": params}, x, ts=ts, label=label,
                                 cond_cache=cache)
            return net.apply({"params": params}, x, condition=condition,
                             ts=ts, label=label)
        b = label.shape[0]
        if sampler == "fastdpm":
            from slide_tpu.diffusion import diffusion_config_of, fast_sampling
            return fast_sampling(net_fn, key,
                                 (b, num_points, point_feature_dim), sched,
                                 diffusion_config_of(sched),
                                 **(fastdpm_kw or {}))
        if sampler != "ddpm":
            raise ValueError(f"unknown sampler {sampler}")
        return diffusion_sampling(net_fn, key, (b, num_points, point_feature_dim),
                                  sched)

    if mesh is not None:
        # multi-chip generation: shard the sample batch over the mesh's
        # 'data' axis; the whole T-step scan stays on-device per shard
        # (BASELINE.md config 5 / SURVEY.md §5.7a)
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        sample_batch = jax.jit(_sample_impl,
                               in_shardings=(repl, data_sh, None),
                               out_shardings=data_sh)
        n_dev = mesh.devices.size
    else:
        sample_batch = jax.jit(_sample_impl)
        n_dev = 1

    out = {k: [] for k in ("points", "keypoint", "keypoint_feature", "label",
                           "category", "category_name", "gt_points", "timing")}
    key = jax.random.key(seed + rank)
    # local-resampling rows are consumed in loader order; under multi-rank
    # eval the loader holds only this rank's shard, so start at the shard's
    # GLOBAL row (same ceil-split as GeneralNpzDataset / the external
    # keypoint file) — offset 0 on every rank would pair rank>0's samples
    # with another shard's complete_x0 rows
    resample_offset = 0
    if local_resampling and world_size > 1:
        resample_offset = rank * int(np.ceil(len(complete_x0) / world_size))
    for idx, data in enumerate(loader):
        label = jnp.asarray(data["label"], jnp.int32)
        b = int(label.shape[0])
        condition = keypoint = None
        if conditional:
            if test_external_keypoint:
                keypoint = jnp.asarray(data["points"], jnp.float32)
            else:
                gt = jnp.asarray(data["points"], jnp.float32)
                keypoint, _ = sample_keypoints(
                    gt, trainset_config["num_keypoints"],
                    add_centroid=trainset_config.get("add_centroid_to_keypoints", True))
                gtn = np.concatenate([data["points"], data["normals"]], axis=2)
                out["gt_points"].append(gtn)
            nm = trainset_config.get("keypoint_noise_magnitude", 0)
            if nm > 0:
                key, k2 = jax.random.split(key)
                keypoint = keypoint + nm * jax.random.normal(k2, keypoint.shape)
            condition = keypoint
            out["keypoint"].append(np.asarray(keypoint))

        key, k_s = jax.random.split(key)
        t_start = time.time()
        if latent_sampler is not None:
            kw = {}
            if local_resampling:
                kw = {"local_resampling": True,
                      "complete_x0": jnp.asarray(
                          complete_x0[resample_offset:resample_offset + b],
                          jnp.float32),
                      "keypoint_mask": jnp.asarray(
                          keypoint_mask[resample_offset:resample_offset + b],
                          jnp.float32)}
                resample_offset += b
            pts, kp, kpf = latent_sampler(k_s, label=label, keypoint=keypoint, **kw)
            pts = jax.block_until_ready(pts)
            if task == "latent_generation":
                out["keypoint"].append(np.asarray(kp))
            if save_keypoint_feature:
                out["keypoint_feature"].append(np.asarray(kpf))
        elif custom_sampler is not None:
            pts = jax.block_until_ready(custom_sampler(k_s, label, condition))
        else:
            pad = (-b) % n_dev
            if pad:
                label_in = jnp.concatenate([label, jnp.repeat(label[-1:], pad, 0)])
                cond_in = None if condition is None else jnp.concatenate(
                    [condition, jnp.repeat(condition[-1:], pad, 0)])
            else:
                label_in, cond_in = label, condition
            pts = jax.block_until_ready(sample_batch(k_s, label_in, cond_in))
            pts = pts[:b]
        out["timing"].extend([(time.time() - t_start) / b] * b)
        out["points"].append(np.asarray(pts))
        out["label"].append(np.asarray(label))
        out["category"] += list(data["category"])
        out["category_name"] += list(data["category_name"])

    result = {
        "points": np.concatenate(out["points"], axis=0),
        "label": np.concatenate(out["label"], axis=0),
        "category": out["category"],
        "category_name": out["category_name"],
        "timing": np.asarray(out["timing"]),
    }
    for k in ("keypoint", "keypoint_feature", "gt_points"):
        if out[k]:
            result[k] = np.concatenate(out[k], axis=0)
    if split_points_and_normals and result["points"].shape[2] == 6:
        result["normals"] = result["points"][:, :, 3:]
        result["points"] = result["points"][:, :, 0:3]
    np.savez(save_file, **result)
    avg = result["timing"].sum() / result["points"].shape[0]
    print(f"Generated samples saved to {save_file}; "
          f"avg per-sample time {avg:.4f}s", flush=True)
    if visualize and world_size == 1:
        from slide_tpu.vis.pcd import visualize_pcd
        visualize_pcd(save_file)
    return save_file


def gather_generated_results(save_dir: str, world_size: int,
                             num_points: int = 2048, ckpt_info: str = ""):
    """Merge rank shards into one npz and delete them
    (`mesh_evaluation.py:156-186`)."""
    result = {}
    gathered = []
    root = os.path.join(save_dir, f"shapenet_psr_generated_data_{num_points}_pts_rank_")
    save_file = os.path.join(
        save_dir, f"shapenet_psr_generated_data_{num_points}_pts{ckpt_info}.npz")
    for rank in range(world_size):
        rank_file = f"{root}{rank}{ckpt_info}.npz"
        with np.load(rank_file) as data:
            for name in data.files:
                result.setdefault(name, []).append(data[name])
        gathered.append(rank_file)
    np.savez(save_file, **{k: np.concatenate(v, axis=0) for k, v in result.items()})
    for f in gathered:
        os.remove(f)
    return save_file
