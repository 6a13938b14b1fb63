"""SAP / mesh-reconstruction evaluation — reference
`pointnet2/dpsr_evaluation.py:88-391`:

  sap_grid_eval       — DPSR-grid L2 over a loader (checkpoint-selection
                        metric, `evaluate_per_rank` :88-150), with merged
                        history pickle + training-curve plot.
  reconstruct_meshes  — the full mesh path (`visualize_per_rank` :176-289):
                        refine+upsample -> DPSR -> iso-surface -> rescale to
                        the input bbox -> sample points -> PLY + npz outputs.

TPU/host choreography: displacement + DPSR grids run jitted on device; only
finished grids stream to host where marching tetrahedra / PLY writing happen
(SURVEY.md §7.3 item 6).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from slide_tpu.ops import sample_keypoints
from slide_tpu.sap import (mirror_and_concat, network_output_to_dpsr_grid,
                           mc_from_device_psr)
from slide_tpu.sap.refine import compute_center_and_max_length
from slide_tpu.sap.mesh_sampling import (sample_points_from_mesh,
                                         uniform_sample_points_from_mesh)
from slide_tpu.vis.ply import batch_save_pcd, save_mesh_ply


def _prepare_sap_input(data, trainset_config, dpsr_config, key, *,
                       net_apply=None, ae_fns=None, noise_magnitude=0.0):
    """Shared input assembly: normals, optional AE round trip, mirroring."""
    x = jnp.asarray(data["points"], jnp.float32)
    label = jnp.asarray(data["label"], jnp.int32)
    if trainset_config.get("include_normals", True):
        normals = jnp.asarray(data["normals"], jnp.float32)
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        x = jnp.concatenate([x, normals], axis=-1)
    else:
        x = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
    if ae_fns is not None:
        k_ae, key = jax.random.split(key)
        keypoint, _ = sample_keypoints(x[..., :3],
                                       trainset_config["num_keypoints"],
                                       add_centroid=True)
        x = ae_fns(x, keypoint, label, k_ae)
        if noise_magnitude > 0:
            key, k_n = jax.random.split(key)
            x = x + noise_magnitude * jax.random.normal(k_n, x.shape)
    if dpsr_config.get("mirror_before_upsampling", False):
        key, k_p = jax.random.split(key)
        permute = not dpsr_config.get("only_original_points_split", False)
        x = mirror_and_concat(x, axis=2, num_points=(), attach_label=True,
                              permute=permute, key=k_p)[0]
    return x, label


def sap_grid_eval(net, params, dpsr, loader, pointnet_config, dpsr_config,
                  trainset_config, save_dir: str, iteration: int, epoch: int,
                  *, scale: float = 1, seed: int = 0,
                  save_file_name: str = "shapenet_psr_dpsr_eval_result.pkl"):
    """Average DPSR-grid L2 on a loader; appends to the merged history pickle
    and refreshes the training-curve plot.  Returns the mean loss."""
    os.makedirs(save_dir, exist_ok=True)
    save_file = os.path.join(save_dir, save_file_name)
    mirror_first = dpsr_config.get("mirror_before_upsampling", False)
    only_orig = dpsr_config.get("only_original_points_split", False)

    @jax.jit
    def batch_loss(x, label, psr_gt):
        disp = net.apply({"params": params}, x, ts=None, label=label)
        grid, _, _ = network_output_to_dpsr_grid(
            x, disp, dpsr, scale, pointnet_config,
            last_dim_as_indicator=mirror_first,
            only_original_points_split=only_orig)
        return jnp.mean((grid - psr_gt) ** 2)

    key = jax.random.key(seed)
    total, count = 0.0, 0
    for data in loader:
        key, k_b = jax.random.split(key)
        x, label = _prepare_sap_input(data, trainset_config, dpsr_config, k_b)
        psr_gt = jnp.asarray(data["psr"], jnp.float32)
        b = psr_gt.shape[0]
        total += float(batch_loss(x, label, psr_gt)) * b
        count += b
    loss = total / max(count, 1)
    merge_current_with_previous_eval_results(
        {"iter": iteration, "dpsr_grid_L2_loss": loss, "epoch": epoch}, save_file)
    try:
        plot_result(save_file, "dpsr_grid_L2_loss")
    except Exception as e:                                       # noqa: BLE001
        print(f"plotting skipped: {e}")
    return loss


def reconstruct_meshes(net, params, dpsr, loader, pointnet_config, dpsr_config,
                       trainset_config, save_dir: str, *, iteration: int = 0,
                       epoch: int = 0, scale: float = 1, seed: int = 0,
                       rank: int = 0, world_size: int = 1,
                       do_sample_points_from_mesh: bool = False,
                       explicit_normalize: bool = False,
                       return_original_scale: bool = False,
                       label_number: Optional[int] = None,
                       ae_fns=None, noise_magnitude: float = 0.0,
                       transfer_dtype="float16"):
    """Full reconstruction path; writes noisy/refined pcd PLYs, mesh PLYs,
    and (optionally) `points_sampled_from_mesh.npz` /
    `uniform_points_sampled_from_mesh.npz` with keys points/normals/label."""
    vis_dir = os.path.join(
        save_dir, "visualization_results_at_iteration_%s_epoch_%s"
        % (str(iteration).zfill(8), str(epoch).zfill(4)))
    noisy_dir = os.path.join(vis_dir, "noisy_pcd")
    refined_dir = os.path.join(vis_dir, "refined_pcd")
    mesh_dir = os.path.join(vis_dir, "reconstructed_mesh")
    for d in (noisy_dir, refined_dir, mesh_dir):
        os.makedirs(d, exist_ok=True)
    if do_sample_points_from_mesh:
        pts_dir = os.path.join(vis_dir, "points_sampled_from_mesh")
        upts_dir = os.path.join(vis_dir, "uniform_points_sampled_from_mesh")
        os.makedirs(pts_dir, exist_ok=True)
        os.makedirs(upts_dir, exist_ok=True)
        result = {"points": [], "normals": [], "uniform_points": [],
                  "uniform_normals": [], "label": []}

    mirror_first = dpsr_config.get("mirror_before_upsampling", False)
    only_orig = dpsr_config.get("only_original_points_split", False)

    @jax.jit
    def run_net(x, label):
        disp = net.apply({"params": params}, x, ts=None, label=label)
        return network_output_to_dpsr_grid(
            x, disp, dpsr, scale, pointnet_config,
            last_dim_as_indicator=mirror_first,
            only_original_points_split=only_orig,
            explicit_normalize=explicit_normalize)

    # host/device pipelining: mesh extraction + PLY writing for batch i runs
    # in a worker thread while batch i+1's network+DPSR executes on device
    # (jax dispatch is async; only the worker blocks on np.asarray).
    def host_work(outs, x_dev, label_dev, cat, center_dev, max_len_dev,
                  start_idx, rng_seed):
        grid = outs[0]          # device array; fetched inside mc_from_device_psr
        refined_p, refined_n = np.asarray(outs[1]), np.asarray(outs[2])
        x_np = np.asarray(x_dev)
        label_np = np.asarray(label_dev)
        center_np = np.asarray(center_dev)
        max_len_np = np.asarray(max_len_dev)
        rng = np.random.default_rng(rng_seed)
        indicator = x_np[..., -1] if mirror_first else None
        batch_save_pcd(noisy_dir, "noisy_pcd", x_np[..., :3], batch_info=cat,
                       normals=x_np[..., 3:6], indicator=indicator,
                       start_idx=start_idx)
        batch_save_pcd(refined_dir, "refined_pcd", refined_p, batch_info=cat,
                       normals=refined_n, start_idx=start_idx)
        out = {k: [] for k in ("points", "normals", "uniform_points",
                               "uniform_normals", "label")}
        try:
            # on-device cast + per-sample transfer/extraction overlap;
            # transfer_dtype=None keeps f32 for bit-comparable extraction
            verts_l, faces_l, normals_l = mc_from_device_psr(
                grid, transfer_dtype=transfer_dtype)
        except ValueError as e:
            # batched mc_from_psr skips empties, but a SIZE-1 batch re-raises
            # (marching.py semantics) — skip the mesh, keep the run alive
            print(f"mesh {start_idx}: empty surface ({e})", flush=True)
            return out
        for i in range(grid.shape[0]):
            v, f, n = verts_l[i], faces_l[i], normals_l[i]
            if len(v) == 0:
                print(f"mesh {start_idx + i}: empty surface (no level crossing)",
                      flush=True)
                continue
            if return_original_scale:
                c = (v.max(0) + v.min(0)) / 2
                ml = (v.max(0) - v.min(0)).max()
                v = (v - c) / ml * max_len_np[i, 0, 0] + center_np[i, 0]
            tag = cat[i] if cat is not None else "reconstructed_mesh"
            save_mesh_ply(os.path.join(
                mesh_dir, f"{tag}_{str(start_idx + i).zfill(5)}.ply"), v, f, n)
            if do_sample_points_from_mesh:
                p2k, n2k = sample_points_from_mesh(v, f, 2048, rng)
                pu, nu = uniform_sample_points_from_mesh(v, f, 2048, rng=rng)
                out["points"].append(p2k[None])
                out["normals"].append(n2k[None])
                out["uniform_points"].append(pu[None])
                out["uniform_normals"].append(nu[None])
                out["label"].append(label_np[i:i + 1])
        return out

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    key = jax.random.key(seed + rank)
    per_rank = getattr(loader.dataset, "num_samples_per_rank", len(loader.dataset))
    with ThreadPoolExecutor(max_workers=1) as executor:
        futures: deque = deque()

        def drain_one():
            # merge in submission order; surfaces host errors within two
            # batches instead of after the whole device pass
            batch_out = futures.popleft().result()
            if do_sample_points_from_mesh:
                for k in result:
                    result[k] += batch_out[k]

        pending = None
        batch_idx = 0
        for data in loader:
            if "label" not in data:
                data = dict(data)
                data["label"] = np.full(np.asarray(data["points"]).shape[0],
                                        label_number, np.int64)
            orig_pts = jnp.asarray(data["points"], jnp.float32)
            center, max_len = compute_center_and_max_length(orig_pts)
            key, k_b = jax.random.split(key)
            x, label = _prepare_sap_input(data, trainset_config, dpsr_config,
                                          k_b, ae_fns=ae_fns,
                                          noise_magnitude=noise_magnitude)
            outs = run_net(x, label)            # async dispatch
            if pending is not None:
                futures.append(executor.submit(host_work, *pending))
                # backpressure: pipeline depth 2 — don't pin every batch's
                # device buffers when the host side is the bottleneck
                while len(futures) >= 2:
                    drain_one()
            start_idx = per_rank * rank + loader.batch_size * batch_idx
            pending = (outs, x, label, data.get("category_name"), center,
                       max_len, start_idx, seed + rank + 1000 * batch_idx)
            batch_idx += 1
        if pending is not None:
            futures.append(executor.submit(host_work, *pending))
        while futures:
            drain_one()

    if do_sample_points_from_mesh and result["points"]:
        pts = np.concatenate(result["points"], axis=0)
        nrm = np.concatenate(result["normals"], axis=0)
        lab = np.concatenate(result["label"], axis=0)
        np.savez(os.path.join(vis_dir, "points_sampled_from_mesh.npz"),
                 points=pts, normals=nrm, label=lab)
        np.savez(os.path.join(vis_dir, "uniform_points_sampled_from_mesh.npz"),
                 points=np.concatenate(result["uniform_points"], axis=0),
                 normals=np.concatenate(result["uniform_normals"], axis=0),
                 label=lab)
        batch_save_pcd(pts_dir, "pcd_from_mesh", pts, normals=nrm)
    return vis_dir


def merge_current_with_previous_eval_results(current: dict, save_file: str):
    """Append this checkpoint's metrics to the history pickle
    (`dpsr_evaluation.py:153-174`)."""
    if os.path.isfile(save_file):
        with open(save_file, "rb") as f:
            history = pickle.load(f)
        for k, v in current.items():
            history.setdefault(k, []).append(v)
    else:
        history = {k: [v] for k, v in current.items()}
    with open(save_file, "wb") as f:
        pickle.dump(history, f)
    return history


def plot_result(save_file: str, metric: str, out_png: Optional[str] = None):
    """Training-curve plot with lowest-value marker
    (`dpsr_evaluation.py:349-391`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(save_file, "rb") as f:
        history = pickle.load(f)
    iters = np.asarray(history["iter"])
    vals = np.asarray(history[metric])
    order = np.argsort(iters)
    iters, vals = iters[order], vals[order]
    best = int(np.argmin(vals))
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(iters, vals, marker="o", ms=3)
    ax.scatter([iters[best]], [vals[best]], color="red", zorder=3)
    ax.set_xlabel("iteration")
    ax.set_ylabel(metric)
    ax.set_title(f"lowest {metric}: {vals[best]:.6g} @ iter {iters[best]}")
    out_png = out_png or (os.path.splitext(save_file)[0] + f"_{metric}.png")
    fig.tight_layout()
    fig.savefig(out_png, dpi=100)
    plt.close(fig)
    print(f"lowest {metric} is {vals[best]:.8f} at iteration {iters[best]}",
          flush=True)
    return out_png
