"""Autoencoder evaluation — reference `pointnet2/autoencoder_evaluation.py`:

  ae_visual_eval       — hierarchical per-level reconstructions pickled (+
                         optional reconstructed_pcd.npz), per-rank with the
                         rank-file gather protocol (`evaluate_per_rank`
                         :16-106 + `gather_generated_results` :108-146).
  ae_quantitative_eval — last-level cd_p/cd_t/f1/kl averages appended to the
                         merged history pickle (`quantitative_evaluate_per_rank`
                         :148-194).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from slide_tpu.eval.mesh_recon import merge_current_with_previous_eval_results
from slide_tpu.ops import sample_keypoints


def _prepare_ae_batch(data, trainset_config, key, keypoint_source):
    points = jnp.asarray(data["points"], jnp.float32)
    normals = jnp.asarray(data["normals"], jnp.float32)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    label = jnp.asarray(data["label"], jnp.int32)
    if keypoint_source == "farthest_points_sampling":
        sub_key = None
        if not trainset_config.get("add_centroid_to_keypoints", True) or \
                trainset_config.get("random_subsample", False):
            key, sub_key = jax.random.split(key)
        keypoints, _ = sample_keypoints(
            points, trainset_config["num_keypoints"],
            add_centroid=trainset_config.get("add_centroid_to_keypoints", True),
            random_subsample=trainset_config.get("random_subsample", False),
            key=sub_key)
    else:
        keypoints = jnp.asarray(data["keypoint"], jnp.float32)
    nm = trainset_config.get("keypoint_noise_magnitude", 0)
    if nm > 0:
        key, k_n = jax.random.split(key)
        keypoints = keypoints + nm * jax.random.normal(k_n, keypoints.shape)
    x = jnp.concatenate([points, normals], axis=-1)
    return x, keypoints, label, points


def ae_visual_eval(ae, params, loader, save_dir: str, iteration: int,
                   epoch: int, trainset_config: dict, *, rank: int = 0,
                   world_size: int = 1, save_reconstructed_pcd: bool = False,
                   keypoint_source: str = "farthest_points_sampling",
                   save_keypoint_feature: bool = False, seed: int = 0,
                   visualize: bool = False):
    os.makedirs(save_dir, exist_ok=True)
    stem = ("shapenet_psr_autoencoder_visualization_result_iteration_%s_epoch_%s"
            % (str(iteration).zfill(8), str(epoch).zfill(4)))
    save_file = os.path.join(
        save_dir, stem + (f"_rank_{rank}.pkl" if world_size > 1 else ".pkl"))

    key = jax.random.key(seed + rank)
    total_xyz = None
    acc = {"label": [], "category": [], "category_name": [], "model": [],
           "gt_points": [], "keypoint": [], "keypoint_feature": []}
    for data in loader:
        key, k_prep, k_g, k_f = jax.random.split(key, 4)
        x, keypoints, label, points = _prepare_ae_batch(
            data, trainset_config, k_prep, keypoint_source)
        l_xyz, _, feat = ae.apply({"params": params}, x, keypoints,
                                  label=label, loss_type="cd_p",
                                  return_keypoint_feature=True,
                                  rngs={"gaussian": k_g, "fps": k_f})
        if total_xyz is None:
            total_xyz = [[np.asarray(v)] for v in l_xyz]
        else:
            for i, v in enumerate(l_xyz):
                total_xyz[i].append(np.asarray(v))
        acc["keypoint"].append(np.asarray(keypoints))
        if save_keypoint_feature:
            acc["keypoint_feature"].append(np.asarray(feat))
        acc["gt_points"].append(np.asarray(points))
        acc["label"].append(np.asarray(label))
        acc["category"] += list(data.get("category", []))
        acc["category_name"] += list(data.get("category_name", []))
        acc["model"] += list(data.get("model", []))

    total_xyz = [np.concatenate(v, axis=0) for v in total_xyz]
    label = np.concatenate(acc["label"], axis=0)
    payload = {"hierarchical_pointcloud": total_xyz, "label": label,
               "category": acc["category"], "category_name": acc["category_name"],
               "gt_points": np.concatenate(acc["gt_points"], axis=0),
               "model": acc["model"]}
    with open(save_file, "wb") as f:
        pickle.dump(payload, f)

    if save_reconstructed_pcd:
        last = total_xyz[-1]
        result = {"points": last[..., :3], "label": label,
                  "category": acc["category"],
                  "category_name": acc["category_name"], "model": acc["model"],
                  "keypoint": np.concatenate(acc["keypoint"], axis=0)}
        if last.shape[2] == 6:
            result["normals"] = last[..., 3:6]
        if save_keypoint_feature:
            result["keypoint_feature"] = np.concatenate(acc["keypoint_feature"],
                                                        axis=0)
        np.savez(os.path.join(save_dir, "reconstructed_pcd.npz"), **result)
    if visualize and world_size == 1:
        from slide_tpu.vis.pcd import visualize_hierarchical_pcd as _vh

        # the hierarchical visualizer reads the 'l_xyz'/list payload
        with open(save_file, "rb") as f:
            p = pickle.load(f)
        tmp = save_file + ".levels.pkl"
        with open(tmp, "wb") as f:
            pickle.dump(p["hierarchical_pointcloud"], f)
        _vh(tmp)
        os.remove(tmp)
    return save_file


def gather_ae_visual_results(save_dir: str, iteration: int, epoch: int,
                             world_size: int):
    """Merge rank pickles and delete them
    (`autoencoder_evaluation.py:108-146`)."""
    stem = ("shapenet_psr_autoencoder_visualization_result_iteration_%s_epoch_%s"
            % (str(iteration).zfill(8), str(epoch).zfill(4)))
    result = {}
    gathered = []
    for rank in range(world_size):
        rank_file = os.path.join(save_dir, stem + f"_rank_{rank}.pkl")
        with open(rank_file, "rb") as f:
            data = pickle.load(f)
        for k, v in data.items():
            if k not in result:
                result[k] = v
            elif isinstance(v, np.ndarray):
                result[k] = np.concatenate([result[k], v], axis=0)
            elif isinstance(v, list) and v and isinstance(v[0], np.ndarray):
                result[k] = [np.concatenate([a, b], axis=0)
                             for a, b in zip(result[k], v)]
            else:
                result[k] = result[k] + v
        gathered.append(rank_file)
    save_file = os.path.join(save_dir, stem + ".pkl")
    with open(save_file, "wb") as f:
        pickle.dump(result, f)
    for fpath in gathered:
        os.remove(fpath)
    return save_file


def ae_quantitative_eval(ae, params, loader, save_dir: str, iteration: int,
                         epoch: int, trainset_config: dict, *, seed: int = 0,
                         save_file_name: str =
                         "shapenet_psr_autoencoder_quantitative_eval_result.pkl"):
    """Average LAST-LEVEL losses over a loader, appended to the history
    pickle.  Returns the current results dict."""
    os.makedirs(save_dir, exist_ok=True)
    save_file = os.path.join(save_dir, save_file_name)
    key = jax.random.key(seed)
    sums, count = {}, 0
    for data in loader:
        key, k_prep, k_g, k_f = jax.random.split(key, 4)
        x, keypoints, label, points = _prepare_ae_batch(
            data, trainset_config, k_prep, "farthest_points_sampling")
        _, loss_list = ae.apply({"params": params}, x, keypoints, label=label,
                                loss_type="cd_p",
                                rngs={"gaussian": k_g, "fps": k_f})
        last = loss_list[-1]
        b = points.shape[0]
        for k2, v in last.items():
            sums[k2] = sums.get(k2, 0.0) + float(jnp.mean(v)) * b
        count += b
    current = {"iter": iteration, "epoch": epoch}
    current.update({k2: v / max(count, 1) for k2, v in sums.items()})
    merge_current_with_previous_eval_results(current, save_file)
    return current
