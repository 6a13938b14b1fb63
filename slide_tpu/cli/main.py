"""CLI implementation.  See package docstring for the command map; reference
behaviors: task dispatch (`distributed.py:209-218`), ema-indexed checkpoint
loading (`point_cloud_generation.py:23-28`), npz-set comparison
(`load_evaluate.py:23-130`)."""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np


def load_inference_params(ckpt_path: str, ema_idx: int = -1):
    """Model params from a checkpoint; ema_idx >= 0 selects an EMA shadow
    (`point_cloud_generation.py:23-28`)."""
    with open(ckpt_path, "rb") as f:
        ckpt = pickle.load(f)
    if ema_idx >= 0:
        return ckpt["ema_state_list"][ema_idx]
    return ckpt["model_state_dict"]


def normalize_point_cloud(all_points, normalize_std_per_axis: bool = True,
                          normalize_per_shape: bool = True,
                          all_points_mean=None, all_points_std=None,
                          input_dim: int = 3, box_per_shape: bool = False):
    """(`load_evaluate.py:48-76`).  Returns (normalized, mean, std)."""
    pts = np.asarray(all_points)
    if all_points_mean is not None and all_points_std is not None:
        mean, std = all_points_mean, all_points_std
    elif normalize_per_shape:
        b, n = pts.shape[:2]
        mean = pts.mean(axis=1).reshape(b, 1, input_dim)
        if normalize_std_per_axis:
            std = pts.reshape(b, n, -1).std(axis=1).reshape(b, 1, input_dim)
        else:
            std = pts.reshape(b, -1).std(axis=1).reshape(b, 1, 1)
    elif box_per_shape:
        b = pts.shape[0]
        mean = pts.min(axis=1).reshape(b, 1, input_dim)
        std = (pts.max(axis=1) - pts.min(axis=1)).reshape(b, 1, input_dim)
    else:
        mean = pts.reshape(-1, input_dim).mean(axis=0).reshape(1, 1, input_dim)
        if normalize_std_per_axis:
            std = pts.reshape(-1, input_dim).std(axis=0).reshape(1, 1, input_dim)
        else:
            std = pts.reshape(-1).std().reshape(1, 1, 1)
    return (pts - mean) / std, mean, std


def _read_config(path: str) -> dict:
    from slide_tpu.config import read_json_file
    return read_json_file(path)


def _setup_rank(args):
    """Resolve (rank, world_size) for this process.

    `--coordinator_address` initializes jax.distributed (one process per
    host, the TPU-pod replacement for the reference's per-GPU spawn,
    `distributed.py:154-182`); rank/world then come from the jax process
    grid.  Explicit `--rank/--world_size` override for file-sharded eval
    runs launched as independent processes (merge shards afterwards with
    the `gather` subcommand)."""
    import jax
    from slide_tpu.parallel import maybe_initialize_distributed
    maybe_initialize_distributed(getattr(args, "coordinator_address", None),
                                 getattr(args, "num_processes", None),
                                 getattr(args, "process_id", None))
    rank, world = jax.process_index(), jax.process_count()
    if getattr(args, "rank", None) is not None:
        rank = args.rank
    if getattr(args, "world_size", None) is not None:
        world = args.world_size
    return rank, world


def cmd_train(args):
    _setup_rank(args)          # multi-host: join the jax process grid
    from slide_tpu.train import (train_position_ddpm, train_autoencoder,
                                 train_latent_ddpm, train_upsampler)
    config = _read_config(args.config)
    task = config["train_config"]["task"]
    kw = dict(max_iters=args.max_iters, seed=args.seed)
    if task in ("generation", "keypoint_generation",
                "keypoint_conditional_generation"):
        train_position_ddpm(config, **kw)
    elif task == "autoencode":
        train_autoencoder(config, **kw)
    elif task in ("latent_generation", "latent_keypoint_conditional_generation"):
        ae_ckpt = args.ae_ckpt or config["autoencoder_config"]["ckpt"]
        ae_params = load_inference_params(ae_ckpt)
        train_latent_ddpm(config, ae_params, **kw)
    elif task == "upsample":
        ae_params = None
        if args.ae_ckpt:
            ae_params = load_inference_params(args.ae_ckpt)
        train_upsampler(config, ae_params=ae_params, **kw)
    else:
        raise SystemExit(f"unknown task {task}")


def cmd_generate(args):
    from slide_tpu.diffusion import calc_diffusion_hyperparams
    from slide_tpu.eval import evaluate_per_rank
    from slide_tpu.models import ConditionalPointNet2
    config = _read_config(args.config)
    dc = config["diffusion_config"]
    sched = calc_diffusion_hyperparams(dc["T"], dc["beta_0"], dc["beta_T"])
    net = ConditionalPointNet2(config["pointnet_config"])
    params = load_inference_params(args.ckpt, args.ema_idx)
    ts_cfg = dict(config["shapenet_psr_dataset_config"])
    if args.num_samples:
        ts_cfg["num_samples_tested"] = args.num_samples
    if args.batch_size:
        ts_cfg["eval_batch_size"] = args.batch_size
    rank, world = _setup_rank(args)
    evaluate_per_rank(net, params, ts_cfg, sched, args.save_dir,
                      config["train_config"]["task"],
                      point_feature_dim=3 + config["pointnet_config"]["in_fea_dim"],
                      rank=rank, world_size=world,
                      split_points_and_normals=True, seed=args.seed,
                      visualize=not args.no_visualize,
                      sampler=args.sampler,
                      fastdpm_kw={"length": args.fastdpm_s,
                                  "sampling_method": args.fastdpm_method,
                                  "schedule": args.fastdpm_schedule,
                                  "kappa": args.fastdpm_kappa})


def cmd_latent_generate(args):
    import jax
    import jax.numpy as jnp
    from slide_tpu.diffusion.latent import latent_denoise_and_reconstruct
    from slide_tpu.diffusion.x0 import X0Schedule
    from slide_tpu.eval import evaluate_per_rank
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.train import build_autoencoder
    config = _read_config(args.config)
    sdc = config["standard_diffusion_config"]
    sched = X0Schedule.from_config(sdc)
    net = ConditionalPointNet2(config["pointnet_config"])
    params = load_inference_params(args.ckpt, args.ema_idx)
    ae = build_autoencoder(config["autoencoder_config"]["pointnet_config"])
    ae_ckpt = args.ae_ckpt or config["autoencoder_config"]["ckpt"]
    ae_params = load_inference_params(ae_ckpt)
    ts_cfg = dict(config["shapenet_psr_dataset_config"])
    if args.num_samples:
        ts_cfg["num_samples_tested"] = args.num_samples
    if args.batch_size:
        ts_cfg["eval_batch_size"] = args.batch_size
    k = ts_cfg["num_keypoints"]
    feat_dim = config["pointnet_config"]["in_fea_dim"]

    fused = None
    if os.environ.get("SLIDE_TPU_FUSED", "1") != "0" \
            and jax.default_backend() not in ("cpu",):
        from slide_tpu.models.fused_denoiser import make_fused_net_fn
        fused = make_fused_net_fn(config["pointnet_config"], params, k)

    sampler_kw = {}
    if args.sampler == "fastdpm":
        sampler_kw = {"sampler": "fastdpm",
                      "fastdpm_kw": {"length": args.fastdpm_s,
                                     "schedule": args.fastdpm_schedule,
                                     "kappa": args.fastdpm_kappa}}

    def latent_sampler(key, label, keypoint, **resample_kw):
        def net_fn(x, ts):
            if fused is not None and fused.batch_ok(x.shape[0]):
                return fused(x, ts, label)
            return net.apply({"params": params}, x, ts=ts, label=label)

        def decode_fn(kp, feat, lbl, kk):
            return ae.apply({"params": ae_params}, kp, feat, label=lbl,
                            method=ae.decode, rngs={"fps": kk})

        return latent_denoise_and_reconstruct(
            net_fn, decode_fn, key, label.shape[0], 3, (k, 3 + feat_dim),
            sched, label=label, keypoint=keypoint, **resample_kw, **sampler_kw)

    # partial shape editing: re-generate only masked keypoints' latents
    # (`mesh_evaluation.py:113-118`, `diffusion.py:352-359`)
    local_resampling = getattr(args, "local_resampling_file", None) is not None
    complete_x0 = keypoint_mask = None
    if local_resampling:
        with np.load(args.local_resampling_file) as d:
            complete_x0 = d["complete_x0"]
            keypoint_mask = d["keypoint_mask"]

    rank, world = _setup_rank(args)
    evaluate_per_rank(net, params, ts_cfg, None, args.save_dir,
                      config["train_config"]["task"],
                      point_feature_dim=feat_dim,
                      rank=rank, world_size=world,
                      latent_sampler=latent_sampler,
                      test_external_keypoint=args.external_keypoint_file is not None,
                      external_keypoint_file=args.external_keypoint_file,
                      save_keypoint_feature=args.save_keypoint_feature,
                      split_points_and_normals=True, seed=args.seed,
                      visualize=not args.no_visualize,
                      local_resampling=local_resampling,
                      complete_x0=complete_x0, keypoint_mask=keypoint_mask)


def _load_ae(args, config):
    from slide_tpu.train import build_autoencoder
    ae = build_autoencoder(config["pointnet_config"])
    params = load_inference_params(args.ckpt)
    return ae, params


def cmd_encode(args):
    import jax
    import jax.numpy as jnp
    from slide_tpu.data import GeneralNpzDataset, BatchLoader
    from slide_tpu.ops import sample_keypoints
    config = _read_config(args.config)
    ae, params = _load_ae(args, config)
    ds = GeneralNpzDataset(args.dataset_path, scale=1, noise_magnitude=0)
    loader = BatchLoader(ds, args.batch_size, shuffle=False)
    k = config["shapenet_psr_dataset_config"]["num_keypoints"]
    key = jax.random.key(args.seed)
    out = {"points": [], "keypoint": [], "keypoint_feature": [], "label": []}
    for data in loader:
        pts = jnp.asarray(data["points"], jnp.float32)
        if "normals" in data:
            x = jnp.concatenate([pts, jnp.asarray(data["normals"], jnp.float32)],
                                axis=-1)
        else:
            x = pts
        label = jnp.asarray(data["label"], jnp.int32)
        if args.keypoint_source == "farthest_points_sampling" or "keypoint" not in data:
            kp, _ = sample_keypoints(pts[..., :3], k, add_centroid=True)
        else:
            kp = jnp.asarray(data["keypoint"], jnp.float32)
        key, k_g, k_f = jax.random.split(key, 3)
        feat = ae.apply({"params": params}, x, kp, label=label, method=ae.encode,
                        rngs={"gaussian": k_g})
        recon = ae.apply({"params": params}, kp, feat, label=label,
                         method=ae.decode, rngs={"fps": k_f})
        out["points"].append(np.asarray(recon))
        out["keypoint"].append(np.asarray(kp))
        out["keypoint_feature"].append(np.asarray(feat))
        out["label"].append(np.asarray(label))
    os.makedirs(args.save_dir, exist_ok=True)
    save = os.path.join(args.save_dir, "autoencoder_reconstruction.npz")
    payload = {k2: np.concatenate(v, axis=0) for k2, v in out.items() if v}
    if not args.save_keypoint_feature:
        payload.pop("keypoint_feature", None)
    np.savez(save, **payload)
    print(f"reconstructions saved to {save}")


def cmd_decode(args):
    import jax
    import jax.numpy as jnp
    from slide_tpu.data import GeneralNpzDataset, BatchLoader
    config = _read_config(args.config)
    ae, params = _load_ae(args, config)
    ds = GeneralNpzDataset(args.dataset_path, scale=1, noise_magnitude=0,
                           data_key="keypoint")
    loader = BatchLoader(ds, args.batch_size, shuffle=False)
    key = jax.random.key(args.seed)
    out = {"points": [], "keypoint": [], "label": []}
    for data in loader:
        kp = jnp.asarray(data["keypoint"], jnp.float32)
        feat = jnp.asarray(data["keypoint_feature"], jnp.float32)
        label = jnp.asarray(data["label"], jnp.int32)
        key, k_f = jax.random.split(key)
        recon = ae.apply({"params": params}, kp, feat, label=label,
                         method=ae.decode, rngs={"fps": k_f})
        out["points"].append(np.asarray(recon))
        out["keypoint"].append(np.asarray(kp))
        out["label"].append(np.asarray(label))
    os.makedirs(args.save_dir, exist_ok=True)
    save = os.path.join(args.save_dir, "decoded_from_keypoints.npz")
    np.savez(save, **{k2: np.concatenate(v, axis=0) for k2, v in out.items()})
    print(f"decoded clouds saved to {save}")


def cmd_reconstruct(args):
    from slide_tpu.data import GeneralNpzDataset, BatchLoader
    from slide_tpu.eval import reconstruct_meshes
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.sap import DPSR
    config = _read_config(args.config)
    net = ConditionalPointNet2(config["pointnet_config"])
    params = load_inference_params(args.ckpt, args.ema_idx)
    dpsr_config = config["dpsr_config"]
    dpsr = DPSR((dpsr_config["grid_res"],) * 3, sig=dpsr_config["psr_sigma"])
    ds = GeneralNpzDataset(args.dataset_path, scale=1, noise_magnitude=0,
                           data_key="points",
                           data_key_split_names=["points", "normals"],
                           data_key_split_dims=[0, 3, 6])
    loader = BatchLoader(ds, args.batch_size, shuffle=False)
    vis_dir = reconstruct_meshes(
        net, params, dpsr, loader, config["pointnet_config"], dpsr_config,
        config["shapenet_psr_dataset_config"], args.save_dir,
        do_sample_points_from_mesh=True, explicit_normalize=True,
        return_original_scale=args.return_original_scale,
        label_number=args.label_number, seed=args.seed)
    print(f"meshes saved under {vis_dir}")


def cmd_evaluate(args):
    import jax.numpy as jnp
    from slide_tpu.ops import calc_cd
    with np.load(args.gen) as d:
        gen = d["points"][..., :3].astype(np.float32)
    with np.load(args.ref) as d:
        ref = d["points"][..., :3].astype(np.float32)
    n = min(len(gen), len(ref))
    gen, ref = gen[:n], ref[:n]
    if args.normalize:
        gen, _, _ = normalize_point_cloud(gen)
        ref, _, _ = normalize_point_cloud(ref)
    if args.batch_size < 1:
        raise SystemExit("--batch_size must be >= 1")
    # paired metrics in --batch_size chunks: calc_cd materializes a
    # (B, N, N) distance tensor, so the whole set at once would OOM
    chunks = []
    for i in range(0, n, args.batch_size):
        r = calc_cd(jnp.asarray(gen[i:i + args.batch_size]),
                    jnp.asarray(ref[i:i + args.batch_size]), calc_f1=True)
        chunks.append({k: np.asarray(v) for k, v in r.items()})
    report = {k: float(np.mean(np.concatenate([c[k] for c in chunks])))
              for k in chunks[0]}
    if args.all_metrics:
        from slide_tpu.eval import compute_all_metrics, jsd_between_point_cloud_sets
        report.update(compute_all_metrics(gen, ref, batch_size=args.batch_size))
        try:
            report["JSD"] = float(jsd_between_point_cloud_sets(gen, ref))
        except ValueError as e:
            print(f"JSD skipped: {e}")
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


def read_eval_result(file: str, loss: str = "dpsr_grid_L2_loss") -> dict:
    """Eval-history entry at the lowest value of `loss` — reference
    `data_utils/read_pickle.py` (argmin over `dpsr_grid_L2_loss`, then every
    key at that index)."""
    with open(file, "rb") as f:
        data = pickle.load(f)
    if loss not in data:
        raise SystemExit(f"key {loss!r} not in {sorted(data.keys())}")
    y = np.asarray(data[loss], dtype=np.float64)
    idx = int(np.argmin(y))
    print(f"The lowest {loss} is at index {idx}")
    report = {}
    for key, vals in data.items():
        try:
            report[key] = vals[idx]
        except (TypeError, IndexError, KeyError):
            continue
        print(key, report[key])
    return report


def cmd_read_eval(args):
    read_eval_result(args.file, args.loss)


def cmd_correct_labels(args):
    """Remap npz labels from folder-listing to sorted-category order —
    reference `visualization_tools/correct_labels.py`."""
    from slide_tpu.data.tools import remap_labels_to_sorted
    out = remap_labels_to_sorted(args.npz, args.dataset_folder, args.out)
    print(f"remapped labels saved to {out}")


def cmd_gather(args):
    from slide_tpu.eval import gather_generated_results
    out = gather_generated_results(args.save_dir, args.world_size,
                                   num_points=args.num_points)
    print(f"merged {args.world_size} rank shards into {out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="slide_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, config=True, ckpt=False):
        if config:
            sp.add_argument("-c", "--config", required=True)
        if ckpt:
            sp.add_argument("--ckpt", required=True)
            sp.add_argument("--ema_idx", type=int, default=-1)
        sp.add_argument("--seed", type=int, default=0)
        # multi-host: jax.distributed rendezvous (one process per host)
        sp.add_argument("--coordinator_address", type=str, default=None)
        sp.add_argument("--num_processes", type=int, default=None)
        sp.add_argument("--process_id", type=int, default=None)

    def ranked(sp):
        # file-sharded eval launched as independent processes
        sp.add_argument("--rank", type=int, default=None)
        sp.add_argument("--world_size", type=int, default=None)

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--max_iters", type=int, default=None)
    sp.add_argument("--ae_ckpt", type=str, default=None)
    sp.set_defaults(fn=cmd_train)

    def fastdpm_args(sp, methods=("var", "step")):
        # accelerated sampling (BASELINE.md config 5; util_fastdpmv2.py)
        sp.add_argument("--sampler", choices=("ddpm", "fastdpm"),
                        default="ddpm")
        sp.add_argument("--fastdpm_s", type=int, default=50,
                        help="number of accelerated reverse steps")
        sp.add_argument("--fastdpm_method", choices=methods,
                        default=methods[-1])
        sp.add_argument("--fastdpm_schedule", choices=("linear", "quadratic"),
                        default="quadratic")
        sp.add_argument("--fastdpm_kappa", type=float, default=1.0)

    sp = sub.add_parser("generate")
    common(sp, ckpt=True)
    sp.add_argument("--num_samples", type=int, default=None)
    sp.add_argument("--batch_size", type=int, default=None)
    sp.add_argument("--save_dir", default="ddpm_generated_point_clouds")
    sp.add_argument("--no_visualize", action="store_true")
    fastdpm_args(sp)
    ranked(sp)
    sp.set_defaults(fn=cmd_generate)

    sp = sub.add_parser("latent-generate")
    common(sp, ckpt=True)
    sp.add_argument("--ae_ckpt", type=str, default=None)
    sp.add_argument("--num_samples", type=int, default=None)
    sp.add_argument("--batch_size", type=int, default=None)
    sp.add_argument("--save_dir", default="latent_generated_point_clouds")
    sp.add_argument("--external_keypoint_file", type=str, default=None)
    sp.add_argument("--local_resampling_file", type=str, default=None,
                    help="npz with complete_x0 (B,K,3+F) and keypoint_mask "
                         "(B,K): re-generate only masked keypoints' latents "
                         "(partial shape editing)")
    sp.add_argument("--save_keypoint_feature", action="store_true")
    sp.add_argument("--no_visualize", action="store_true")
    fastdpm_args(sp, methods=("step",))   # x0 engine: STEP only (fastdpm.py)
    ranked(sp)
    sp.set_defaults(fn=cmd_latent_generate)

    sp = sub.add_parser("encode")
    common(sp)
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--dataset_path", required=True)
    sp.add_argument("--save_dir", required=True)
    sp.add_argument("--batch_size", type=int, default=32)
    sp.add_argument("--keypoint_source", default="farthest_points_sampling")
    sp.add_argument("--save_keypoint_feature", action="store_true")
    sp.set_defaults(fn=cmd_encode)

    sp = sub.add_parser("decode")
    common(sp)
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--dataset_path", required=True)
    sp.add_argument("--save_dir", required=True)
    sp.add_argument("--batch_size", type=int, default=32)
    sp.set_defaults(fn=cmd_decode)

    sp = sub.add_parser("reconstruct")
    common(sp, ckpt=True)
    sp.add_argument("--dataset_path", required=True)
    sp.add_argument("--save_dir", required=True)
    sp.add_argument("--batch_size", type=int, default=8)
    sp.add_argument("--return_original_scale", action="store_true")
    sp.add_argument("--label_number", type=int, default=0)
    sp.set_defaults(fn=cmd_reconstruct)

    sp = sub.add_parser("gather")
    sp.add_argument("--save_dir", required=True)
    sp.add_argument("--world_size", type=int, required=True)
    sp.add_argument("--num_points", type=int, default=2048)
    sp.set_defaults(fn=cmd_gather)

    sp = sub.add_parser("read-eval")
    sp.add_argument("--file", required=True,
                    help="eval-history pickle (e.g. *_eval_result.pkl)")
    sp.add_argument("--loss", default="dpsr_grid_L2_loss")
    sp.set_defaults(fn=cmd_read_eval)

    sp = sub.add_parser("correct-labels")
    sp.add_argument("--npz", required=True)
    sp.add_argument("--dataset_folder", required=True)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_correct_labels)

    sp = sub.add_parser("evaluate")
    sp.add_argument("--gen", required=True)
    sp.add_argument("--ref", required=True)
    sp.add_argument("--normalize", action="store_true")
    sp.add_argument("--all-metrics", dest="all_metrics", action="store_true")
    sp.add_argument("--batch_size", type=int, default=32)
    sp.add_argument("--out", type=str, default=None)
    sp.set_defaults(fn=cmd_evaluate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
