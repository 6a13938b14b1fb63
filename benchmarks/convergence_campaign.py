"""Convergence campaign (VERDICT r1 item 7): train all four stages on the
real chip against a few-hundred-shape synthetic corpus, then run the full
generation pipeline and the complete generative-metric suite on hundreds of
samples — the scaled-up version of round 1's 24-shape check, mirroring the
reference's eval protocol (`pointnet2/models/pvd/metrics/
evaluation_metrics.py:129-157` and `mesh_evaluation.py:15-186`).

Stages are independent and resumable (checkpoints land under
runs/convergence/exps/<stage>):

  python benchmarks/convergence_campaign.py data        # write the corpus
  python benchmarks/convergence_campaign.py kp          # keypoint DDPM
  python benchmarks/convergence_campaign.py ae          # autoencoder
  python benchmarks/convergence_campaign.py lat         # latent DDPM
  python benchmarks/convergence_campaign.py sap         # SAP upsampler
  python benchmarks/convergence_campaign.py eval        # metrics report

The report is written to runs/convergence/report.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runs", "convergence")
DATA = os.path.join(ROOT, "data")
SAP_DATA = os.path.join(ROOT, "sap_data")
EXPS = os.path.join(ROOT, "exps")
# durable (git-tracked) checkpoint mirror: two round-4 VM resets wiped the
# gitignored runs/ tree and with it whole campaigns — every save is mirrored
# here (train/checkpoint.py::mirror_checkpoint) and _latest_ckpt falls back
# to the mirror, so a reset costs a restore instead of the round
DURABLE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "ckpts")

# The reference's 5 trained categories (README.md:86-135); the synthetic
# corpus gives each a separable shape distribution (data/synthetic.py
# CATEGORY_AXIS_RANGES) so the class conditioning does real work and the
# per-category metric blocks in report.json are meaningful (VERDICT r3
# item 7).
CATEGORIES = ("airplane", "cabinet", "car", "chair", "lamp")
SYNSETS = ("02691156", "02933112", "02958343", "03001627", "03636649")
MODELS_PER_SPLIT = 120           # x5 categories = 600 shapes/split
SAP_MODELS = 60

import jax                                                  # noqa: E402
import jax.numpy as jnp                                     # noqa: E402
import numpy as np                                          # noqa: E402

from benchmarks.tpu_cache import enable_tpu_only_cache  # noqa: E402
enable_tpu_only_cache()


def _label_synset(idx: int) -> str:
    """Loader label index -> synset id (labels are indices over the SORTED
    13 metadata synsets — data/shapenet_psr.py::load_metadata)."""
    from slide_tpu.data.synthetic import ALL_SYNSETS
    ordered = sorted(ALL_SYNSETS)
    return ordered[idx] if 0 <= idx < len(ordered) else "?"


def _latest_ckpt(exp_root):
    from slide_tpu.train.checkpoint import load_checkpoint
    paths = glob.glob(os.path.join(exp_root, "**", "pointnet_ckpt_*.pkl"),
                      recursive=True)
    # VM-reset fallback: the durable mirror under benchmarks/results/ckpts/
    # survives a wiped runs/ tree
    paths += glob.glob(os.path.join(DURABLE, os.path.basename(exp_root),
                                    "pointnet_ckpt_*.pkl"))
    if not paths:
        raise FileNotFoundError(f"no checkpoint under {exp_root} (or its "
                                f"durable mirror)")
    best = max(paths, key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    return load_checkpoint(os.path.dirname(best), None), best


def _loss_span(losses, fmt=".4f"):
    """First->last logged loss, tolerant of an empty log (a resumed run
    that had no new full batches logs nothing — crashed stage_kp once)."""
    if not losses:
        return "loss n/a (no new steps — already at target iteration)"
    return f"loss {losses[0][1]:{fmt}} -> {losses[-1][1]:{fmt}}"


def _tune(cfg, exp_name, steps, *, batch_size=None, log_every=200):
    """Point a preset config at the campaign corpus/exp dirs and size the
    epoch math so run_training does exactly `steps` iterations with a final
    checkpoint on the last one."""
    ts = cfg["shapenet_psr_dataset_config"]
    ts["data_dir"] = DATA
    ts["categories"] = list(SYNSETS)
    ts["repeat_dataset"] = 1
    if batch_size:
        ts["batch_size"] = batch_size
    tc = cfg["train_config"]
    tc["root_directory"] = os.path.join(EXPS, exp_name)
    # run_training advances n_iter only on FULL batches (ragged tails are
    # skipped) but sizes iters_per_ckpt from the ceil-based loader length —
    # use each quantity with its own semantics so the cadence lands exactly
    n_total = MODELS_PER_SPLIT * len(SYNSETS)
    n_full = n_total // ts["batch_size"]            # advancing iters / epoch
    loader_len = int(np.ceil(n_total / ts["batch_size"]))
    tc["n_epochs"] = int(np.ceil(steps / n_full))
    # 4 checkpoints across the run, always one on the final iteration
    tc["epochs_per_ckpt"] = max(1, steps // 4) / loader_len
    tc["iters_per_logging"] = log_every
    # bf16 activations (f32 params/stats/distances — nn/precision.py): the
    # AE/latent steps are HBM-bandwidth-bound (benchmarks/profile_ae.py)
    tc["activation_dtype"] = "bfloat16"
    # device-resident corpus (data/device_corpus.py): the host pipeline cost
    # ~320 ms/step through the tunnel (round-4 sprint ran 20x below the
    # device rate); with the split in HBM the per-chunk transfer is a (K, B)
    # int32 index array and assembly fuses into the training scan
    tc["device_data"] = True
    tc["steps_per_dispatch"] = 32
    tc["durable_ckpt_dir"] = os.path.join(DURABLE, exp_name)
    return cfg, steps


def stage_data():
    from slide_tpu.data.synthetic import write_synthetic_shapenet_psr
    t0 = time.time()
    write_synthetic_shapenet_psr(
        DATA, categories=SYNSETS, models_per_split=MODELS_PER_SPLIT,
        num_points=3000, seed=11, with_psr=False, shape_variety=True)
    print(f"corpus: {len(SYNSETS)} cats x {MODELS_PER_SPLIT}/split "
          f"({time.time()-t0:.0f}s)")
    t0 = time.time()
    write_synthetic_shapenet_psr(
        SAP_DATA, categories=SYNSETS[:1], models_per_split=SAP_MODELS,
        num_points=3000, psr_res=128, seed=13, with_psr=True,
        shape_variety=True, psr_from_points=True)
    print(f"sap corpus: {SAP_MODELS}/split with 128^3 DPSR grids "
          f"({time.time()-t0:.0f}s)")


def stage_kp(steps=20000):
    from slide_tpu.configs import keypoint_ddpm_config
    from slide_tpu.train.driver import train_position_ddpm
    cfg, steps = _tune(keypoint_ddpm_config(CATEGORIES[0]), "kp", steps)
    t0 = time.time()
    state, losses = train_position_ddpm(cfg, max_iters=steps)
    print(f"kp: {steps} steps in {time.time()-t0:.0f}s "
          f"({steps/(time.time()-t0):.1f} steps/s), {_loss_span(losses)}")


def stage_ae(steps=30000):
    from slide_tpu.configs import autoencoder_config
    from slide_tpu.train.driver import train_autoencoder
    cfg, steps = _tune(autoencoder_config(CATEGORIES[0]), "ae", steps)
    t0 = time.time()
    state, losses = train_autoencoder(cfg, max_iters=steps)
    print(f"ae: {steps} steps in {time.time()-t0:.0f}s, {_loss_span(losses)}")


def stage_lat(steps=30000):
    from slide_tpu.configs import latent_ddpm_config
    from slide_tpu.train.driver import train_latent_ddpm
    ckpt, path = _latest_ckpt(os.path.join(EXPS, "ae"))
    print("frozen AE from", path)
    cfg, steps = _tune(latent_ddpm_config(CATEGORIES[0]), "lat", steps)
    t0 = time.time()
    state, losses = train_latent_ddpm(cfg, ckpt["model_state_dict"],
                                      max_iters=steps)
    print(f"lat: {steps} steps in {time.time()-t0:.0f}s, {_loss_span(losses)}")


def stage_sap(steps=10000):
    from slide_tpu.configs import upsampler_config
    from slide_tpu.train.driver import train_upsampler
    cfg = upsampler_config(batch_size=8)
    ts = cfg["shapenet_psr_dataset_config"]
    ts["data_dir"] = SAP_DATA
    ts["categories"] = list(SYNSETS[:1])
    ts["repeat_dataset"] = 1
    tc = cfg["train_config"]
    tc["root_directory"] = os.path.join(EXPS, "sap")
    n_full = SAP_MODELS // ts["batch_size"]         # advancing iters / epoch
    loader_len = int(np.ceil(SAP_MODELS / ts["batch_size"]))
    tc["n_epochs"] = int(np.ceil(steps / n_full))
    tc["epochs_per_ckpt"] = max(1, steps // 2) / loader_len
    tc["iters_per_logging"] = 50
    tc["activation_dtype"] = "bfloat16"     # see _tune
    tc["device_data"] = True                # 60x128^3 grids = 503 MB in HBM
    tc["steps_per_dispatch"] = 16
    tc["durable_ckpt_dir"] = os.path.join(DURABLE, "sap")
    ae_params = None
    try:
        ckpt, path = _latest_ckpt(os.path.join(EXPS, "ae"))
        ae_params = ckpt["model_state_dict"]
        print("AE corruption path from", path)
    except FileNotFoundError:
        print("no AE checkpoint — training without the AE corruption path")
    t0 = time.time()
    state, losses = train_upsampler(cfg, ae_params=ae_params, max_iters=steps)
    print(f"sap: {steps} steps in {time.time()-t0:.0f}s, "
          f"{_loss_span(losses, '.6f')}")


def _test_clouds(n, npoints=2048):
    """Held-out test-split clouds (points, normals, labels), CATEGORY-
    BALANCED: n // n_categories per category (the loader's test order is
    per-category-contiguous, so a head slice would cover only the first
    categories)."""
    from slide_tpu.data.loader import get_dataloader
    ts = {"dataset": "shapenet_psr_dataset", "data_dir": DATA,
          "categories": list(SYNSETS), "npoints": npoints, "scale": 1,
          "batch_size": 40, "eval_batch_size": 40, "num_workers": 0,
          "num_keypoints": 16, "keypoints_source": "farthest_points_sampling"}
    loader = get_dataloader(ts, phase="test")
    pts, nrm, lbl = [], [], []
    for b in loader:
        pts.append(np.asarray(b["points"], np.float32))
        nrm.append(np.asarray(b["normals"], np.float32))
        lbl.append(np.asarray(b["label"], np.int64))
    pts, nrm, lbl = map(np.concatenate, (pts, nrm, lbl))
    quota = n // len(SYNSETS)
    keep = np.concatenate([np.flatnonzero(lbl == c)[:quota]
                           for c in np.unique(lbl)])
    if keep.size < n:      # top up from the head if a category ran short
        extra = np.setdiff1d(np.arange(len(lbl)), keep)[:n - keep.size]
        keep = np.concatenate([keep, extra])
    return pts[keep], nrm[keep], lbl[keep]


def stage_aediag(n_samples=200):
    """Fast AE-reconstruction diagnostic (CD family only, ~5 min): runs right
    after the AE stage so a still-flagging reconstruction is caught BEFORE
    hours are spent training the latent DDPM against a bad latent space
    (VERDICT r3 item 2: if the 30k retrain doesn't move recon 1-NN, the
    looser-spacing diagnosis is wrong and the decoder needs attention
    instead).  Healthy target: 1-NN-CD acc near 0.5, spacing ratio near 1."""
    from slide_tpu.configs import autoencoder_config
    from slide_tpu.train import build_autoencoder
    from slide_tpu.eval.metrics import compute_all_metrics
    from slide_tpu.ops import sample_keypoints, calc_cd

    ae_ck, ae_path = _latest_ckpt(os.path.join(EXPS, "ae"))
    print("aediag ckpt:", ae_path)
    ae_params = ae_ck["model_state_dict"]
    ae = build_autoencoder(autoencoder_config(CATEGORIES[0])["pointnet_config"])

    test_pts, test_nrm, test_lbl = _test_clouds(n_samples)
    ref_kp = np.asarray(sample_keypoints(jnp.asarray(test_pts), 16,
                                         add_centroid=True)[0])

    def enc_dec(x, kp, lbl, k1, k2):
        f = ae.apply({"params": ae_params}, x, kp, label=lbl,
                     method=ae.encode, rngs={"gaussian": k1})
        return ae.apply({"params": ae_params}, kp, f, label=lbl,
                        method=ae.decode, rngs={"fps": k2})

    enc_dec = jax.jit(enc_dec)
    cd_fn = jax.jit(lambda a, bb: calc_cd(a, bb)["cd_p"])
    b = min(40, n_samples)
    key = jax.random.key(31)
    recon, rec_cd = [], []
    for i in range(n_samples // b):
        sl = slice(i * b, (i + 1) * b)
        key, k1, k2 = jax.random.split(key, 3)
        x6 = jnp.concatenate([jnp.asarray(test_pts[sl]),
                              jnp.asarray(test_nrm[sl])], axis=-1)
        out = enc_dec(x6, jnp.asarray(ref_kp[sl]),
                      jnp.asarray(test_lbl[sl], jnp.int32), k1, k2)[..., :3]
        recon.append(np.asarray(out))
        rec_cd.append(np.asarray(cd_fn(out, jnp.asarray(test_pts[sl]))))
    recon = np.concatenate(recon)

    def nn_spacing(clouds):
        # mean 1-NN point spacing inside each cloud — the looseness probe
        d = jnp.sum((clouds[:, :, None] - clouds[:, None]) ** 2, -1)
        d = d + jnp.eye(clouds.shape[1]) * 1e9
        return float(jnp.sqrt(d.min(-1)).mean())

    m = compute_all_metrics(jnp.asarray(recon), jnp.asarray(test_pts),
                            batch_size=25, with_emd=False)
    out = {"mean_cd_p": float(np.concatenate(rec_cd).mean()),
           **{k: float(v) for k, v in m.items()},
           "recon_nn_spacing": nn_spacing(jnp.asarray(recon[:64])),
           "real_nn_spacing": nn_spacing(jnp.asarray(test_pts[:64])),
           "ckpt": ae_path}
    print("aediag:", json.dumps(out, indent=2))
    os.makedirs(ROOT, exist_ok=True)
    with open(os.path.join(ROOT, "aediag.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out


def stage_sapdiag(n_mesh=16):
    """Trained-SAP quality (VERDICT r4 missing #5): DPSR-grid L2 on the SAP
    test split — the reference's checkpoint-selection metric
    (`README_training.md:28`, `dpsr_evaluation.py:139-148`) — plus mesh-level
    chamfer: extract meshes through the trained upsampler and compare
    mesh-sampled points against the ground-truth clouds."""
    from slide_tpu.configs import upsampler_config
    from slide_tpu.train.driver import build_network
    from slide_tpu.train.ema import select_eval_params_from_ckpt
    from slide_tpu.sap import DPSR, network_output_to_dpsr_grid, \
        mirror_and_concat
    from slide_tpu.sap.marching_tpu import extract_and_sample_device
    from slide_tpu.eval.mesh_recon import sap_grid_eval
    from slide_tpu.data.loader import get_dataloader
    from slide_tpu.ops import calc_cd

    sap_ck, sap_path = _latest_ckpt(os.path.join(EXPS, "sap"))
    print("sapdiag ckpt:", sap_path)
    cfg = upsampler_config(batch_size=8)
    rates = tuple(cfg["train_config"].get("ema_rate") or ())
    params, sel = select_eval_params_from_ckpt(sap_ck, rates)
    print(f"sap eval params: {sel} (iter {sap_ck['iter']})")

    ts = dict(cfg["shapenet_psr_dataset_config"],
              data_dir=SAP_DATA, categories=list(SYNSETS[:1]),
              eval_batch_size=8, load_psr=True)
    dc = cfg["dpsr_config"]
    pc = cfg["pointnet_config"]
    dpsr = DPSR((dc["grid_res"],) * 3, sig=dc["psr_sigma"])
    net = build_network(pc)
    loader = get_dataloader(ts, phase="test")

    out = {"ckpt": sap_path, "eval_params": sel, "iter": int(sap_ck["iter"])}
    t0 = time.time()
    out["dpsr_grid_L2_loss"] = float(sap_grid_eval(
        net, params, dpsr, loader, pc, dc, ts,
        os.path.join(ROOT, "sapdiag"), sap_ck["iter"], 0,
        scale=ts["scale"]))
    print(f"dpsr_grid_L2_loss {out['dpsr_grid_L2_loss']:.6f} "
          f"({time.time()-t0:.0f}s)")

    # mesh-level: trained refine+upsample -> DPSR -> device extraction ->
    # chamfer(mesh samples, gt cloud)
    mirror_first = dc.get("mirror_before_upsampling", False)
    only_orig = dc.get("only_original_points_split", False)

    @jax.jit
    def to_grid(x, label):
        disp = net.apply({"params": params}, x, ts=None, label=label)
        grid, _, _ = network_output_to_dpsr_grid(
            x, disp, dpsr, ts["scale"], pc,
            last_dim_as_indicator=mirror_first,
            only_original_points_split=only_orig)
        return grid

    from slide_tpu.eval.mesh_recon import _prepare_sap_input
    cds = []
    key = jax.random.key(41)
    done = 0
    for data in loader:
        if done >= n_mesh:
            break
        key, k_b, k_s = jax.random.split(key, 3)
        x, label = _prepare_sap_input(data, ts, dc, k_b)
        grid = to_grid(x, label)
        pts, _nrm, _nf, _nc, ovf = extract_and_sample_device(grid, k_s, 2048)
        # extraction runs in DPSR grid space [0,1); invert refine.py:61-62's
        # world -> grid map (world/(2*scale)/1.2 + 0.5) before the chamfer
        pts = (np.asarray(pts) - 0.5) * 1.2 * 2.0 * ts["scale"]
        gt = jnp.asarray(np.asarray(data["points"], np.float32))
        cd = calc_cd(jnp.asarray(pts), gt)["cd_p"]
        cds.append(np.asarray(cd))
        done += pts.shape[0]
    out["mesh_cd_p_mean"] = float(np.concatenate(cds).mean())
    out["mesh_n"] = int(done)
    print("sapdiag:", json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "sapdiag.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out


def stage_eval(n_samples=400, t_steps=1000, metric_points=2048,
               with_emd=None, fastdpm_lengths=(50, 100), batch=40):
    """Generate n_samples through the trained pipeline and run the metric
    suite at BOTH levels: keypoints (16 pts) and full clouds (2048 pts).

    Cloud-level EMD (1-NNA-EMD / MMD-EMD at 2048 pts, the reference's full
    protocol `evaluation_metrics.py:129-157`) runs by default on
    accelerators (with_emd=None -> auto); measured cost is ~min/suite, not
    the "days" asserted in round 2 (benchmarks/probe_emd.py).

    fastdpm_lengths: for each S, re-run BOTH DDPM chains with the S-step
    FastDPM samplers (STEP x quadratic, kappa 0.5) and report the same
    cloud-level metrics — the quality-drift check for the accelerated
    production path (VERDICT r2 item 2)."""
    from slide_tpu.configs import (keypoint_ddpm_config, latent_ddpm_config,
                                   autoencoder_config)
    from slide_tpu.models import ConditionalPointNet2
    from slide_tpu.train import build_autoencoder
    from slide_tpu.diffusion import (calc_diffusion_hyperparams,
                                     diffusion_sampling)
    from slide_tpu.diffusion.x0 import X0Schedule
    from slide_tpu.diffusion.latent import latent_denoise_and_reconstruct
    from slide_tpu.eval.metrics import (compute_all_metrics,
                                        jsd_between_point_cloud_sets)
    from slide_tpu.ops import sample_keypoints

    report = {}
    b = min(batch, n_samples)   # tile 40 is the proven fused-kernel VMEM size
    kp_ck, kp_path = _latest_ckpt(os.path.join(EXPS, "kp"))
    print("kp ckpt:", kp_path)
    # EMA-or-raw selection by shadow maturity: an immature shadow (rate 0.999
    # at ~1k steps is still ~30% random init) produced round-4's exploded
    # generations (gen_kp_std 6.75). select_eval_params falls back to raw
    # params until 1 - rate**n >= 0.95 (VERDICT r4 item 2).
    from slide_tpu.train.ema import select_eval_params_from_ckpt
    kp_rates = tuple(keypoint_ddpm_config(CATEGORIES[0])["train_config"]
                     .get("ema_rate") or ())
    kp_params, kp_sel = select_eval_params_from_ckpt(kp_ck, kp_rates)
    print(f"kp eval params: {kp_sel} (iter {kp_ck['iter']})")
    report["kp_eval_params"] = kp_sel

    kp_cfg = keypoint_ddpm_config(CATEGORIES[0])
    kp_cfg["diffusion_config"]["T"] = t_steps
    kp_net = ConditionalPointNet2(kp_cfg["pointnet_config"])
    kp_sched = calc_diffusion_hyperparams(t_steps, 1e-4, 0.02)

    from slide_tpu.models.fused_denoiser import make_fused_net_fn
    fused = None
    if jax.default_backend() not in ("cpu",):
        fused = make_fused_net_fn(kp_cfg["pointnet_config"], kp_params, 16)

    def kp_net_fn(x, ts, lbl):
        if fused is not None and fused.batch_ok(x.shape[0]):
            return fused(x, ts, lbl)
        return kp_net.apply({"params": kp_params}, x, ts=ts, label=lbl)

    def make_sample_kp(length=None):
        """T-step DDPM chain, or the S-step FastDPM chain when `length`."""
        if length:
            from slide_tpu.diffusion import diffusion_config_of, fast_sampling
            dc = diffusion_config_of(kp_sched)
            return jax.jit(lambda k, lbl: fast_sampling(
                lambda x, ts: kp_net_fn(x, ts, lbl), k, (b, 16, 3), kp_sched,
                dc, length=length, sampling_method="step",
                schedule="quadratic", kappa=0.5))
        return jax.jit(lambda k, lbl: diffusion_sampling(
            lambda x, ts: kp_net_fn(x, ts, lbl), k, (b, 16, 3), kp_sched))

    def gen_keypoints(sample_kp, key, labels):
        out = []
        t0 = time.time()
        for i in range(n_samples // b):
            key, ks = jax.random.split(key)
            lbl_i = jnp.asarray(labels[i * b:(i + 1) * b], jnp.int32)
            out.append(np.asarray(jax.block_until_ready(sample_kp(ks, lbl_i))))
        out = np.concatenate(out)
        print(f"generated {out.shape[0]} keypoint sets in {time.time()-t0:.0f}s")
        return out, key

    # reference clouds/keypoints from held-out test clouds, category-balanced;
    # generation is conditioned on the SAME label multiset so the two sets
    # draw from matched category mixes (the reference generates per-category)
    test_pts, test_nrm, test_lbl = _test_clouds(n_samples)
    gen_lbl = test_lbl.copy()
    ref_kp = np.asarray(sample_keypoints(jnp.asarray(test_pts), 16,
                                         add_centroid=True)[0])

    key = jax.random.key(97)
    gen_kp, key = gen_keypoints(make_sample_kp(), key, gen_lbl)

    t0 = time.time()
    m_kp = compute_all_metrics(jnp.asarray(gen_kp), jnp.asarray(ref_kp),
                               batch_size=100)
    m_kp = {k: float(v) for k, v in m_kp.items()}
    m_kp["jsd"] = float(jsd_between_point_cloud_sets(gen_kp, ref_kp))
    print(f"keypoint metrics in {time.time()-t0:.0f}s:", m_kp)
    report["keypoint_level"] = m_kp
    report["gen_kp_std"] = float(gen_kp.std())
    report["ref_kp_std"] = float(ref_kp.std())

    # ---- full pipeline to 2048-pt clouds
    try:
        lat_ck, lat_path = _latest_ckpt(os.path.join(EXPS, "lat"))
        ae_ck, ae_path = _latest_ckpt(os.path.join(EXPS, "ae"))
    except FileNotFoundError as e:
        print("skipping cloud-level eval:", e)
        _write(report)
        return report
    print("lat ckpt:", lat_path, "| ae ckpt:", ae_path)
    lat_rates = tuple(latent_ddpm_config(CATEGORIES[0])["train_config"]
                      .get("ema_rate") or ())
    lat_params, lat_sel = select_eval_params_from_ckpt(lat_ck, lat_rates)
    print(f"lat eval params: {lat_sel} (iter {lat_ck['iter']})")
    report["lat_eval_params"] = lat_sel
    ae_params = ae_ck["model_state_dict"]

    lat_cfg = latent_ddpm_config(CATEGORIES[0])
    lat_cfg["standard_diffusion_config"]["num_diffusion_timesteps"] = t_steps
    lat_net = ConditionalPointNet2(lat_cfg["pointnet_config"])
    lat_sched = X0Schedule.from_config(lat_cfg["standard_diffusion_config"])
    ae_cfg = autoencoder_config(CATEGORIES[0])
    ae = build_autoencoder(ae_cfg["pointnet_config"])

    feat_dim = lat_cfg["pointnet_config"]["in_fea_dim"]

    def decode_fn(kp, feat, lbl, kk):
        return ae.apply({"params": ae_params}, kp, feat, label=lbl,
                        method=ae.decode, rngs={"fps": kk})

    def make_sample_cloud(length=None):
        kw = {} if length is None else {
            "sampler": "fastdpm",
            "fastdpm_kw": {"length": length, "schedule": "quadratic",
                           "kappa": 0.5}}

        def chain(k, kp, lbl):
            def lat_net_fn(x, ts):
                return lat_net.apply({"params": lat_params}, x, ts=ts,
                                     label=lbl)

            return latent_denoise_and_reconstruct(
                lat_net_fn, decode_fn, k, lbl.shape[0], 3, (16, 3 + feat_dim),
                lat_sched, label=lbl, keypoint=kp, **kw)

        return jax.jit(chain)

    def gen_clouds_from(sample_cloud, kp_all, key, labels):
        out = []
        t0 = time.time()
        for i in range(n_samples // b):
            key, ks = jax.random.split(key)
            kp_i = jnp.asarray(kp_all[i * b:(i + 1) * b])
            lbl_i = jnp.asarray(labels[i * b:(i + 1) * b], jnp.int32)
            pts, _kp, _f = sample_cloud(ks, kp_i, lbl_i)
            out.append(np.asarray(jax.block_until_ready(pts))[..., :3])
        out = np.concatenate(out)
        print(f"decoded {out.shape[0]} clouds in {time.time()-t0:.0f}s")
        return out, key

    sub = min(metric_points, 2048)
    if with_emd is None:     # auto: the measured suite cost is minutes on
        with_emd = jax.default_backend() not in ("cpu",)   # the chip, days on CPU

    def cloud_metrics(clouds, emd=False, refs=None, per_category=False):
        # the EMD family (~10-15 min/suite on-chip) runs for the PRIMARY
        # cloud_level suite (VERDICT r2 item 5); the ae_recon diagnostic and
        # the FastDPM drift rows only need the CD family + JSD
        use_emd = with_emd and emd
        refs = test_pts if refs is None else refs
        t0 = time.time()
        m = compute_all_metrics(jnp.asarray(clouds[:, :sub]),
                                jnp.asarray(refs[:, :sub]),
                                batch_size=25, with_emd=use_emd)
        m = {k: float(v) for k, v in m.items()}
        m["jsd"] = float(jsd_between_point_cloud_sets(
            clouds[:, :sub], refs[:, :sub]))
        print(f"cloud metrics (with_emd={use_emd}) "
              f"in {time.time()-t0:.0f}s:", m)
        m["suite_wall_s"] = round(time.time() - t0, 1)
        if per_category:
            # per-category CD-family blocks (VERDICT r3 item 7): gen and ref
            # subsets carry the same labels by construction, so each block is
            # a matched same-size comparison within one category
            cats = {}
            for c in np.unique(test_lbl):
                gmask, rmask = gen_lbl == c, test_lbl == c
                mc = compute_all_metrics(jnp.asarray(clouds[gmask][:, :sub]),
                                         jnp.asarray(refs[rmask][:, :sub]),
                                         batch_size=25, with_emd=False)
                mc = {k: float(v) for k, v in mc.items()}
                mc["jsd"] = float(jsd_between_point_cloud_sets(
                    clouds[gmask][:, :sub], refs[rmask][:, :sub]))
                name = CATEGORIES[SYNSETS.index(_label_synset(int(c)))] \
                    if _label_synset(int(c)) in SYNSETS else str(int(c))
                cats[name] = mc
                print(f"  [{name}] ", {k: round(v, 4)
                                       for k, v in mc.items()})
            m["per_category"] = cats
        return m

    # ---- AE reconstruction diagnostic: encode+decode the TEST clouds and
    # score them with the same suite.  Separates "the AE can't reconstruct"
    # (recon 1-NN also flags) from "the latent samples are off-manifold"
    # (recon healthy, generation flags) — the ambiguity VERDICT r2 weak #4
    # said only more evidence could resolve.
    enc_dec = jax.jit(lambda x, kp, lbl, k1, k2: decode_fn(
        kp, ae.apply({"params": ae_params}, x, kp, label=lbl,
                     method=ae.encode, rngs={"gaussian": k1}), lbl, k2))
    from slide_tpu.ops import calc_cd
    recon, rec_cd = [], []
    cd_fn = jax.jit(lambda a, bb: calc_cd(a, bb)["cd_p"])
    for i in range(n_samples // b):
        sl = slice(i * b, (i + 1) * b)
        key, k1, k2 = jax.random.split(key, 3)
        x6 = jnp.concatenate([jnp.asarray(test_pts[sl]),
                              jnp.asarray(test_nrm[sl])], axis=-1)
        out = enc_dec(x6, jnp.asarray(ref_kp[sl]),
                      jnp.asarray(test_lbl[sl], jnp.int32), k1, k2)[..., :3]
        recon.append(np.asarray(out))
        rec_cd.append(np.asarray(cd_fn(out, jnp.asarray(test_pts[sl]))))
    recon = np.concatenate(recon)
    report["ae_recon"] = {"mean_cd_p": float(np.concatenate(rec_cd).mean()),
                          **cloud_metrics(recon)}
    _write(report)

    gen_clouds, key = gen_clouds_from(make_sample_cloud(), gen_kp, key,
                                      gen_lbl)
    report["cloud_level"] = cloud_metrics(gen_clouds, emd=True,
                                          per_category=True)
    _write(report)

    # ---- uniformity-matched protocol (benchmarks/probe_nna_asymmetry.py):
    # the decoder FPS-trims its output to 2048 evenly-spread points
    # (reference point_upsample_decoder.py:149-182) while the refs above are
    # random 2048-subsamples.  Scoring the SAME generations against
    # FPS-subsampled refs removes the subsample-style mismatch so both sides
    # are uniform 2048-pt covers.  The probe found this recovers only part
    # of the t/f split (acc_t 0.17->0.28 at n=120; acc_f stays ~0.99): the
    # residual is a genuine within-set contraction of decoded clouds
    # (NN-scale 0.0020-0.0022 vs 0.0034 for FPS refs) — an AE-bottleneck
    # diversity artifact present identically in pure reconstructions — so
    # this block is reported alongside, not instead of, cloud_level.
    test_full = _test_clouds(n_samples, npoints=3000)[0]
    key, kf = jax.random.split(key)
    ref_fps = np.asarray(sample_keypoints(jnp.asarray(test_full), sub,
                                          add_centroid=False, key=kf)[0])
    report["cloud_level_fpsref"] = cloud_metrics(gen_clouds, refs=ref_fps)
    _write(report)

    # ---- FastDPM quality drift: same nets/weights, S-step chains
    for s in (fastdpm_lengths or ()):
        print(f"--- fastdpm S={s}")
        kp_s, key = gen_keypoints(make_sample_kp(s), key, gen_lbl)
        clouds_s, key = gen_clouds_from(make_sample_cloud(s), kp_s, key,
                                        gen_lbl)
        report[f"fastdpm_s{s}"] = cloud_metrics(clouds_s)
        _write(report)
    return report


def _write(report):
    os.makedirs(ROOT, exist_ok=True)
    with open(os.path.join(ROOT, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("report ->", os.path.join(ROOT, "report.json"))


STAGES = {"data": stage_data, "kp": stage_kp, "ae": stage_ae,
          "aediag": stage_aediag, "lat": stage_lat, "sap": stage_sap,
          "sapdiag": stage_sapdiag, "eval": stage_eval}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="+", choices=list(STAGES) + ["all"])
    ap.add_argument("--steps", type=int, default=None,
                    help="override step budget for single training stages")
    args = ap.parse_args()
    names = list(STAGES) if args.stages == ["all"] else args.stages
    for name in names:
        fn = STAGES[name]
        if args.steps and name in ("kp", "ae", "lat", "sap"):
            fn(args.steps)
        else:
            fn()


if __name__ == "__main__":
    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()
    main()
