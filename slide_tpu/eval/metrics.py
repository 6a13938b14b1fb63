"""Generative-model metric suite — reference
`models/pvd/metrics/evaluation_metrics.py:29-278`: paired CD/EMD/F-score,
pairwise distance matrices, MMD/COV, 1-NNA two-sample classifier, and the
JSD occupancy-grid metric.

TPU-first: the pairwise matrices are computed by jitted batched sweeps (one
sample row against a block of references at a time), which is where nearly all
the FLOPs live.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import entropy

from slide_tpu.ops.chamfer import chamfer_parts, fscore
from slide_tpu.ops.emd import earth_mover_distance


def _cd_t(a, b):
    parts = chamfer_parts(a, b)
    return parts["dist_x"].mean(1) + parts["dist_y"].mean(1)


def emd_cd(sample_pcs, ref_pcs, f1_threshold: float = 0.001):
    """Paired metrics between aligned sample/reference sets
    (`evaluation_metrics.py:29-43`): {'CD', 'EMD', 'fscore'} each (B,)."""
    sample_pcs = jnp.asarray(sample_pcs)
    ref_pcs = jnp.asarray(ref_pcs)
    if sample_pcs.shape[0] != ref_pcs.shape[0]:
        raise ValueError("paired metrics need equal set sizes")
    parts = chamfer_parts(sample_pcs, ref_pcs)
    cd = parts["dist_x"].mean(1) + parts["dist_y"].mean(1)
    fs, _, _ = fscore(parts["dist_x"], parts["dist_y"], threshold=f1_threshold)
    emd = earth_mover_distance(sample_pcs, ref_pcs)
    return {"CD": cd, "EMD": emd, "fscore": fs}


@partial(jax.jit, static_argnames=("with_emd",))
def _pair_block(sample_block, ref_block, with_emd=True):
    """(S, N, 3) x (R, N, 3) -> (cd (S, R), emd (S, R)) — one dispatch per
    SxR tile (per-row dispatches are latency-bound on remote devices)."""
    def row(sample_one):
        s = jnp.broadcast_to(sample_one[None], ref_block.shape)
        cd = _cd_t(s, ref_block)
        emd = earth_mover_distance(s, ref_block) if with_emd \
            else jnp.zeros_like(cd)
        return cd, emd

    return jax.vmap(row)(sample_block)


def pairwise_emd_cd(sample_pcs, ref_pcs, batch_size: int = 32,
                    verbose: bool = False, with_emd: bool = True):
    """All-pairs CD and EMD matrices (N_sample, N_ref)
    (`_pairwise_EMD_CD_`, `evaluation_metrics.py:45-78`).  with_emd=False
    skips the auction EMD and returns a NaN-FILLED EMD matrix (a caller that
    forgets the flag fails loudly instead of reading 0.0 as a perfect
    score)."""
    sample_pcs = jnp.asarray(sample_pcs)
    ref_pcs = jnp.asarray(ref_pcs)
    n_s, n_r = sample_pcs.shape[0], ref_pcs.shape[0]
    all_cd = np.zeros((n_s, n_r), np.float32)
    all_emd = np.full((n_s, n_r), np.nan, np.float32) if not with_emd \
        else np.zeros((n_s, n_r), np.float32)
    # tile the SAMPLE axis too (fewer, larger dispatches), bounded so the
    # (S_blk, R_blk, N, N) distance intermediates stay comfortably in HBM
    s_blk = max(1, min(n_s, batch_size,
                       (1 << 28) // max(1, batch_size * sample_pcs.shape[1]
                                        * ref_pcs.shape[1])))
    for i in range(0, n_s, s_blk):
        srows = sample_pcs[i:i + s_blk]
        for r0 in range(0, n_r, batch_size):
            block = ref_pcs[r0:r0 + batch_size]
            cd, emd = _pair_block(srows, block, with_emd)
            all_cd[i:i + srows.shape[0], r0:r0 + block.shape[0]] = np.asarray(cd)
            if with_emd:
                all_emd[i:i + srows.shape[0],
                        r0:r0 + block.shape[0]] = np.asarray(emd)
        if verbose:
            print(f"pairwise metrics: {min(i + s_blk, n_s)}/{n_s}", flush=True)
    return all_cd, all_emd


def knn_classifier(m_xx, m_xy, m_yy, k: int = 1, sqrt: bool = False):
    """Leave-one-out kNN two-sample test (1-NNA)
    (`evaluation_metrics.py:82-111`).  Returns dict incl. 'acc', 'acc_t',
    'acc_f'."""
    m_xx, m_xy, m_yy = map(np.asarray, (m_xx, m_xy, m_yy))
    n0, n1 = m_xx.shape[0], m_yy.shape[0]
    label = np.concatenate([np.ones(n0), np.zeros(n1)])
    mat = np.block([[m_xx, m_xy], [m_xy.T, m_yy]]).astype(np.float64)
    if sqrt:
        mat = np.sqrt(np.abs(mat))
    np.fill_diagonal(mat, np.inf)
    idx = np.argsort(mat, axis=0)[:k]                 # k smallest per column
    count = label[idx].sum(axis=0)
    pred = (count >= (k / 2.0)).astype(np.float64)
    tp = (pred * label).sum()
    fp = (pred * (1 - label)).sum()
    fn = ((1 - pred) * label).sum()
    tn = ((1 - pred) * (1 - label)).sum()
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": tp / (tp + fp + 1e-10),
        "recall": tp / (tp + fn + 1e-10),
        "acc_t": tp / (tp + fn + 1e-10),
        "acc_f": tn / (tn + fp + 1e-10),
        "acc": float((pred == label).mean()),
    }


def lgan_mmd_cov(all_dist):
    """MMD / COV from a (N_sample, N_ref) distance matrix
    (`evaluation_metrics.py:114-126`)."""
    all_dist = np.asarray(all_dist)
    n_ref = all_dist.shape[1]
    min_from_sample = all_dist.min(axis=1)
    min_idx = all_dist.argmin(axis=1)
    min_per_ref = all_dist.min(axis=0)
    return {
        "lgan_mmd": float(min_per_ref.mean()),
        "lgan_cov": float(len(np.unique(min_idx)) / n_ref),
        "lgan_mmd_smp": float(min_from_sample.mean()),
    }


def compute_all_metrics(sample_pcs, ref_pcs, batch_size: int = 32,
                        verbose: bool = False, with_emd: bool = True):
    """The full suite (`evaluation_metrics.py:129-157`): MMD/COV (CD & EMD)
    and 1-NNA (CD & EMD).  with_emd=False restricts to the CD family."""
    results = {}
    m_rs_cd, m_rs_emd = pairwise_emd_cd(ref_pcs, sample_pcs, batch_size,
                                        verbose=verbose, with_emd=with_emd)
    names = (("CD", m_rs_cd), ("EMD", m_rs_emd)) if with_emd \
        else (("CD", m_rs_cd),)
    for name, mat in names:
        for k, v in lgan_mmd_cov(mat.T).items():
            results[f"{k}-{name}"] = v
    m_rr_cd, m_rr_emd = pairwise_emd_cd(ref_pcs, ref_pcs, batch_size,
                                        verbose=verbose, with_emd=with_emd)
    m_ss_cd, m_ss_emd = pairwise_emd_cd(sample_pcs, sample_pcs, batch_size,
                                        verbose=verbose, with_emd=with_emd)
    fams = (("CD", (m_rr_cd, m_rs_cd, m_ss_cd)),
            ("EMD", (m_rr_emd, m_rs_emd, m_ss_emd))) if with_emd \
        else (("CD", (m_rr_cd, m_rs_cd, m_ss_cd)),)
    for name, (rr, rs, ss) in fams:
        one_nn = knn_classifier(rr, rs, ss, k=1, sqrt=False)
        results.update({f"1-NN-{name}-{k}": v for k, v in one_nn.items()
                        if "acc" in k})
    return results


# ---------------------------------------------------------------------------
# JSD (occupancy grids, `evaluation_metrics.py:163-278`)


def unit_cube_grid_point_cloud(resolution: int, clip_sphere: bool = False):
    spacing = 1.0 / (resolution - 1)
    lin = np.arange(resolution, dtype=np.float32) * spacing - 0.5
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    if clip_sphere:
        grid = grid.reshape(-1, 3)
        grid = grid[np.linalg.norm(grid, axis=1) <= 0.5]
    return grid, spacing


def entropy_of_occupancy_grid(pclouds, grid_resolution: int,
                              in_sphere: bool = False):
    """Occupancy-grid entropy + per-cell counters
    (`evaluation_metrics.py:198-237`).  Nearest grid cell is computed by
    rounding (exact on a regular grid; the reference's sklearn
    NearestNeighbors import is actually commented out at
    `evaluation_metrics.py:5`).  With `in_sphere`, corner cells outside the
    unit sphere are dropped and out-of-sphere points snap to the nearest
    in-sphere cell, like the reference's clipped grid."""
    pclouds = np.asarray(pclouds)
    res = grid_resolution
    spacing = 1.0 / (res - 1)
    centers_grid, _ = unit_cube_grid_point_cloud(res, clip_sphere=False)
    centers = centers_grid.reshape(-1, 3)
    if in_sphere:
        keep = np.linalg.norm(centers, axis=1) <= 0.5
        lut = -np.ones(len(centers), np.int64)
        lut[keep] = np.arange(int(keep.sum()))
        centers_in = centers[keep]
        n_cells = len(centers_in)
    else:
        lut = np.arange(len(centers))
        centers_in = centers
        n_cells = len(centers)
    grid_counters = np.zeros(n_cells)
    grid_bernoulli = np.zeros(n_cells)
    for pc in pclouds:
        idx3 = np.clip(np.round((pc + 0.5) / spacing).astype(np.int64), 0, res - 1)
        lin = idx3[:, 0] * res * res + idx3[:, 1] * res + idx3[:, 2]
        cell = lut[lin]
        miss = cell < 0
        if miss.any():
            # exact NN against the in-sphere cells for the (few) outliers
            d = np.sum((pc[miss, None, :] - centers_in[None]) ** 2, axis=-1)
            cell[miss] = d.argmin(axis=1)
        np.add.at(grid_counters, cell, 1)
        grid_bernoulli[np.unique(cell)] += 1
    n = float(len(pclouds))
    occupied = grid_bernoulli[grid_bernoulli > 0] / n
    acc_entropy = sum(entropy([p, 1.0 - p]) for p in occupied)
    return acc_entropy / n_cells, grid_counters


def jensen_shannon_divergence(p, q):
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    if (p < 0).any() or (q < 0).any():
        raise ValueError("negative values")
    if len(p) != len(q):
        raise ValueError("non-equal size")
    p = p / p.sum()
    q = q / q.sum()
    e1, e2 = entropy(p, base=2), entropy(q, base=2)
    return entropy((p + q) / 2.0, base=2) - (e1 + e2) / 2.0


def jsd_between_point_cloud_sets(sample_pcs, ref_pcs, resolution: int = 28):
    """(`evaluation_metrics.py:184-195`)."""
    s = entropy_of_occupancy_grid(sample_pcs, resolution, True)[1]
    r = entropy_of_occupancy_grid(ref_pcs, resolution, True)[1]
    return jsd_between_counters(s, r)


def jsd_between_counters(s, r):
    return jensen_shannon_divergence(s, r)
