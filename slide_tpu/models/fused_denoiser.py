"""Fused keypoint-scale denoiser: the whole ConditionalPointNet2 forward as a
single Pallas TPU kernel.

Motivation (measured on one v5e): at keypoint scale (B=200, N=16) the flax/XLA
forward moves ~2.2 GB of f32 intermediates through HBM per step (~80 passes
over (B,16,16,C) tensors, GroupNorm reductions break XLA fusion) and runs at
~2.2 ms.  All activations for a batch tile fit in VMEM, so one kernel that
keeps the entire network resident eliminates nearly all of that traffic.

Scope: the architecture shared by the shipped position-DDPM and latent-DDPM
configs (reference `pointnet2/configs/...keypoint...json` and
`latent_ddpm_training_configs/...json`; the network is
`pointnet2_with_pcld_condition.py:27-489` with no condition branch):

  - 'nn' neighborhoods, npoint[i] >= N (no FPS inside the forward),
  - KnnFP decoder (`use_knn_FP`), attention pooling everywhere,
  - bn_first=False, res_connect, bias, relu, GroupNorm,
  - t + class-condition injection, transform_output head.

`supports_config` reports whether a pointnet_config matches; callers fall back
to the flax module otherwise.  The same math also runs as plain jnp (the
`use_pallas=False` path) — that is the CPU/test oracle and is numerically
identical to the kernel.

Design notes (TPU):
  - Neighbor selection (kNN of 16, K<=16) is done with K steps of masked
    argmin producing ONE-HOT selection tensors; every gather becomes a small
    batched matmul (MXU) — no dynamic indexing inside the kernel.
  - GroupNorm statistics are computed with channel-group masks as matmuls
    ((Bt,C) @ (C,G)), avoiding minor-dim reshapes that Mosaic can't lower.
  - All 1-D parameters are reshaped to (1, C) so every ref is rank >= 2.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slide_tpu.nn.layers import calc_t_emb, swish


# ---------------------------------------------------------------------------
# Config support check / spec


def supports_config(config: Mapping[str, Any]) -> bool:
    """True when `config` (a pointnet_config) matches the fused kernel's
    architecture scope (see module docstring)."""
    try:
        arch = config["architecture"]
        ok = (
            config["include_t"]
            and config.get("include_class_condition", False)
            and not config.get("include_local_feature", True)
            and not config.get("include_global_feature", False)
            and not config.get("concate_partial_with_noisy_input", False)
            and config.get("transform_output", True)
            and config["attach_position_to_input_feature"]
            and not config.get("use_position_encoding", False)
            and not config["bn_first"]
            and config["bias"]
            and config["res_connect"]
            and config.get("bn", True)
            and config.get("activation", "relu") == "relu"
            and config["model.use_xyz"]
            and not config.get("record_neighbor_stats", False)
            and arch["neighbor_definition"] == "nn"
            and arch.get("use_knn_FP", False)
            and not arch.get("include_grouper", False)
            and config.get("point_upsample_factor", 1) == 1
        )
        att = config.get("attention_setting") or {}
        ok = ok and att.get("use_attention_module", False) \
            and att.get("attention_bn", False) \
            and att.get("transform_grouped_feat_out", False) \
            and att.get("last_activation", False)
        gatt = config.get("global_attention_setting")
        ok = ok and not (gatt or {}).get("use_global_attention_module", False)
        return bool(ok)
    except (KeyError, TypeError):
        return False


def build_spec(config: Mapping[str, Any], n_points: int) -> dict:
    """Static dims for the fused forward (mirrors `_build_sa_stack` /
    `_build_fp_stack` channel arithmetic in models/denoiser.py)."""
    if not supports_config(config):
        raise ValueError("config not supported by the fused denoiser")
    arch = config["architecture"]
    in_fea = config["in_fea_dim"] + 3          # attach_position
    inc_abs = bool(config["include_abs_coordinate"])
    inc_cen = bool(config.get("include_center_coordinate", False))
    extra = 3 * (1 + int(inc_abs) + int(inc_cen))
    fdim = list(arch["feature_dim"])
    ddim = list(arch["decoder_feature_dim"])
    mlp_depth = arch["mlp_depth"]
    dec_depth = arch["decoder_mlp_depth"]

    sa = []
    for i in range(len(arch["npoint"])):
        if arch["npoint"][i] < n_points:
            raise ValueError("fused denoiser requires npoint >= N (no FPS)")
        spec = [fdim[i]] * mlp_depth + [fdim[i + 1]]
        if i == 0:
            spec[0] = in_fea
        c_in1 = spec[0]
        spec = [spec[0] + extra] + spec[1:]
        sa.append(dict(spec=spec, c_in1=max(c_in1, 32), c_in2=max(spec[0], 32),
                       k=min(arch["nsample"][i], n_points)))

    fp = []
    for i in range(len(ddim) - 1):
        skip = in_fea if i == 0 else fdim[i]
        spec1 = [ddim[i + 1] + 11] + [ddim[i]] * dec_depth
        spec2_head = ddim[i] + skip
        c_in1 = spec2_head - spec1[-1]
        spec2 = [spec2_head + 3] + [ddim[i]] * dec_depth
        if arch["K"] > n_points:
            # the flax path's knn_points raises for k > n; match by rejecting
            raise ValueError("fused denoiser requires FP K <= N")
        fp.append(dict(spec1=spec1, spec2=spec2, k=arch["K"],
                       c_in1=max(c_in1, 32), c_in2=max(spec1[0], 32)))

    head_in = ddim[0] + 3
    return dict(n=n_points, in_fea=in_fea, extra=(inc_abs, inc_cen),
                sa=sa, fp=fp, head_in=head_in,
                out_dim=config["out_dim"], t4=4 * config["t_dim"],
                cls=config["class_condition_dim"], fdim=fdim, ddim=ddim)


# ---------------------------------------------------------------------------
# Weight extraction (flax param tree -> plain dict of >=2-D arrays)


def _two_d(tree):
    return jax.tree.map(lambda a: a.reshape(1, -1) if a.ndim == 1 else a, tree)


def extract_weights(params: Mapping) -> tuple[dict, dict]:
    """Split the ConditionalPointNet2 params into (outer, inner) plain dicts.

    outer = {t_embedder, class_emb} — applied in XLA before the kernel.
    inner = everything else, all leaves reshaped to rank >= 2.
    """
    p = jax.tree.map(lambda a: a, params)   # shallow copy as plain dicts
    p = jax.tree.map(jnp.asarray, p)
    outer = {"t_embedder": p["t_embedder"], "class_emb": p["class_emb"]}
    inner = {k: v for k, v in p.items() if k not in outer}
    return _two_d(outer), _two_d(inner)


# ---------------------------------------------------------------------------
# Math building blocks (pure jnp; Pallas-lowerable)

_EPS = 1e-5
# Weight-dot precision.  Data-movement dots (one-hot gathers, GroupNorm
# statistics) always pin HIGHEST (f32): they reproduce exact values, not
# approximate projections — without this the kernel drifts to ~0.5 abs error.
# Weight dots default to DEFAULT (bf16 MXU): measured max-abs deviation from
# CPU-f32 truth is 0.038, the same accuracy class as the flax path on TPU
# (0.037, XLA's bf16x3 dots).  SLIDE_TPU_FUSED_PRECISION=highest switches the
# weight dots to f32 (bit-exact vs CPU flax, ~1.8x slower); Mosaic supports
# only DEFAULT and HIGHEST.
_PREC = (jax.lax.Precision.HIGHEST
         if os.environ.get("SLIDE_TPU_FUSED_PRECISION", "").lower() == "highest"
         else jax.lax.Precision.DEFAULT)
_PREC_EXACT = jax.lax.Precision.HIGHEST


def _dense(x, wd):
    y = jnp.dot(x, wd["kernel"], precision=_PREC,
                preferred_element_type=jnp.float32)
    if "bias" in wd:
        y = y + wd["bias"]
    return y


def _group_masks(channels: int, groups: int):
    """(C, G) one-hot channel->group mask and the normalized-channel count.
    TailGroupNorm semantics: only the first C - C%G channels are normalized."""
    c_norm = channels - channels % groups
    gsize = c_norm // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (channels, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (channels, groups), 1)
    mask = (ch >= gi * gsize) & (ch < (gi + 1) * gsize) & (ch < c_norm)
    return mask.astype(jnp.float32), c_norm, gsize


def _tail_group_norm(x, scale, bias, groups: int):
    """GroupNorm over (spatial, group-channels) per sample with tail
    passthrough — x: (B, S, C); scale/bias: (1, c_norm).

    Matches flax GroupNorm numerics (var = E[x^2] - E[x]^2, eps inside
    rsqrt) composed per nn/layers.py TailGroupNorm.
    """
    b, s, c = x.shape
    gmask, c_norm, gsize = _group_masks(c, groups)
    cnt = float(s * gsize)
    xs = jnp.sum(x, axis=1)                      # (B, C)
    xs2 = jnp.sum(x * x, axis=1)
    mean_g = jnp.dot(xs, gmask, precision=_PREC_EXACT, preferred_element_type=jnp.float32) / cnt
    m2_g = jnp.dot(xs2, gmask, precision=_PREC_EXACT, preferred_element_type=jnp.float32) / cnt
    var_g = m2_g - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + _EPS)
    mean_c = jnp.dot(mean_g, gmask.T, precision=_PREC_EXACT, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, gmask.T, precision=_PREC_EXACT, preferred_element_type=jnp.float32)
    # pad scale/bias up to C (tail channels get identity)
    if c_norm < c:
        pad = c - c_norm
        scale = jnp.concatenate([scale, jnp.ones((1, pad), scale.dtype)], axis=1)
        bias = jnp.concatenate([bias, jnp.zeros((1, pad), bias.dtype)], axis=1)
    y = (x - mean_c[:, None, :]) * inv_c[:, None, :]
    y = y * scale[None] + bias[None]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    return jnp.where(ch < c_norm, y, x)


def _shared_mlp(x, w, dims, *, bt, truncate_last=False):
    """SharedMLP (conv -> TailGN -> relu per layer); x: (B*M, K, Cin) viewed
    per-sample for GN via (bt, -1, C)."""
    n = len(dims) - 1
    for i in range(1, len(dims)):
        r, k, _ = x.shape
        y = _dense(x.reshape(r * k, -1), w[f"conv_{i}"]).reshape(r, k, dims[i])
        if i == n and truncate_last:
            x = y
            continue
        g = w[f"norm_{i}"]["group_norm"]
        y = _tail_group_norm(y.reshape(bt, -1, dims[i]), g["scale"], g["bias"],
                             min(32, dims[i]))
        x = jax.nn.relu(y).reshape(r, k, dims[i])
    return x


def _add_per_batch(h, v, bt):
    """h: (B*M, K, C) += v[batch of row]: (B, C), batch = row // M.

    The obvious `h.reshape(bt, -1, C) + v[:, None, :]` breaks the BACKWARD
    Pallas kernel: the transpose emits a reshape-composed reduce_sum that
    trips a Mosaic invalid-relayout bug ("replicated in destination but not
    in source").  Expanding v with a one-hot row->batch matmul keeps both
    directions as dots."""
    r = h.shape[0]
    m = r // bt
    row_b = jax.lax.broadcasted_iota(jnp.int32, (r, bt), 0) // m
    col_b = jax.lax.broadcasted_iota(jnp.int32, (r, bt), 1)
    oh = (row_b == col_b).astype(jnp.float32)
    t = jnp.dot(oh, v, precision=_PREC_EXACT,
                preferred_element_type=jnp.float32)      # (B*M, C)
    return h + t[:, None, :]


def _injection_mlp(x, w, spec, *, bt, t4=None, cls=None, safe=False):
    """InjectionMLP (nn/layers.py): first_mlp (+t), second_mlp (+cond),
    rest_mlp, residual.  x: (B*M, K, C).  `safe` selects the VJP-lowerable
    per-batch add (see `_add_per_batch`)."""
    feature = x

    def _inject(h, v, c):
        if safe:
            return _add_per_batch(h, v, bt)
        return (h.reshape(bt, -1, c) + v[:, None, :]).reshape(h.shape)

    h = _shared_mlp(x, w["first_mlp"], spec[0:2], bt=bt)
    if t4 is not None:
        t1 = _dense(t4, w["fc_t"])                       # (B, s1)
        h = _inject(h, t1, spec[1])
    h = _shared_mlp(h, w["second_mlp"], spec[1:3], bt=bt)
    if cls is not None:
        c1 = _dense(cls, w["fc_condition"])
        h = _inject(h, c1, spec[2])
    if len(spec) > 3:
        h = _shared_mlp(h, w["rest_mlp"], spec[2:], bt=bt)
    if spec[0] == spec[-1]:
        h = h + feature
    else:
        r, k, _ = feature.shape
        h = h + _dense(feature.reshape(r * k, -1),
                       w["res_conv"]).reshape(r, k, spec[-1])
    return h


def _expand_pool_mats(r: int, k: int):
    """Constant one-hot (r*k, r) slot->row matrix E: `E @ x` expands (r, C)
    to per-slot rows, `E.T-contraction` pools slots back to rows.

    The slot axis lives FLATTENED in the row dimension so every cross-slot
    movement is a dot — mid-axis broadcasts/reductions on (r, k, C) views
    trip a Mosaic invalid-relayout bug in the TRANSPOSED (backward) kernel,
    and dots transpose to dots."""
    row = jax.lax.broadcasted_iota(jnp.int32, (r * k, r), 0) // k
    col = jax.lax.broadcasted_iota(jnp.int32, (r * k, r), 1)
    return jax.lax.stop_gradient((row == col).astype(jnp.float32))


def _pool_rows(e_mat, x2):
    """Sum slots per row: (r*k, C) -> (r, C) via E^T-contraction."""
    return jax.lax.dot_general(e_mat, x2, (((0,), (0,)), ((), ())),
                               precision=_PREC_EXACT,
                               preferred_element_type=jnp.float32)


def _expand_rows(e_mat, x):
    """Repeat each row k times: (r, C) -> (r*k, C)."""
    return jnp.dot(e_mat, x, precision=_PREC_EXACT,
                   preferred_element_type=jnp.float32)


def _concat_channels_via_dots(parts):
    """Channel concat of (..., c_i) tensors as banded placement matmuls —
    `sum_i part_i @ P_i` with P_i a constant 0/1 (c_i, total) band.  The
    plain concat's TRANSPOSE slices 3-wide channel strips, which (feeding the
    FP mlp2 chain) trips the same Mosaic relayout bug as mid-axis reductions;
    dots transpose to dots."""
    total = sum(p.shape[-1] for p in parts)
    out = None
    off = 0
    for p in parts:
        c = p.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (c, total), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (c, total), 1)
        band = jax.lax.stop_gradient((col == row + off).astype(jnp.float32))
        contrib = jnp.dot(p.reshape(-1, c), band, precision=_PREC_EXACT,
                          preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
        off += c
    return out.reshape(parts[0].shape[:-1] + (total,))


def _attention_pool(feat, grouped, value_in, w, *, bt, c1, c2, c_out,
                    safe=False):
    """AttentionPool (nn/attention.py) with full counts ('all' semantics —
    every slot valid, as guaranteed by 'nn' neighborhoods here).
    feat: (B, M, Cq); grouped: (B*M, K, Cg); value_in: (B*M, K, Cv).

    With `safe`, neighbor-slot broadcasts/reductions go through the one-hot
    expand/pool matmuls (`_expand_pool_mats`) so the custom-VJP backward
    kernel lowers; the forward-only kernel keeps the cheaper broadcast/reduce
    form (the (r*k, r) one-hot matrices grow quadratically with the batch
    tile and blow VMEM at inference tile sizes)."""
    r, k, _ = grouped.shape
    e_mat = _expand_pool_mats(r, k) if safe else None
    f1 = _dense(feat.reshape(-1, feat.shape[-1]), w["feat_conv"])  # (B*M, c1)
    if safe:
        f1 = _expand_rows(e_mat, f1).reshape(r, k, c1)
    else:
        f1 = jnp.broadcast_to(f1[:, None, :], (r, k, c1))
    g1 = _dense(grouped.reshape(r * k, -1),
                w["grouped_feat_conv"]).reshape(r, k, c2)
    total = jnp.concatenate([f1, g1], axis=-1)
    ct = c1 + c2
    inter = min(ct, c_out)
    h = jax.nn.relu(total)
    g = w["w_norm_1"]["group_norm"]
    h = _tail_group_norm(h.reshape(bt, -1, ct), g["scale"], g["bias"],
                         min(32, ct)).reshape(r, k, ct)
    h = _dense(h.reshape(r * k, -1), w["w_conv_1"]).reshape(r, k, inter)
    h = jax.nn.relu(h)
    g = w["w_norm_2"]["group_norm"]
    h = _tail_group_norm(h.reshape(bt, -1, inter), g["scale"], g["bias"],
                         min(32, inter)).reshape(r, k, inter)
    scores = _dense(h.reshape(r * k, -1), w["w_conv_2"]).reshape(r, k, c_out)
    # softmax over the slot axis; the max shift is stability-only (constant
    # wrt gradients)
    scores = scores - jax.lax.stop_gradient(
        jnp.max(scores, axis=1, keepdims=True))
    v = _dense(value_in.reshape(r * k, -1), w["feat_out_conv"])
    g = w["feat_out_norm"]["group_norm"]
    v = _tail_group_norm(v.reshape(bt, -1, c_out), g["scale"], g["bias"],
                         min(32, c_out))
    v = jax.nn.relu(v)
    if safe:
        # sum/broadcast ride the pool/expand dots (VJP-lowerable)
        e = jnp.exp(scores).reshape(r * k, c_out)
        se = _pool_rows(e_mat, e)                        # (r, c_out)
        weight = e * _expand_rows(e_mat, 1.0 / se)       # (r*k, c_out)
        return _pool_rows(e_mat, v.reshape(r * k, c_out) * weight)
    e = jnp.exp(scores)
    weight = e / jnp.sum(e, axis=1, keepdims=True)
    return jnp.sum(v.reshape(r, k, c_out) * weight, axis=1)   # (B*M, c_out)


def _pairwise_sqdist(x):
    """(B, N, 3) -> (B, N, N) squared distances (x^2 + y^2 - 2xy, matching
    ops/neighbors.py up to f32 rounding)."""
    sq = jnp.sum(x * x, axis=-1)                         # (B, N)
    xy = jax.lax.dot_general(x, x, (((2,), (2,)), ((0,), (0,))),
                             precision=_PREC_EXACT,
                             preferred_element_type=jnp.float32)
    # clamp like ops/neighbors.pairwise_sqdist: cancellation can go negative,
    # which would flip the 1/(d+1e-8) kNN weight channel
    return jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * xy, 0.0)


def _topk_onehot(d, k):
    """K smallest per row by iterative masked argmin (lowest index wins ties,
    like lax.top_k).  d: (B, M, N) -> one-hot (B, M, K, N) float32, ascending
    distance order."""
    b, m, n = d.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, m, n), 2)
    taken = jnp.zeros((b, m, n), jnp.float32)
    sel = []
    for _ in range(k):
        score = d + taken * 1e30
        mn = jnp.min(score, axis=-1, keepdims=True)
        is_min = score <= mn
        idx = jnp.min(jnp.where(is_min, iota, jnp.int32(n)), axis=-1,
                      keepdims=True)
        hot = (iota == idx).astype(jnp.float32)
        sel.append(hot)
        taken = taken + hot
    # constant wrt inputs (comparisons only); stop_gradient prunes the dead
    # cotangent dots the VJP would otherwise emit through the gather matmuls
    return jax.lax.stop_gradient(jnp.stack(sel, axis=2))  # (B, M, K, N)


def _gather(onehot2, src):
    """onehot2: (B, M*K, N); src: (B, N, C) -> (B, M*K, C) via batched matmul."""
    return jax.lax.dot_general(onehot2, src, (((2,), (1,)), ((0,), (0,))),
                               precision=_PREC_EXACT,
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# The forward for one batch tile (pure jnp; used by BOTH the XLA fallback and
# the Pallas kernel body)


def _forward_tile(spec: dict, w: dict, pc, t4, cls):
    """pc: (Bt, N, 3+in_fea-3) raw input pointcloud (xyz + features);
    t4: (Bt, 4*t_dim); cls: (Bt, cls_dim).  Returns (Bt, N, out_dim).

    spec["vjp_safe"] selects dot-based forms for every op whose TRANSPOSE
    trips Mosaic (set by make_fused_train_fn); forward-only kernels keep the
    cheaper broadcast/reduce forms."""
    safe = spec.get("vjp_safe", False)
    bt, n, _ = pc.shape
    inc_abs, inc_cen = spec["extra"]
    xyz = pc[..., :3]
    # _prepare with attach_position: pc = concat([pc, xyz]); features = pc[..., 3:]
    feats0 = jnp.concatenate([pc, xyz], axis=-1)[..., 3:]

    d = _pairwise_sqdist(xyz)                            # (Bt, N, N)

    sel_cache = {}

    def topk(k):
        # every level groups the same xyz (npoint >= N, no downsampling),
        # so the selection for a given k is computed once per forward
        if k not in sel_cache:
            sel_cache[k] = _topk_onehot(d, k)
        return sel_cache[k]

    def group(features, k, with_knn_channels=False):
        """query_and_group / group_knn_features for queries == xyz."""
        center = xyz[:, :, None, :]
        if k == n and not with_knn_channels:
            # full neighborhood: slot j = point j (index order).  The MLP is
            # per-slot and the pooling is a slot-wise softmax sum, so the
            # result is invariant to the distance ordering the flax path
            # uses — no top-k, no gather matmuls.
            nn_abs = jnp.broadcast_to(xyz[:, None, :, :], (bt, n, n, 3))
            gf = jnp.broadcast_to(features[:, None, :, :],
                                  (bt, n, n, features.shape[-1]))
            rel = nn_abs - center
            parts = [gf, rel]
            if inc_abs:
                parts.append(nn_abs)
            if inc_cen:
                parts.append(jnp.broadcast_to(center, nn_abs.shape))
            return jnp.concatenate(parts, axis=-1)
        sel = topk(k)                                    # (Bt, N, K, N)
        sel2 = sel.reshape(bt, n * k, n)
        nn_abs = _gather(sel2, xyz).reshape(bt, n, k, 3)
        rel = nn_abs - center
        gf = _gather(sel2, features).reshape(bt, n, k, features.shape[-1])
        if with_knn_channels:
            dk = jnp.sum(sel * d[:, :, None, :], axis=-1)[..., None]  # (Bt,N,K,1)
            recip = 1.0 / (dk + 1e-8)
            wgt = recip / jnp.sum(recip, axis=2, keepdims=True)
            cen = jnp.broadcast_to(center, nn_abs.shape)
            return jnp.concatenate([gf, dk, wgt, nn_abs, rel, cen], axis=-1)
        parts = [gf, rel]
        if inc_abs:
            parts.append(nn_abs)
        if inc_cen:
            parts.append(jnp.broadcast_to(center, nn_abs.shape))
        return jnp.concatenate(parts, axis=-1)

    # ---- SA tower --------------------------------------------------------
    l_feats = [feats0]
    for i, s in enumerate(spec["sa"]):
        wsa = w[f"sa_modules_{i}"]
        grouped = group(l_feats[i], s["k"])              # (Bt, N, K, C)
        k = s["k"]
        g2 = grouped.reshape(bt * n, k, grouped.shape[-1])
        out = _injection_mlp(g2, wsa["mlp"], s["spec"], bt=bt, t4=t4,
                             cls=cls, safe=safe)
        pooled = _attention_pool(l_feats[i], g2, out, wsa["attention"], bt=bt,
                                 c1=s["c_in1"], c2=s["c_in2"],
                                 c_out=s["spec"][-1], safe=safe)
        l_feats.append(pooled.reshape(bt, n, s["spec"][-1]))

    # ---- FP tower (KnnFP, walked top-down like the flax module) ----------
    n_fp = len(spec["fp"])
    for i in range(n_fp - 1, -1, -1):
        s = spec["fp"][i]
        wfp = w[f"fp_modules_{i}"]
        known_feats = l_feats[i + 1]
        skip = l_feats[i]
        grouped = group(known_feats, s["k"], with_knn_channels=True)
        g2 = grouped.reshape(bt * n, s["k"], grouped.shape[-1])
        out1 = _injection_mlp(g2, wfp["mlp1"], s["spec1"], bt=bt, safe=safe)
        interp = _attention_pool(skip, g2, out1, wfp["attention"], bt=bt,
                                 c1=s["c_in1"], c2=s["c_in2"],
                                 c_out=s["spec1"][-1], safe=safe)
        interp = interp.reshape(bt, n, s["spec1"][-1])
        if safe:
            nf = _concat_channels_via_dots([interp, skip, xyz])
        else:
            nf = jnp.concatenate([interp, skip, xyz], axis=-1)
        nf = nf.reshape(bt * n, 1, nf.shape[-1])
        out2 = _injection_mlp(nf, wfp["mlp2"], s["spec2"], bt=bt, t4=t4,
                              cls=cls, safe=safe)
        l_feats[i] = out2.reshape(bt, n, s["spec2"][-1])

    # ---- head -------------------------------------------------------------
    hf = jnp.concatenate([l_feats[0], xyz], axis=-1)     # (Bt, N, head_in)
    h = _dense(hf.reshape(bt * n, -1), w["head_conv1"]).reshape(bt, n, -1)
    g = w["head_norm"]
    h = _tail_group_norm(h, g["scale"], g["bias"], 32)
    h = jax.nn.relu(h)
    out = _dense(h.reshape(bt * n, -1), w["head_conv_out"])
    return out.reshape(bt, n, spec["out_dim"])


# ---------------------------------------------------------------------------
# Public entry


def _t_embed(outer, ts, t_dim4):
    t = calc_t_emb(ts, t_dim4 // 4)
    te = outer["t_embedder"]
    t = swish(_dense(t, te["fc_t1"]))
    return swish(_dense(t, te["fc_t2"]))


def _pallas_forward(spec, inner, pc, t4, cls, block_b, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, din = pc.shape
    if b % block_b != 0:
        raise ValueError(
            f"fused forward: batch {b} not divisible by block_b {block_b} — "
            f"the trailing {b % block_b} rows would be left unwritten")
    leaves, treedef = jax.tree.flatten(inner)

    def kernel(pc_ref, t4_ref, cls_ref, *rest):
        w_refs, o_ref = rest[:-1], rest[-1]
        w = jax.tree.unflatten(treedef, [r[...] for r in w_refs])
        o_ref[...] = _forward_tile(spec, w, pc_ref[...], t4_ref[...],
                                   cls_ref[...])

    grid = (b // block_b,)
    in_specs = [
        pl.BlockSpec((block_b, n, din), lambda i: (i, 0, 0)),
        pl.BlockSpec((block_b, t4.shape[-1]), lambda i: (i, 0)),
        pl.BlockSpec((block_b, cls.shape[-1]), lambda i: (i, 0)),
    ] + [pl.BlockSpec(l.shape, functools.partial(lambda nd, i: (0,) * nd, l.ndim))
         for l in leaves]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, n, spec["out_dim"]),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, spec["out_dim"]), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pc, t4, cls, *leaves)


def fused_forward(spec: dict, weights: tuple, pointcloud, ts, label, *,
                  block_b: int = 8, use_pallas: Optional[bool] = None,
                  interpret: bool = False):
    """Drop-in equivalent of `ConditionalPointNet2.apply(..., pointcloud,
    ts=ts, label=label)` for supported configs.

    weights: (outer, inner) from `extract_weights`.  use_pallas defaults to
    True on TPU backends, False elsewhere (plain jnp, same math).
    """
    outer, inner = weights
    pc = jnp.asarray(pointcloud, jnp.float32)
    t4 = _t_embed(outer, ts, spec["t4"])
    cls = jnp.take(outer["class_emb"]["embedding"], label, axis=0)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if not use_pallas:
        return _forward_tile(spec, inner, pc, t4, cls)
    b = pc.shape[0]
    # Mosaic accepts a batch tile that is a multiple of 8 (sublane) or equal
    # to the whole batch; adapt so any reasonable eval batch runs fused.
    if b % block_b != 0:
        if b % 8 == 0:
            block_b = 8
        elif b <= 64:
            block_b = b          # single tile — always lowerable, VMEM-safe
        else:
            raise ValueError(f"batch {b} not divisible by block_b {block_b}")
    return _pallas_forward(spec, inner, pc, t4, cls, block_b,
                           interpret=interpret)


def _pallas_backward(spec, inner, pc, t4, cls, g, block_b, interpret=False):
    """Backward pass as one Pallas kernel: each batch tile recomputes the
    forward in VMEM (jax.vjp of `_forward_tile`, traced at lowering time) and
    applies the cotangent; weight grads accumulate across the TPU grid's
    SEQUENTIAL iterations into constant-index output blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, din = pc.shape
    if b % block_b != 0:
        raise ValueError(
            f"fused backward: batch {b} not divisible by block_b {block_b} — "
            f"the trailing {b % block_b} rows would yield garbage gradients")
    leaves, treedef = jax.tree.flatten(inner)
    nw = len(leaves)

    def kernel(pc_ref, t4_ref, cls_ref, g_ref, *rest):
        w_refs = rest[:nw]
        dpc_ref, dt4_ref, dcls_ref = rest[nw:nw + 3]
        dw_refs = rest[nw + 3:]
        w = jax.tree.unflatten(treedef, [r[...] for r in w_refs])

        def f(p, t, c, ww):
            return _forward_tile(spec, ww, p, t, c)

        _, vjp = jax.vjp(f, pc_ref[...], t4_ref[...], cls_ref[...], w)
        dpc, dt4, dcls, dw = vjp(g_ref[...])
        dpc_ref[...] = dpc
        dt4_ref[...] = dt4
        dcls_ref[...] = dcls
        dleaves = jax.tree.flatten(dw)[0]
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            for r, dl in zip(dw_refs, dleaves):
                r[...] = dl

        @pl.when(jnp.logical_not(first))
        def _():
            for r, dl in zip(dw_refs, dleaves):
                r[...] += dl

    grid = (b // block_b,)
    t4d, clsd = t4.shape[-1], cls.shape[-1]

    def _const_spec(l):
        return pl.BlockSpec(l.shape,
                            functools.partial(lambda nd, i: (0,) * nd, l.ndim))

    in_specs = [
        pl.BlockSpec((block_b, n, din), lambda i: (i, 0, 0)),
        pl.BlockSpec((block_b, t4d), lambda i: (i, 0)),
        pl.BlockSpec((block_b, clsd), lambda i: (i, 0)),
        pl.BlockSpec((block_b, n, spec["out_dim"]), lambda i: (i, 0, 0)),
    ] + [_const_spec(l) for l in leaves]
    out_specs = [
        pl.BlockSpec((block_b, n, din), lambda i: (i, 0, 0)),
        pl.BlockSpec((block_b, t4d), lambda i: (i, 0)),
        pl.BlockSpec((block_b, clsd), lambda i: (i, 0)),
    ] + [_const_spec(l) for l in leaves]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, din), jnp.float32),
        jax.ShapeDtypeStruct((b, t4d), jnp.float32),
        jax.ShapeDtypeStruct((b, clsd), jnp.float32),
    ] + [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(pc, t4, cls, g, *leaves)
    dpc, dt4, dcls = outs[:3]
    dinner = jax.tree.unflatten(treedef, outs[3:])
    return dpc, dt4, dcls, dinner


def make_fused_train_fn(config: Mapping[str, Any], n_points: int, *,
                        block_b: int = 8, bwd_block_b: Optional[int] = None,
                        use_pallas: Optional[bool] = None,
                        interpret: bool = False, mesh=None,
                        axis_name: str = "data"):
    """DIFFERENTIABLE fused denoiser: `(params, x, ts, label) -> out` with a
    custom VJP whose backward is a second Pallas kernel (recompute-based, all
    activations VMEM-resident) — the training-path answer to the GroupNorm
    HBM-traffic pathology the inference kernel fixed (CLAUDE.md perf notes).

    `params` keeps the flax tree structure, so grads/optimizer/EMA/checkpoints
    are untouched; `extract_weights` reshapes are traced and transposed by
    autodiff.  With `mesh`, both kernels run under shard_map over `axis_name`
    (weights replicated, batch sharded, weight grads psum-ed) — multi-chip
    data-parallel training uses the fast kernels too.

    Returns None when the config is outside the fused architecture scope.
    """
    if not supports_config(config):
        return None
    try:
        spec = build_spec(config, n_points)
    except ValueError:
        return None
    # Only the BACKWARD kernel differentiates through _forward_tile (its body
    # is jax.vjp of the recompute), so only IT needs the vjp_safe op forms;
    # the custom-VJP forward kernel is never transposed and keeps the cheap
    # broadcast/reduce forms (and can therefore use bigger batch tiles —
    # the safe one-hot matrices grow quadratically with the tile).
    spec_safe = dict(spec, vjp_safe=True)
    bwd_bb = bwd_block_b or min(block_b, 8)

    def _resolve_pallas():
        if use_pallas is None:
            return jax.default_backend() not in ("cpu",) or interpret
        return use_pallas

    def _fwd_impl(pc, t4, cls, inner):
        if not _resolve_pallas():
            return _forward_tile(spec, inner, pc, t4, cls)
        return _pallas_forward(spec, inner, pc, t4, cls, block_b,
                               interpret=interpret)

    def _bwd_impl(pc, t4, cls, inner, g):
        if not _resolve_pallas():
            def f(p, t, c, w):
                return _forward_tile(spec_safe, w, p, t, c)
            _, vjp = jax.vjp(f, pc, t4, cls, inner)
            return vjp(g)
        return _pallas_backward(spec_safe, inner, pc, t4, cls, g, bwd_bb,
                                interpret=interpret)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        _fwd_tile, _bwd_tile = _fwd_impl, _bwd_impl
        db = P(axis_name)
        rep = P()

        def _fwd_impl(pc, t4, cls, inner):
            return shard_map(_fwd_tile, mesh=mesh,
                             in_specs=(db, db, db, rep), out_specs=db,
                             check_rep=False)(pc, t4, cls, inner)

        def _bwd_impl(pc, t4, cls, inner, g):
            def body(pc, t4, cls, inner, g):
                dpc, dt4, dcls, dinner = _bwd_tile(pc, t4, cls, inner, g)
                dinner = jax.lax.psum(dinner, axis_name)
                return dpc, dt4, dcls, dinner

            return shard_map(body, mesh=mesh,
                             in_specs=(db, db, db, rep, db),
                             out_specs=(db, db, db, rep),
                             check_rep=False)(pc, t4, cls, inner, g)

    @jax.custom_vjp
    def apply_core(pc, t4, cls, inner):
        return _fwd_impl(pc, t4, cls, inner)

    def fwd(pc, t4, cls, inner):
        return _fwd_impl(pc, t4, cls, inner), (pc, t4, cls, inner)

    def bwd(res, g):
        return _bwd_impl(*res, g)

    apply_core.defvjp(fwd, bwd)

    def apply_fn(params, x, ts, label):
        outer, inner = extract_weights(params)
        pc = jnp.asarray(x, jnp.float32)
        t4 = _t_embed(outer, ts, spec["t4"])
        cls = jnp.take(outer["class_emb"]["embedding"], label, axis=0)
        return apply_core(pc, t4, cls, inner)

    apply_fn.block_b = block_b
    return apply_fn


def make_fused_net_fn(config: Mapping[str, Any], params, n_points: int, *,
                      block_b: int = 8, use_pallas: Optional[bool] = None,
                      interpret: bool = False, mesh=None,
                      axis_name: str = "data"):
    """(x, ts, label) -> eps closure over extracted weights, or None if the
    config isn't supported.

    With `mesh`, the kernel runs under shard_map over `axis_name` (weights
    replicated, batch sharded) so multi-chip sharded generation
    (eval/generation.py) uses the fast path too.  `net_fn.block_b` reports
    the batch granularity the GLOBAL batch must divide by (the mesh size;
    per-shard tile size adapts inside `fused_forward`)."""
    if not supports_config(config):
        return None
    try:
        spec = build_spec(config, n_points)
    except ValueError:      # e.g. npoint < N or K > N at this cloud size
        return None
    weights = extract_weights(params)

    def _call(w, x, ts, label):
        return fused_forward(spec, w, x, ts, label, block_b=block_b,
                             use_pallas=use_pallas, interpret=interpret)

    granularity = block_b
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        db, rep = P(axis_name), P()
        _tile_call = _call

        def _call(w, x, ts, label):
            return shard_map(_tile_call, mesh=mesh,
                             in_specs=(rep, db, db, db), out_specs=db,
                             check_rep=False)(w, x, ts, label)

        granularity = mesh.shape[axis_name]

    def net_fn(x, ts, label):
        return _call(weights, x, ts, label)

    def batch_ok(b: int) -> bool:
        """Can a global batch of `b` run fused? (even shards + a Mosaic-
        lowerable tile — see fused_forward's adaptive block pick)."""
        if b % granularity != 0:
            return False
        local = b // granularity
        return local % block_b == 0 or local % 8 == 0 or local <= 64

    net_fn.block_b = granularity
    net_fn.batch_ok = batch_ok
    return net_fn
