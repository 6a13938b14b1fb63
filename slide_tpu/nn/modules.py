"""Set-abstraction / feature-propagation / feature-transfer modules — the
reference's `PointnetSAModule`, `PointnetFPModule`, `PointnetKnnFPModule`, and
`FeatureMapModule` (`pointnet2_ops/pointnet2_modules.py:212-873`).

Channel arithmetic replicates the reference exactly (SURVEY.md §7.3 item 3):
coordinate channels (+3 relative, +3 absolute, +3 center) are added to either
the first conv's input dim (bn_first/first_conv mode) or mlp_spec[0]; the
KnnFP path adds +11 kNN-augmentation channels to mlp1[0] and +3 xyz channels
to mlp2[0].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from slide_tpu.nn.attention import AttentionPool, GlobalAttention
from slide_tpu.nn.layers import InjectionMLP, torch_kernel_init
from slide_tpu.nn.neighborhood import query_and_group, group_knn_features
from slide_tpu.ops import (
    furthest_point_sample, gather_points, pool_features, three_nn,
    three_interpolate,
)
from slide_tpu.ops.grouping import interp_weights_from_dists


def _coord_extra(use_xyz, include_abs, include_center):
    if not use_xyz:
        return 0
    return 3 * (1 + int(include_abs) + int(include_center))


def _use_attention(setting: Optional[dict]) -> bool:
    return bool(setting) and bool(setting.get("use_attention_module", False))


def _use_global_attention(setting: Optional[dict]) -> bool:
    return bool(setting) and bool(setting.get("use_global_attention_module", False))


# Plain-Python constant: a module-level jnp.linspace would allocate a device
# array at import time and initialise the default backend before callers can
# pick a platform (breaks forced-CPU multi-chip dryruns).
_QUANTILES = tuple(i / 10.0 for i in range(11))


def _sow_neighbor_stats(module: nn.Module, counts):
    """Neighbor-count observability (`pointnet2_utils.py:432-437`): min/mean/
    max + 0..1 quantiles of per-query neighbor counts, sown into the
    'neighbor_stats' collection (read back via
    apply(..., mutable=['neighbor_stats']))."""
    c = counts.astype(jnp.float32)
    module.sow("neighbor_stats", "min_mean_max",
               jnp.stack([c.min(), c.mean(), c.max()]))
    module.sow("neighbor_stats", "quantile",
               jnp.quantile(c, jnp.asarray(_QUANTILES, jnp.float32)))


class SAModule(nn.Module):
    """Set abstraction: FPS-downsample to `npoint` centers, group each center's
    neighborhood, run the injection MLP, pool (attention or max/avg)
    (`pointnet2_modules.py:212-454`, single-scale as used by every shipped
    config).

    `mlp_spec[0]` must already equal the incoming feature dim (the builder's
    job, `pointnet2_ssg_sem.py:58-71`); coordinate channels are added here.
    """

    npoint: int
    mlp_spec: Sequence[int]
    nsample: int
    radius: float = 0.0
    neighbor_def: str = "nn"
    use_xyz: bool = True
    include_abs_coordinate: bool = False
    include_center_coordinate: bool = False
    include_t: bool = False
    include_condition: bool = False
    include_second_condition: bool = False
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    first_conv: bool = False
    first_conv_in_channel: int = 0
    res_connect: bool = False
    activation: str = "relu"
    attention_setting: Optional[dict] = None
    global_attention_setting: Optional[dict] = None
    record_neighbor_stats: bool = False

    @nn.compact
    def __call__(self, xyz, features, t_emb=None, condition_emb=None,
                 second_condition_emb=None, pooling: str = "max"):
        extra = _coord_extra(self.use_xyz, self.include_abs_coordinate,
                             self.include_center_coordinate)
        spec = list(self.mlp_spec)
        if self.first_conv:
            fc_in = self.first_conv_in_channel + extra
        else:
            fc_in = 0
            spec[0] = spec[0] + extra
        # attention query/key channel dims (pointnet2_modules.py:391-394)
        c_in1 = self.first_conv_in_channel if self.first_conv else self.mlp_spec[0]
        c_in2 = fc_in if self.first_conv else spec[0]

        n = xyz.shape[1]
        use_att = _use_attention(self.attention_setting)
        if n <= self.npoint:
            # all points kept, order preserved (pointnet2_modules.py:254-258)
            new_xyz, new_feat_q = xyz, features
        else:
            idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, idx)
            new_feat_q = gather_points(features, idx) if use_att else None

        grouped, counts = query_and_group(
            xyz, new_xyz, features, nsample=self.nsample, radius=self.radius,
            neighbor_def=self.neighbor_def, use_xyz=self.use_xyz,
            include_abs_coordinate=self.include_abs_coordinate,
            include_center_coordinate=self.include_center_coordinate, subset=True)
        if self.record_neighbor_stats:
            _sow_neighbor_stats(self, counts)

        out = InjectionMLP(
            spec, bn=self.bn, include_t=self.include_t, bn_first=self.bn_first,
            bias=self.bias, first_conv=self.first_conv, first_conv_in_channel=fc_in,
            res_connect=self.res_connect, include_condition=self.include_condition,
            include_second_condition=self.include_second_condition,
            activation=self.activation, name="mlp",
        )(grouped,
          t_emb=t_emb if self.include_t else None,
          condition_emb=condition_emb if self.include_condition else None,
          second_condition_emb=second_condition_emb if self.include_second_condition else None)

        if use_att:
            a = self.attention_setting
            new_features = AttentionPool(
                c_in1=max(c_in1, 32), c_in2=max(c_in2, 32), c_out=spec[-1],
                attention_bn=a["attention_bn"],
                transform_grouped_feat_out=a["transform_grouped_feat_out"],
                last_activation=a["last_activation"], name="attention",
            )(new_feat_q, grouped, out, counts)
        else:
            new_features = pool_features(out, counts, pooling)

        if _use_global_attention(self.global_attention_setting):
            g = self.global_attention_setting
            new_features = GlobalAttention(
                c=spec[-1], additional_dim=3, attention_bn=g["attention_bn"],
                last_activation=g["last_activation"], name="global_attention",
            )(jnp.concatenate([new_features, new_xyz], axis=-1))

        return new_xyz, new_features


class FPModule(nn.Module):
    """Feature propagation via 3-NN inverse-distance interpolation
    (`pointnet2_modules.py:457-588`).  `mlp_spec[0]` must equal
    decoder_dim_in + skip_dim (+additional); the optional grouper adds
    coordinate channels here."""

    mlp_spec: Sequence[int]
    include_t: bool = False
    include_condition: bool = False
    include_second_condition: bool = False
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    res_connect: bool = False
    include_grouper: bool = False
    radius: float = 0.0
    nsample: int = 32
    use_xyz: bool = True
    include_abs_coordinate: bool = True
    include_center_coordinate: bool = False
    neighbor_def: str = "radius"
    activation: str = "relu"

    @nn.compact
    def __call__(self, unknown, known, unknow_feats, known_feats, t_emb=None,
                 condition_emb=None, second_condition_emb=None, pooling: str = "max"):
        spec = list(self.mlp_spec)
        if self.include_grouper:
            spec[0] = spec[0] + _coord_extra(self.use_xyz, self.include_abs_coordinate,
                                             self.include_center_coordinate)
        if known is not None:
            dist, idx = three_nn(unknown, known)
            weight = interp_weights_from_dists(dist)
            interpolated = three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1]))

        if unknow_feats is not None:
            new_features = jnp.concatenate([interpolated, unknow_feats], axis=-1)
        else:
            new_features = interpolated

        counts = None
        if self.include_grouper:
            new_features, counts = query_and_group(
                unknown, unknown, new_features, nsample=self.nsample,
                radius=self.radius, neighbor_def=self.neighbor_def,
                use_xyz=self.use_xyz,
                include_abs_coordinate=self.include_abs_coordinate,
                include_center_coordinate=self.include_center_coordinate, subset=True)
        else:
            new_features = new_features[:, :, None, :]

        out = InjectionMLP(
            spec, bn=self.bn, include_t=self.include_t, bn_first=self.bn_first,
            bias=self.bias, res_connect=self.res_connect,
            include_condition=self.include_condition,
            include_second_condition=self.include_second_condition,
            activation=self.activation, name="mlp",
        )(new_features,
          t_emb=t_emb if self.include_t else None,
          condition_emb=condition_emb if self.include_condition else None,
          second_condition_emb=second_condition_emb if self.include_second_condition else None)

        if self.include_grouper:
            return pool_features(out, counts, pooling)
        return out[:, :, 0, :]


class KnnFPModule(nn.Module):
    """kNN feature propagation with attention aggregation
    (`pointnet2_modules.py:666-873`) — the FP used by every shipped config
    (`use_knn_FP: true`).

    mlp1 transforms the +11-augmented kNN neighborhoods of `unknown` in
    `known` (optionally conditioned on the SECOND condition); attention (query
    = skip features) or max-pool aggregates them; the result is concatenated
    with the skip features and xyz (+3), then mlp2 (with t + first condition)
    produces the output; optional degenerate global attention at the end.

    mlp1[0] / mlp2[0] must be the builder-level dims
    (`pointnet2_ssg_sem.py:135-141`): mlp1[0] = decoder_dim_{i+1}
    (+additional), mlp2[0] = decoder_dim_i + skip_dim; +11 and +3 are added
    here.
    """

    mlp1_spec: Sequence[int]
    mlp2_spec: Sequence[int]
    k: int
    include_t: bool = False
    include_condition: bool = False
    include_second_condition: bool = False
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    res_connect: bool = False
    include_grouper: bool = False
    radius: float = 0.0
    nsample: int = 32
    use_xyz: bool = True
    include_abs_coordinate: bool = True
    include_center_coordinate: bool = False
    neighbor_def: str = "radius"
    activation: str = "relu"
    attention_setting: Optional[dict] = None
    global_attention_setting: Optional[dict] = None

    @nn.compact
    def __call__(self, unknown, known, unknow_feats, known_feats, t_emb=None,
                 condition_emb=None, second_condition_emb=None, pooling: str = "max"):
        spec1 = list(self.mlp1_spec)
        spec2 = list(self.mlp2_spec)
        spec1[0] = spec1[0] + 11
        use_att = _use_attention(self.attention_setting)
        # attention dims fixed BEFORE grouper/xyz adjustments of spec2
        # (pointnet2_modules.py:715-725)
        c_in1 = spec2[0] - spec1[-1]      # = skip feature dim
        c_in2 = spec1[0]
        if self.include_grouper:
            spec2[0] = spec2[0] + _coord_extra(self.use_xyz, self.include_abs_coordinate,
                                               self.include_center_coordinate)
        else:
            spec2[0] = spec2[0] + 3

        if _use_attention(self.attention_setting) or _use_global_attention(self.global_attention_setting):
            if known is None or unknown is None:
                raise ValueError("attention KnnFP requires both clouds")
            if _use_global_attention(self.global_attention_setting) and self.include_grouper:
                raise ValueError("global attention excludes the grouper")

        if known is not None:
            grouped = group_knn_features(unknown, known, known_feats, self.k)
            out1 = InjectionMLP(
                spec1, bn=self.bn, include_t=False, bn_first=self.bn_first,
                bias=self.bias, res_connect=self.res_connect,
                include_condition=self.include_second_condition,
                activation=self.activation, name="mlp1",
            )(grouped,
              condition_emb=second_condition_emb if self.include_second_condition else None)
            if use_att:
                a = self.attention_setting
                interpolated = AttentionPool(
                    c_in1=max(c_in1, 32), c_in2=max(c_in2, 32), c_out=spec1[-1],
                    attention_bn=a["attention_bn"],
                    transform_grouped_feat_out=a["transform_grouped_feat_out"],
                    last_activation=a["last_activation"], name="attention",
                )(unknow_feats, grouped, out1, "all")
            else:
                interpolated = pool_features(out1, "all", pooling)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1]))

        if unknow_feats is not None:
            new_features = jnp.concatenate([interpolated, unknow_feats], axis=-1)
        else:
            new_features = interpolated

        counts = None
        if self.include_grouper:
            new_features, counts = query_and_group(
                unknown, unknown, new_features, nsample=self.nsample,
                radius=self.radius, neighbor_def=self.neighbor_def,
                use_xyz=self.use_xyz,
                include_abs_coordinate=self.include_abs_coordinate,
                include_center_coordinate=self.include_center_coordinate, subset=True)
        else:
            new_features = jnp.concatenate([new_features, unknown], axis=-1)
            new_features = new_features[:, :, None, :]

        out = InjectionMLP(
            spec2, bn=self.bn, include_t=self.include_t, bn_first=self.bn_first,
            bias=self.bias, res_connect=self.res_connect,
            include_condition=self.include_condition,
            activation=self.activation, name="mlp2",
        )(new_features,
          t_emb=t_emb if self.include_t else None,
          condition_emb=condition_emb if self.include_condition else None)

        if self.include_grouper:
            return pool_features(out, counts, pooling)
        out = out[:, :, 0, :]
        if _use_global_attention(self.global_attention_setting):
            g = self.global_attention_setting
            out = GlobalAttention(
                c=spec2[-1], additional_dim=3, attention_bn=g["attention_bn"],
                last_activation=g["last_activation"], name="global_attention",
            )(jnp.concatenate([out, unknown], axis=-1))
        return out


class FeatureMapModule(nn.Module):
    """Cross-cloud feature transfer (`pointnet2_modules.py:591-663`): for each
    point in `new_xyz`, group its neighbors in the CONDITION cloud `xyz`,
    transform, and pool (attention query = the target cloud's own features).

    mlp_spec[0] must be the condition feature dim; coordinate channels are
    added here.  Called with subset=False — radius mode uses the
    zero-neighbor fallback.
    """

    mlp_spec: Sequence[int]
    k: int
    radius: float = 0.0
    neighbor_def: str = "radius"
    use_xyz: bool = True
    include_abs_coordinate: bool = True
    include_center_coordinate: bool = False
    bn: bool = True
    bn_first: bool = True
    bias: bool = True
    res_connect: bool = True
    first_conv: bool = False
    first_conv_in_channel: int = 0
    activation: str = "relu"
    attention_setting: Optional[dict] = None
    query_feature_dim: Optional[int] = None
    record_neighbor_stats: bool = False

    @nn.compact
    def __call__(self, xyz, features, new_xyz, features_at_new_xyz=None,
                 subset: bool = False, pooling: str = "max"):
        extra = _coord_extra(self.use_xyz, self.include_abs_coordinate,
                             self.include_center_coordinate)
        spec = list(self.mlp_spec)
        if self.first_conv:
            fc_in = self.first_conv_in_channel + extra
        else:
            fc_in = 0
            spec[0] = spec[0] + extra
        c_in2 = fc_in if self.first_conv else spec[0]

        grouped, counts = query_and_group(
            xyz, new_xyz, features, nsample=self.k, radius=self.radius,
            neighbor_def=self.neighbor_def, use_xyz=self.use_xyz,
            include_abs_coordinate=self.include_abs_coordinate,
            include_center_coordinate=self.include_center_coordinate, subset=subset)
        if self.record_neighbor_stats:
            _sow_neighbor_stats(self, counts)

        out = InjectionMLP(
            spec, bn=self.bn, include_t=False, bn_first=self.bn_first,
            bias=self.bias, first_conv=self.first_conv, first_conv_in_channel=fc_in,
            res_connect=self.res_connect, activation=self.activation, name="mlp",
        )(grouped)

        if _use_attention(self.attention_setting):
            a = self.attention_setting
            return AttentionPool(
                c_in1=max(self.query_feature_dim, 32), c_in2=max(c_in2, 32),
                c_out=spec[-1], attention_bn=a["attention_bn"],
                transform_grouped_feat_out=a["transform_grouped_feat_out"],
                last_activation=a["last_activation"], name="attention",
            )(features_at_new_xyz, grouped, out, counts)
        return pool_features(out, counts, pooling)
