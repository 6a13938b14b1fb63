"""The conditional PointNet++ denoiser — TPU-native equivalent of the
reference's `PointNet2CloudCondition`
(`pointnet2/models/pointnet2_with_pcld_condition.py:27-489`), which serves as:
  - the position DDPM network (unconditional, K=16 latent points),
  - the feature DDPM network (latent diffusion over keypoint features),
  - the SAP refine+upsample network (condition branch off, no t),
  - the per-level feature extractor inside the autoencoder decoders.

Architecture: a dual encoder-decoder.  The noisy cloud x_t runs through an
SA (set abstraction) tower and an FP (feature propagation) tower; an optional
parallel tower processes a CONDITION cloud, and `FeatureMapModule`s transfer
condition features onto the noisy cloud at every level.  Class labels and/or a
global PNet feature are injected into every block's MLP.

Config keys and channel arithmetic replicate the reference exactly (SURVEY.md
§7.3 item 3) so that every shipped config builds the same network.

TPU notes: everything is channels-last, fully static shapes, jit-friendly; the
condition branch is exposed via `encode_condition` so reverse-diffusion
sampling can compute it ONCE and carry it through a `lax.scan` (replacing the
reference's mutable `use_retained_condition_feature` caching,
`pointnet2_with_pcld_condition.py:280-284,375-399`).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slide_tpu.nn import precision as mp

from slide_tpu.nn.layers import (InjectionMLP, TimestepEmbedder, get_activation,
                                 torch_kernel_init)
from slide_tpu.nn.modules import SAModule, FPModule, KnnFPModule, FeatureMapModule
from slide_tpu.nn.pnet import PNet2Stage


def positional_encode(x: jax.Array, multires: int) -> jax.Array:
    """NeRF positional encoding (`models/model_utils.py:3-51`): identity plus
    sin/cos at frequencies 2^0..2^(multires-1).  (…, 3) -> (…, 3*(1+2m))."""
    outs = [x]
    for i in range(multires):
        f = float(2 ** i)
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def pos_encode_out_dim(multires: int) -> int:
    return 3 * (1 + 2 * multires)


def _as_list(v, n):
    return list(v) if isinstance(v, (list, tuple)) else [v] * n


def _build_sa_stack(hp: Mapping, npoint, radius, nsample, feature_dim, mlp_depth,
                    in_fea_dim, include_t, include_class_condition, *,
                    include_global_feature=False,
                    additional_fea_dim=None, neighbor_def="radius",
                    activation="relu", bn=True, attention_setting=None,
                    global_attention_setting=None):
    """Mirror of `build_SA_model` (`pointnet2_ssg_sem.py:47-104`)."""
    neighbor_def = _as_list(neighbor_def, len(radius))
    mods = []
    for i in range(len(npoint)):
        spec = [feature_dim[i]] * mlp_depth + [feature_dim[i + 1]]
        if additional_fea_dim is not None:
            spec[0] = spec[0] + additional_fea_dim[i]
        first_conv = bool(hp["bn_first"]) if i == 0 else False
        if i == 0 and not first_conv:
            spec[0] = in_fea_dim
        if include_global_feature:
            include_condition, include_second = True, include_class_condition
        else:
            include_condition, include_second = include_class_condition, False
        use_gatt = (global_attention_setting is not None
                    and global_attention_setting["use_global_attention_module"]
                    and i in global_attention_setting["global_attention_layer_index"])
        mods.append(SAModule(
            npoint=npoint[i], mlp_spec=tuple(spec), nsample=nsample[i],
            radius=radius[i], neighbor_def=neighbor_def[i],
            use_xyz=hp["model.use_xyz"],
            include_abs_coordinate=hp["include_abs_coordinate"],
            include_center_coordinate=hp.get("include_center_coordinate", False),
            include_t=include_t, include_condition=include_condition,
            include_second_condition=include_second, bn=bn,
            bn_first=hp["bn_first"], bias=hp["bias"], first_conv=first_conv,
            first_conv_in_channel=in_fea_dim, res_connect=hp["res_connect"],
            activation=activation, attention_setting=attention_setting,
            global_attention_setting=global_attention_setting if use_gatt else None,
            record_neighbor_stats=hp.get("record_neighbor_stats", False)))
    return mods


def _build_fp_stack(hp: Mapping, decoder_feature_dim, decoder_mlp_depth,
                    feature_dim, in_fea_dim, include_t, include_class_condition, *,
                    include_global_feature=False,
                    additional_fea_dim=None, use_knn_fp=False, k=3,
                    include_grouper=False, radius=(0.0,), nsample=(32,),
                    neighbor_def="radius", activation="relu", bn=True,
                    attention_setting=None, global_attention_setting=None):
    """Mirror of `build_FP_model` (`pointnet2_ssg_sem.py:106-177`)."""
    neighbor_def = _as_list(neighbor_def, len(radius))
    mods = []
    for i in range(len(decoder_feature_dim) - 1):
        skip_dim = in_fea_dim if i == 0 else feature_dim[i]
        if include_global_feature:
            include_condition, include_second = True, include_class_condition
        else:
            include_condition, include_second = include_class_condition, False
        use_gatt = (global_attention_setting is not None
                    and global_attention_setting["use_global_attention_module"]
                    and i in global_attention_setting["global_attention_layer_index"])
        common = dict(
            include_t=include_t, include_condition=include_condition,
            bn=bn, bn_first=hp["bn_first"], bias=hp["bias"],
            res_connect=hp["res_connect"], include_grouper=include_grouper,
            radius=radius[i], nsample=nsample[i], use_xyz=hp["model.use_xyz"],
            include_abs_coordinate=hp["include_abs_coordinate"],
            include_center_coordinate=hp.get("include_center_coordinate", False),
            neighbor_def=neighbor_def[i], activation=activation)
        if use_knn_fp:
            spec1 = [decoder_feature_dim[i + 1]] + [decoder_feature_dim[i]] * decoder_mlp_depth
            spec2 = [decoder_feature_dim[i] + skip_dim] + [decoder_feature_dim[i]] * decoder_mlp_depth
            if additional_fea_dim is not None:
                spec1[0] = spec1[0] + additional_fea_dim[i]
            mods.append(KnnFPModule(
                mlp1_spec=tuple(spec1), mlp2_spec=tuple(spec2), k=k,
                include_second_condition=include_second,
                attention_setting=attention_setting,
                global_attention_setting=global_attention_setting if use_gatt else None,
                **common))
        else:
            spec = [decoder_feature_dim[i + 1] + skip_dim] + [decoder_feature_dim[i]] * decoder_mlp_depth
            if additional_fea_dim is not None:
                spec[0] = spec[0] + additional_fea_dim[i]
            mods.append(FPModule(mlp_spec=tuple(spec),
                                 include_second_condition=include_second,
                                 **common))
    return mods


def upsample_factor_multiplier(hp: Mapping) -> int:
    """Output-dim multiplier for the SAP refine+upsample head
    (`pointnet2_with_pcld_condition.py:245-253`)."""
    puf = hp.get("point_upsample_factor", 1)
    if puf > 1:
        if hp["first_refine_coarse_points"]:
            puf = puf + 1
            if hp["include_displacement_center_to_final_output"]:
                puf = puf - 1
        else:
            if hp.get("include_displacement_center_to_final_output", False):
                raise ValueError("include_displacement_center requires first_refine_coarse_points")
    return int(puf)


class ConditionalPointNet2(nn.Module):
    """See module docstring.  `config` is the reference's `pointnet_config`
    dict (schema per SURVEY.md §5.6)."""

    config: Mapping[str, Any]

    def setup(self):
        hp = self.config
        self.include_t = hp["include_t"]
        self.t_dim = hp["t_dim"]
        self.include_class_condition = hp.get("include_class_condition", False)
        self.include_local_feature = hp.get("include_local_feature", True)
        self.include_global_feature = hp.get("include_global_feature", False)
        self.concate_partial = hp.get("concate_partial_with_noisy_input", False)
        if self.concate_partial and (self.include_local_feature or self.include_global_feature):
            raise ValueError("concate_partial excludes local/global condition features")
        self.transform_output = hp.get("transform_output", True)
        self.attach_position = hp["attach_position_to_input_feature"]
        self.use_position_encoding = hp.get("use_position_encoding", False)
        self.pos_multires = hp.get("position_encoding_multires", 0)
        self.pooling = hp.get("pooling", "max")
        self.activation_name = hp.get("activation", "relu")
        self.bn = hp.get("bn", True)

        attention_setting = hp.get("attention_setting", None)
        self.attention_setting = attention_setting
        fm_attention = dict(attention_setting) if attention_setting else None
        if fm_attention is not None:
            fm_attention["use_attention_module"] = fm_attention[
                "add_attention_to_FeatureMapper_module"]
        self.fm_attention = fm_attention
        global_attention_setting = hp.get("global_attention_setting", None)

        in_fea_dim = hp["in_fea_dim"]
        partial_in_fea_dim = hp.get("partial_in_fea_dim", in_fea_dim)
        if self.attach_position:
            in_fea_dim += 3
            partial_in_fea_dim += 3
        if self.use_position_encoding:
            in_fea_dim += pos_encode_out_dim(self.pos_multires)
            partial_in_fea_dim += pos_encode_out_dim(self.pos_multires)
        self.in_fea_dim_full = in_fea_dim
        self.partial_in_fea_dim_full = partial_in_fea_dim

        if self.include_class_condition:
            self.class_emb = nn.Embed(hp["num_class"], hp["class_condition_dim"],
                                      embedding_init=nn.initializers.normal(1.0))
        if self.include_t:
            self.t_embedder = TimestepEmbedder(self.t_dim)

        self.global_feature_dim = None
        if self.include_global_feature:
            pnet_arch = [list(a) for a in hp["pnet_global_feature_architecture"]]
            if self.use_position_encoding:
                pnet_arch[0][0] += pos_encode_out_dim(self.pos_multires)
            self.global_feature_dim = pnet_arch[1][-1]
            self.global_pnet = PNet2Stage(
                tuple(pnet_arch[0]), tuple(pnet_arch[1]), bn=self.bn,
                remove_last_activation=hp.get("global_feature_remove_last_activation", True))

        arch = hp["architecture"]
        feature_dim = arch["feature_dim"]
        decoder_feature_dim = arch["decoder_feature_dim"]
        if decoder_feature_dim[-1] != feature_dim[-1]:
            raise ValueError("decoder_feature_dim[-1] must equal feature_dim[-1]")

        # --- condition branch -------------------------------------------------
        if self.include_local_feature:
            cond_arch = hp["condition_net_architecture"]
            mapper_arch = hp["feature_mapper_architecture"]
            cond_fdim = cond_arch["feature_dim"]
            self.sa_condition = tuple(_build_sa_stack(
                hp, cond_arch["npoint"], cond_arch["radius"], cond_arch["nsample"],
                cond_fdim, cond_arch["mlp_depth"], partial_in_fea_dim, False, False,
                neighbor_def=cond_arch["neighbor_definition"],
                activation=self.activation_name, bn=self.bn,
                attention_setting=attention_setting))

            enc_map_dim = mapper_arch["encoder_feature_map_dim"]
            enc_maps = []
            for i in range(len(enc_map_dim)):
                if i == 0:
                    first_conv = bool(hp["bn_first"])
                    in_dim = cond_fdim[i] if first_conv else partial_in_fea_dim
                    query_dim = in_fea_dim
                else:
                    first_conv = False
                    in_dim = cond_fdim[i]
                    query_dim = feature_dim[i]
                spec = [in_dim] + [enc_map_dim[i]] * mapper_arch["encoder_mlp_depth"]
                enc_maps.append(FeatureMapModule(
                    mlp_spec=tuple(spec), k=mapper_arch["encoder_nsample"][i],
                    radius=mapper_arch["encoder_radius"][i],
                    neighbor_def=mapper_arch["neighbor_definition"],
                    use_xyz=hp["model.use_xyz"],
                    include_abs_coordinate=hp["include_abs_coordinate"],
                    include_center_coordinate=hp.get("include_center_coordinate", False),
                    bn=self.bn, bn_first=hp["bn_first"], bias=hp["bias"],
                    res_connect=hp["res_connect"], first_conv=first_conv,
                    first_conv_in_channel=partial_in_fea_dim,
                    activation=self.activation_name,
                    attention_setting=fm_attention, query_feature_dim=query_dim,
                    record_neighbor_stats=hp.get("record_neighbor_stats", False)))
            self.encoder_feature_map = tuple(enc_maps)

            cond_dec_dim = cond_arch["decoder_feature_dim"]
            self.fp_condition = tuple(_build_fp_stack(
                hp, cond_dec_dim, cond_arch["decoder_mlp_depth"], cond_fdim,
                partial_in_fea_dim, False, False,
                use_knn_fp=cond_arch.get("use_knn_FP", False),
                k=cond_arch.get("K", 3),
                include_grouper=cond_arch.get("include_grouper", False),
                radius=cond_arch["radius"], nsample=cond_arch["nsample"],
                neighbor_def=cond_arch["neighbor_definition"],
                activation=self.activation_name, bn=self.bn,
                attention_setting=attention_setting))

            dec_map_dim = mapper_arch["decoder_feature_map_dim"]
            dec_maps = []
            for i in range(len(dec_map_dim)):
                spec = [cond_dec_dim[i]] + [dec_map_dim[i]] * mapper_arch["decoder_mlp_depth"]
                dec_maps.append(FeatureMapModule(
                    mlp_spec=tuple(spec), k=mapper_arch["decoder_nsample"][i],
                    radius=mapper_arch["decoder_radius"][i],
                    neighbor_def=mapper_arch["neighbor_definition"],
                    use_xyz=hp["model.use_xyz"],
                    include_abs_coordinate=hp["include_abs_coordinate"],
                    include_center_coordinate=hp.get("include_center_coordinate", False),
                    bn=self.bn, bn_first=hp["bn_first"], bias=hp["bias"],
                    res_connect=hp["res_connect"], first_conv=False,
                    activation=self.activation_name,
                    attention_setting=fm_attention,
                    query_feature_dim=decoder_feature_dim[i],
                    record_neighbor_stats=hp.get("record_neighbor_stats", False)))
            self.decoder_feature_map = tuple(dec_maps)
            self.enc_map_dim = enc_map_dim
            self.dec_map_dim = dec_map_dim
        else:
            self.enc_map_dim = None
            self.dec_map_dim = None

        # --- main branch ------------------------------------------------------
        main_in = in_fea_dim + (self.enc_map_dim[0] if self.include_local_feature else 0)
        self.sa_modules = tuple(_build_sa_stack(
            hp, arch["npoint"], arch["radius"], arch["nsample"], feature_dim,
            arch["mlp_depth"], main_in, self.include_t,
            self.include_class_condition,
            include_global_feature=self.include_global_feature,
            additional_fea_dim=self.enc_map_dim if self.include_local_feature else None,
            neighbor_def=arch["neighbor_definition"],
            activation=self.activation_name, bn=self.bn,
            attention_setting=attention_setting,
            global_attention_setting=global_attention_setting))

        self.fp_modules = tuple(_build_fp_stack(
            hp, decoder_feature_dim, arch["decoder_mlp_depth"], feature_dim,
            in_fea_dim, self.include_t, self.include_class_condition,
            include_global_feature=self.include_global_feature,
            additional_fea_dim=self.dec_map_dim[1:] if self.include_local_feature else None,
            use_knn_fp=arch.get("use_knn_FP", False), k=arch.get("K", 3),
            include_grouper=arch.get("include_grouper", False),
            radius=arch["radius"], nsample=arch["nsample"],
            neighbor_def=arch["neighbor_definition"],
            activation=self.activation_name, bn=self.bn,
            attention_setting=attention_setting,
            global_attention_setting=global_attention_setting))

        # --- output head ------------------------------------------------------
        self.out_dim = hp["out_dim"] * upsample_factor_multiplier(hp)
        if self.transform_output:
            head_in = decoder_feature_dim[0] + 3
            if self.include_local_feature:
                head_in += self.dec_map_dim[0]
            self.head_in = head_in
            if hp["bn_first"]:
                self.head_conv_out = mp.Dense(self.out_dim, kernel_init=torch_kernel_init)
            else:
                self.head_conv1 = mp.Dense(128, use_bias=hp["bias"],
                                           kernel_init=torch_kernel_init)
                if self.bn:
                    self.head_norm = mp.GroupNorm(num_groups=32, epsilon=1e-5)
                self.head_conv_out = mp.Dense(self.out_dim, kernel_init=torch_kernel_init)

    # -------------------------------------------------------------------------

    def _prepare(self, pc):
        """Attach positional encoding / raw positions as input features and
        split into (xyz, features) (`pointnet2_with_pcld_condition.py:321-347`,
        `pointnet2_ssg_sem.py:42-45`)."""
        if self.use_position_encoding:
            pc = jnp.concatenate([pc, positional_encode(pc[..., :3], self.pos_multires)],
                                 axis=-1)
        if self.attach_position:
            pc = jnp.concatenate([pc, pc[..., :3]], axis=-1)
        xyz = pc[..., :3]
        features = pc[..., 3:] if pc.shape[-1] > 3 else None
        return xyz, features

    def _embeddings(self, ts, label):
        t_emb = self.t_embedder(ts) if (ts is not None and self.include_t) else None
        class_emb = (self.class_emb(label)
                     if (label is not None and self.include_class_condition) else None)
        return t_emb, class_emb

    def _condition_embs(self, global_feature, class_emb):
        """condition/second-condition routing
        (`pointnet2_with_pcld_condition.py:384-389`)."""
        if self.include_global_feature:
            return global_feature, class_emb
        return class_emb, None

    def encode_condition(self, condition):
        """Run the condition cloud's SA + FP towers once; the returned cache
        can be reused across every reverse-diffusion step."""
        uvw, cond_features = self._prepare(condition)
        cache = {}
        if self.include_global_feature:
            raw_dim = self.partial_in_fea_dim_full - 3 if self.attach_position \
                else self.partial_in_fea_dim_full
            if raw_dim > 0:
                global_input = jnp.concatenate([uvw, condition[..., 3:3 + raw_dim]],
                                               axis=-1)
            else:
                global_input = uvw
            if self.use_position_encoding:
                global_input = jnp.concatenate(
                    [global_input, positional_encode(uvw, self.pos_multires)], axis=-1)
            cache["global"] = self.global_pnet(global_input)
        if self.include_local_feature:
            l_uvw, enc = [uvw], [cond_features]
            for sa in self.sa_condition:
                u, f = sa(l_uvw[-1], enc[-1], pooling=self.pooling)
                l_uvw.append(u)
                enc.append(f)
            # decoder: dec[L] = enc[L]; walk down (pointnet2_with_pcld_condition.py:438-441)
            n_levels = len(self.fp_condition)
            dec = list(enc)
            for i in range(-1, -(n_levels + 1), -1):
                dec[i - 1] = self.fp_condition[i](
                    l_uvw[i - 1], l_uvw[i], dec[i - 1], dec[i], pooling=self.pooling)
            cache["l_uvw"] = l_uvw
            cache["enc"] = enc
            cache["dec"] = dec
        return cache

    def __call__(self, pointcloud, condition=None, ts=None, label=None,
                 cond_cache=None):
        """Predict the denoiser output for (B, N, 3+in_fea_dim) input.

        condition: optional (B, M, 3+partial_in_fea_dim) condition cloud.
        cond_cache: optional result of `encode_condition(condition)`.
        """
        if (self.include_global_feature or self.include_local_feature) and \
                condition is None and cond_cache is None:
            raise ValueError("this model requires a condition cloud (or its cache)")

        n_out = pointcloud.shape[1]
        if self.concate_partial:
            # single-tower variant: concat x_t (tagged 0) with condition
            # (tagged 1) (`pointnet2_with_pcld_condition.py:303-318`)
            if pointcloud.shape[-1] != 3:
                raise ValueError("concate_partial expects bare xyz input")
            if condition is None:
                raise ValueError("concate_partial requires a condition cloud")
            if condition.shape[-1] not in (3, 4):
                raise ValueError(
                    "concate_partial condition must have 3 or 4 channels "
                    f"(got {condition.shape[-1]})")
            zeros = jnp.zeros(pointcloud.shape[:2] + (1,), pointcloud.dtype)
            pc = jnp.concatenate([pointcloud, zeros], axis=-1)
            if condition.shape[-1] == 3:
                ones = jnp.ones(condition.shape[:2] + (1,), condition.dtype)
                condition = jnp.concatenate([condition, ones], axis=-1)
            pointcloud = jnp.concatenate([pc, condition], axis=1)
            condition = None

        xyz, features = self._prepare(pointcloud)
        t_emb, class_emb = self._embeddings(ts, label)

        if cond_cache is None and (self.include_global_feature or self.include_local_feature):
            cond_cache = self.encode_condition(condition)
        global_feature = cond_cache.get("global") if self.include_global_feature else None
        condition_emb, second_condition_emb = self._condition_embs(global_feature, class_emb)

        l_xyz, l_features = [xyz], [features]
        for i, sa in enumerate(self.sa_modules):
            if self.include_local_feature:
                mapped = self.encoder_feature_map[i](
                    cond_cache["l_uvw"][i], cond_cache["enc"][i], l_xyz[i],
                    features_at_new_xyz=l_features[i], subset=False,
                    pooling=self.pooling)
                input_feature = jnp.concatenate([mapped, l_features[i]], axis=-1) \
                    if l_features[i] is not None else mapped
            else:
                input_feature = l_features[i]
            u, f = sa(l_xyz[i], input_feature, t_emb=t_emb,
                      condition_emb=condition_emb,
                      second_condition_emb=second_condition_emb,
                      pooling=self.pooling)
            l_xyz.append(u)
            l_features.append(f)

        n_fp = len(self.fp_modules)
        for i in range(-1, -(n_fp + 1), -1):
            if self.include_local_feature:
                mapped = self.decoder_feature_map[i](
                    cond_cache["l_uvw"][i], cond_cache["dec"][i], l_xyz[i],
                    features_at_new_xyz=l_features[i], subset=False,
                    pooling=self.pooling)
                input_feature = jnp.concatenate([mapped, l_features[i]], axis=-1)
            else:
                input_feature = l_features[i]
            l_features[i - 1] = self.fp_modules[i](
                l_xyz[i - 1], l_xyz[i], l_features[i - 1], input_feature,
                t_emb=t_emb, condition_emb=condition_emb,
                second_condition_emb=second_condition_emb, pooling=self.pooling)

        if self.include_local_feature:
            mapped = self.decoder_feature_map[0](
                cond_cache["l_uvw"][0], cond_cache["dec"][0], l_xyz[0],
                features_at_new_xyz=l_features[0], subset=False,
                pooling=self.pooling)
            out_feature = jnp.concatenate([mapped, l_features[0]], axis=-1)
        else:
            out_feature = l_features[0]

        if self.transform_output:
            out_feature = jnp.concatenate([out_feature, xyz], axis=-1)
            act = get_activation(self.activation_name)
            if self.config["bn_first"]:
                out = self.head_conv_out(act(out_feature))
            else:
                h = self.head_conv1(out_feature)
                if self.bn:
                    h = self.head_norm(h)
                out = self.head_conv_out(act(h))
        else:
            out = out_feature

        if self.concate_partial:
            out = out[:, :n_out]
        return out
