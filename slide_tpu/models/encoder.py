"""SA-only PointNet++ feature extractor — the reference's `PointNet2Encoder`
(`pointnet2/models/pointnet2_feature_extractor.py:27-218`).

Returns (last-level features, list of per-level xyz, list of per-level
features).  NOTE a reproduced reference behavior: with `transform_output` the
reference computes the 1x1-conv output and then DISCARDS it
(`pointnet2_feature_extractor.py:208-210` overwrites `out`) — so the conv's
parameters exist but the returned features are always the raw last SA level.
We create the layer for structural parity but skip the dead compute.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from slide_tpu.nn import precision as mp

from slide_tpu.models.denoiser import (_build_sa_stack, positional_encode,
                                       pos_encode_out_dim)
from slide_tpu.nn.layers import TimestepEmbedder, torch_kernel_init
from slide_tpu.nn.pnet import PNet2Stage


class PointNetEncoder(nn.Module):
    config: Mapping[str, Any]

    def setup(self):
        hp = self.config
        self.include_t = hp["include_t"]
        self.include_class_condition = hp.get("include_class_condition", False)
        self.include_global_feature = hp.get("include_global_feature", False)
        self.attach_position = hp["attach_position_to_input_feature"]
        self.use_position_encoding = hp.get("use_position_encoding", False)
        self.pos_multires = hp.get("position_encoding_multires", 0)
        self.pooling = hp.get("pooling", "max")
        self.activation_name = hp.get("activation", "relu")
        self.bn = hp.get("bn", True)

        in_fea_dim = hp["in_fea_dim"]
        if self.attach_position:
            in_fea_dim += 3
        if self.use_position_encoding:
            in_fea_dim += pos_encode_out_dim(self.pos_multires)
        self.in_fea_dim_full = in_fea_dim

        if self.include_class_condition:
            self.class_emb = nn.Embed(hp["num_class"], hp["class_condition_dim"],
                                      embedding_init=nn.initializers.normal(1.0))
        if self.include_t:
            self.t_embedder = TimestepEmbedder(hp["t_dim"])

        self.global_feature_dim = None
        if self.include_global_feature:
            pnet_arch = [list(a) for a in hp["pnet_global_feature_architecture"]]
            # the reference force-corrects the pnet input dim to in_fea_dim
            # (pointnet2_feature_extractor.py:73-76)
            pnet_arch[0][0] = in_fea_dim
            if self.use_position_encoding:
                pnet_arch[0][0] += pos_encode_out_dim(self.pos_multires)
            self.global_feature_dim = pnet_arch[1][-1]
            self.global_pnet = PNet2Stage(
                tuple(pnet_arch[0]), tuple(pnet_arch[1]), bn=self.bn,
                remove_last_activation=hp.get("global_feature_remove_last_activation", True))

        arch = hp["architecture"]
        self.sa_modules = tuple(_build_sa_stack(
            hp, arch["npoint"], arch["radius"], arch["nsample"],
            arch["feature_dim"], arch["mlp_depth"], in_fea_dim, self.include_t,
            self.include_class_condition,
            include_global_feature=self.include_global_feature,
            neighbor_def=arch["neighbor_definition"],
            activation=self.activation_name, bn=self.bn,
            attention_setting=hp.get("attention_setting"),
            global_attention_setting=hp.get("global_attention_setting")))

        # dead-parameter parity: see module docstring
        if hp.get("transform_output", False):
            self.head_conv = mp.Dense(hp["out_dim"], kernel_init=torch_kernel_init)

    def __call__(self, pointcloud, ts=None, label=None):
        pc = pointcloud
        if self.use_position_encoding:
            pc = jnp.concatenate([pc, positional_encode(pc[..., :3], self.pos_multires)],
                                 axis=-1)
        if self.attach_position:
            pc = jnp.concatenate([pc, pc[..., :3]], axis=-1)
        xyz = pc[..., :3]
        features = pc[..., 3:] if pc.shape[-1] > 3 else None

        t_emb = self.t_embedder(ts) if (ts is not None and self.include_t) else None
        class_emb = (self.class_emb(label)
                     if (label is not None and self.include_class_condition) else None)

        if self.include_global_feature:
            # global input = [xyz, raw features (+pos encode)]; its dim equals
            # the corrected pnet input dim (= in_fea_dim_full: the attached +3
            # is accounted for by the leading xyz, pointnet2_feature_extractor.py
            # :73-76, 186-193)
            raw_dim = self.in_fea_dim_full - 3 if self.attach_position \
                else self.in_fea_dim_full
            if raw_dim > 0:
                global_input = jnp.concatenate([xyz, pc[..., 3:3 + raw_dim]],
                                               axis=-1)
            else:
                global_input = xyz
            global_feature = self.global_pnet(global_input)
            condition_emb = global_feature
            second_condition_emb = class_emb if self.include_class_condition else None
        else:
            condition_emb = class_emb if self.include_class_condition else None
            second_condition_emb = None

        l_xyz, l_features = [xyz], [features]
        for sa in self.sa_modules:
            u, f = sa(l_xyz[-1], l_features[-1], t_emb=t_emb,
                      condition_emb=condition_emb,
                      second_condition_emb=second_condition_emb,
                      pooling=self.pooling)
            l_xyz.append(u)
            l_features.append(f)
        if self.config.get("transform_output", False) and self.is_initializing():
            # dead-parameter parity (see module docstring): materialize the
            # discarded head's params without paying for it at runtime
            _ = self.head_conv(l_features[-1])
        return l_features[-1], l_xyz, l_features
