"""Point splitting / upsampling decoder stack:

  point_upsample        — coarse + per-point displacement grids
                          (`models/point_upsample_module.py:4-46`)
  PointUpsampleDecoder  — feature extractor + cross-level FeatureMapModule +
                          fc split head, with optional VAE regularization
                          (`models/point_upsample_decoder.py:24-190`)
  KeypointDecoder       — cascade of PointUpsampleDecoders, threading feature
                          dims (`models/keypoint_decoder.py:7-36`)

RNG: VAE sampling uses the flax rng stream 'gaussian'; the FPS trim of the
upsampled cloud uses stream 'fps' for its random start point (reference
`point_upsample_decoder.py:179` uses random_start_point=True) and falls back
to a deterministic start when the stream is absent (eval).
"""

from __future__ import annotations

import copy
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slide_tpu.nn import precision as mp

from slide_tpu.models.denoiser import ConditionalPointNet2
from slide_tpu.models.encoder import PointNetEncoder
from slide_tpu.nn.distributions import DiagonalGaussian
from slide_tpu.nn.layers import torch_kernel_init
from slide_tpu.nn.modules import FeatureMapModule
from slide_tpu.ops import furthest_point_sample


def point_upsample(coarse: jax.Array, displacement: jax.Array,
                   point_upsample_factor: int, *,
                   include_displacement_center_to_final_output: bool = False,
                   output_scale_factor_value: float = 0.001,
                   first_refine_coarse_points: bool = False) -> jax.Array:
    """Split each coarse point into a grid of displaced points
    (`point_upsample_module.py:4-46`).  coarse (B, N, F), displacement
    (B, N, F*factor[或 +F]) -> (B, N*factor, F)."""
    if not first_refine_coarse_points and include_displacement_center_to_final_output:
        raise ValueError("center output requires first_refine_coarse_points")
    b, n, f = coarse.shape
    if displacement.shape[-1] % f != 0:
        raise ValueError(
            f"displacement channels {displacement.shape[-1]} not divisible by {f}")
    groups = displacement.shape[-1] // f
    grid_scale = 1.0 / np.sqrt(point_upsample_factor)
    if first_refine_coarse_points:
        center_disp = displacement[..., :f]
        grid_disp = displacement[..., f:] * grid_scale
        refined = coarse + center_disp * output_scale_factor_value
        # grid slots = displacement groups minus the center group.  The
        # reference's two call sites pass DIFFERENT factor conventions (the
        # decoder passes the head multiplier, `point_upsample_decoder.py:170`;
        # the SAP refine path passes the raw config factor,
        # `dpsr_evaluation.py:68`) — deriving k from the displacement width
        # reproduces both behaviors where the reference works and fixes the
        # decoder's not-include-center branch where it would crash.
        k = groups - 1
        grid_disp = grid_disp.reshape(b, n, k, f)
    else:
        if groups != point_upsample_factor:
            raise ValueError(
                f"displacement has {groups} groups, expected {point_upsample_factor}")
        grid_disp = (displacement * grid_scale).reshape(b, n, point_upsample_factor, f)
        refined = coarse
    up = refined[:, :, None, :] + grid_disp * output_scale_factor_value
    up = up.reshape(b, -1, f)
    if include_displacement_center_to_final_output:
        up = jnp.concatenate([up, refined], axis=1)
    return up


def _to_mutable(obj):
    """Deep-convert flax-frozen config containers (tuples / frozen dicts)
    back to plain lists / dicts."""
    if isinstance(obj, Mapping):
        return {k: _to_mutable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_mutable(v) for v in obj]
    return obj


def upsample_output_multiplier(upsampling_setting: Mapping) -> int:
    """Effective displacement-grid multiplier
    (`point_upsample_decoder.py:81-89`)."""
    factor = upsampling_setting["point_upsample_factor"]
    if upsampling_setting["first_refine_coarse_points"]:
        factor += 1
        if upsampling_setting["include_displacement_center_to_final_output"]:
            factor -= 1
    else:
        if upsampling_setting["include_displacement_center_to_final_output"]:
            raise ValueError("center output requires first_refine_coarse_points")
    return int(factor)


class PointUpsampleDecoder(nn.Module):
    """One decoder level.  `config` is this level's pointnet_config (e.g.
    decoder_level_1.json); `in_dim` is the previous level's feature dim."""

    config: Mapping[str, Any]
    in_dim: int
    apply_kl_regularization: bool = False

    def setup(self):
        hp = self.config
        arch = hp["architecture"]
        cfg = _to_mutable(hp)   # flax freezes attr containers; we must mutate
        self.is_condition_net = "decoder_feature_dim" in arch
        if self.is_condition_net:
            if self.apply_kl_regularization:
                cfg["architecture"]["decoder_feature_dim"][0] *= 2
            self.feature_extractor = ConditionalPointNet2(cfg)
            self.query_feature_dim = arch["decoder_feature_dim"][0]
        else:
            if self.apply_kl_regularization:
                cfg["architecture"]["feature_dim"][-1] *= 2
            self.feature_extractor = PointNetEncoder(cfg)
            self.query_feature_dim = arch["feature_dim"][-1]

        fm = hp["feature_mapper_setting"]
        out_dim = fm["out_dim"]
        mapper_out = out_dim * 2 if self.apply_kl_regularization else out_dim
        self.feature_mapper = FeatureMapModule(
            mlp_spec=tuple([self.in_dim] + [mapper_out] * fm["mlp_depth"]),
            k=fm["nsample"], radius=fm["radius"],
            neighbor_def=fm["neighbor_definition"],
            use_xyz=hp["model.use_xyz"],
            include_abs_coordinate=hp["include_abs_coordinate"],
            include_center_coordinate=hp.get("include_center_coordinate", False),
            bn=hp["bn"], bn_first=hp["bn_first"], bias=hp["bias"],
            res_connect=hp["res_connect"], first_conv=False,
            activation=hp.get("activation", "relu"),
            attention_setting=hp["attention_setting"],
            query_feature_dim=self.query_feature_dim)

        ups = hp["upsampling_setting"]
        self.point_upsample_factor = upsample_output_multiplier(ups)
        self.upsampling_setting = ups
        self.out_dim = hp["out_dim"]
        self.in_position_and_normal_dim = hp.get("in_position_and_normal_dim",
                                                 hp["out_dim"])
        self.fc_layer = mp.Dense(int(self.out_dim * self.point_upsample_factor),
                                 kernel_init=torch_kernel_init, name="fc_layer")

    def _sample(self, parameters, sample_posterior):
        posterior = DiagonalGaussian.from_parameters(parameters)
        if sample_posterior:
            z = posterior.sample(self.make_rng("gaussian"))
        else:
            z = posterior.mode()
        return z, posterior

    def propagate_feature(self, xyz, features, new_xyz, ts=None, label=None,
                          sample_posterior: bool = True):
        """Extract features at new_xyz (queries), map features from the
        previous level (xyz, features) onto them, concat
        (`point_upsample_decoder.py:106-147`).  Returns (final_feature, kl)."""
        if self.is_condition_net:
            out = self.feature_extractor(new_xyz, ts=ts, label=label)
        else:
            out, _, _ = self.feature_extractor(new_xyz, ts=ts, label=label)
        kl = None
        if self.apply_kl_regularization:
            out, out_post = self._sample(out, sample_posterior)
        mapped = self.feature_mapper(xyz, features, new_xyz[..., :3],
                                     features_at_new_xyz=out, subset=False)
        if self.apply_kl_regularization:
            mapped, mapped_post = self._sample(mapped, sample_posterior)
            kl = out_post.kl() + mapped_post.kl()
        return jnp.concatenate([out, mapped], axis=-1), kl

    def upsample_points(self, final_feature, new_xyz):
        """fc -> point_upsample -> FPS trim to num_output_points
        (`point_upsample_decoder.py:149-182`)."""
        splitted = self.fc_layer(jnp.concatenate([final_feature, new_xyz], axis=-1))
        coarse = new_xyz[..., : self.in_position_and_normal_dim]
        if self.in_position_and_normal_dim < self.out_dim:
            pad = jnp.zeros(coarse.shape[:2]
                            + (self.out_dim - self.in_position_and_normal_dim,),
                            coarse.dtype)
            coarse = jnp.concatenate([coarse, pad], axis=-1)
        ups = self.upsampling_setting
        up = point_upsample(
            coarse, splitted, self.point_upsample_factor,
            include_displacement_center_to_final_output=ups[
                "include_displacement_center_to_final_output"],
            output_scale_factor_value=ups["output_scale_factor"],
            first_refine_coarse_points=ups["first_refine_coarse_points"])
        num_out = ups["num_output_points"]
        if up.shape[1] < num_out:
            raise ValueError(f"upsampled {up.shape[1]} < num_output_points {num_out}")
        if up.shape[1] > num_out:
            if self.has_rng("fps"):
                start = jax.random.randint(self.make_rng("fps"),
                                           (up.shape[0],), 0, up.shape[1])
            else:
                start = 0
            idx = furthest_point_sample(up[..., :3], num_out, start_idx=start)
            up = jnp.take_along_axis(up, idx[..., None], axis=1)
        return up

    def __call__(self, xyz, features, new_xyz, ts=None, label=None,
                 sample_posterior: bool = True):
        final_feature, kl = self.propagate_feature(xyz, features, new_xyz,
                                                   ts=ts, label=label,
                                                   sample_posterior=sample_posterior)
        upsampled = self.upsample_points(final_feature, new_xyz)
        if self.apply_kl_regularization:
            return final_feature, upsampled, kl
        return final_feature, upsampled


def decoder_feature_out_dim(level_config: Mapping) -> int:
    """Feature dim a level hands to the next (`keypoint_decoder.py:15-22`)."""
    arch = level_config["architecture"]
    base = arch["decoder_feature_dim"][0] if "decoder_feature_dim" in arch \
        else arch["feature_dim"][-1]
    return base + level_config["feature_mapper_setting"]["out_dim"]


class KeypointDecoder(nn.Module):
    """Cascade of PointUpsampleDecoders (`keypoint_decoder.py:7-36`)."""

    config_list: Sequence[Mapping[str, Any]]
    feature_dim: int

    def setup(self):
        decoders = []
        fdim = self.feature_dim
        for cfg in self.config_list:
            decoders.append(PointUpsampleDecoder(cfg, in_dim=fdim))
            fdim = decoder_feature_out_dim(cfg)
        self.decoders = tuple(decoders)

    def __call__(self, xyz0, features0, xyz1, ts=None, label=None):
        l_xyzs = [xyz0, xyz1]
        l_features = [features0]
        for i, decoder in enumerate(self.decoders):
            new_feature, new_xyz = decoder(l_xyzs[i][..., :3], l_features[i],
                                           l_xyzs[i + 1], ts=ts, label=label)
            l_xyzs.append(new_xyz)
            l_features.append(new_feature)
        return l_xyzs
