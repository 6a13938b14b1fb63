"""PVCNN2 point-voxel denoiser — the reference's alternative backbone
(`models/pvd/model/pvcnn_completion.py:170-253`, modules under
`models/pvd/modules/`), selectable as `network_type: 'pvd'` in the train
drivers (a dormant option in the reference — `PVCNN2` is never imported there,
SURVEY.md §2.2).

Architecture: SA stages of [PVConv blocks -> PointNet SA (FPS + ball query +
max pool)], optional 1-D global attention at the bottleneck, FP stages of
[3-NN interpolation FP -> PVConv blocks], and a classifier head.  PVConv fuses
a voxel branch (avg-voxelize -> two 3x3x3 convs with GroupNorm/Swish
[/attention] [/SE] -> trilinear devoxelize) with a per-point MLP.

Faithful simplification: the reference threads the timestep embedding through
grouping/pooling/interpolation, but since it is constant across points of a
cloud, max-pooling or interpolating it returns the same vector — so we simply
re-broadcast it at each stage (mathematically identical).  The reference's FP
attention flag always evaluates False (`pvcnn_completion.py:152` compares
against the just-created 1-element list), which we reproduce by omitting FP
attention.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slide_tpu.nn import precision as mp

from slide_tpu.nn.layers import swish, torch_kernel_init
from slide_tpu.nn.neighborhood import query_and_group
from slide_tpu.ops import (furthest_point_sample, gather_points, three_nn,
                           three_interpolate, avg_voxelize,
                           trilinear_devoxelize,
                           normalize_coords_for_voxelization)
from slide_tpu.ops.grouping import interp_weights_from_dists


class PVSharedMLP(nn.Module):
    """Conv1d + GroupNorm(8) + Swish stack (`modules/shared_mlp.py:11-38`)."""

    out_channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, oc in enumerate(self.out_channels):
            x = mp.Dense(oc, kernel_init=torch_kernel_init, name=f"conv_{i}")(x)
            x = mp.GroupNorm(num_groups=8, epsilon=1e-5, name=f"norm_{i}")(x)
            x = swish(x)
        return x


class VoxelAttention(nn.Module):
    """qkv self-attention over flattened voxels/points with residual +
    GroupNorm + swish (`modules/pvconv.py:16-62`).  Unlike the degenerate
    neighborhood GlobalAttention, this one is a real attention."""

    channels: int

    @nn.compact
    def __call__(self, x):
        # x: (B, M, C) flattened positions
        q = mp.Dense(self.channels, kernel_init=torch_kernel_init, name="q")(x)
        k = mp.Dense(self.channels, kernel_init=torch_kernel_init, name="k")(x)
        v = mp.Dense(self.channels, kernel_init=torch_kernel_init, name="v")(x)
        w = nn.softmax(jnp.einsum("bmc,bnc->bmn", q, k), axis=-1)
        h = jnp.einsum("bmn,bnc->bmc", w, v)
        h = mp.Dense(self.channels, kernel_init=torch_kernel_init, name="out")(h)
        x = h + x
        x = mp.GroupNorm(num_groups=8, epsilon=1e-5, name="norm")(x)
        return swish(x)


class SE3d(nn.Module):
    """Squeeze-excitation over the voxel grid (`modules/se.py:8-19`)."""

    channels: int
    use_relu: bool = True

    @nn.compact
    def __call__(self, grid):
        # grid: (B, R, R, R, C)
        s = jnp.mean(grid, axis=(1, 2, 3))
        s = mp.Dense(self.channels // 4, kernel_init=torch_kernel_init)(s)
        s = nn.relu(s) if self.use_relu else swish(s)
        s = jax.nn.sigmoid(mp.Dense(self.channels, kernel_init=torch_kernel_init)(s))
        return grid * s[:, None, None, None, :]


class PVConv(nn.Module):
    """Point-voxel convolution (`modules/pvconv.py:64-98`)."""

    out_channels: int
    resolution: int
    attention: bool = False
    with_se: bool = False
    dropout: Optional[float] = 0.1

    @nn.compact
    def __call__(self, features, coords, deterministic: bool = True):
        # features (B, N, C), coords (B, N, 3)
        vox_coords = normalize_coords_for_voxelization(coords, self.resolution)
        grid = avg_voxelize(features, vox_coords, self.resolution)
        grid = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                       kernel_init=torch_kernel_init, name="vconv_1")(grid)
        grid = mp.GroupNorm(num_groups=8, epsilon=1e-5, name="vnorm_1")(grid)
        grid = swish(grid)
        if self.dropout is not None:
            grid = nn.Dropout(self.dropout, deterministic=deterministic)(grid)
        grid = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                       kernel_init=torch_kernel_init, name="vconv_2")(grid)
        grid = mp.GroupNorm(num_groups=8, epsilon=1e-5, name="vnorm_2")(grid)
        if self.attention:
            b, r = grid.shape[0], grid.shape[1]
            flat = grid.reshape(b, r ** 3, self.out_channels)
            grid = VoxelAttention(self.out_channels, name="attention")(flat)
            grid = grid.reshape(b, r, r, r, self.out_channels)
        else:
            grid = swish(grid)
        if self.with_se:
            grid = SE3d(self.out_channels, name="se")(grid)
        voxel_feats = trilinear_devoxelize(grid, vox_coords)
        point_feats = PVSharedMLP((self.out_channels,), name="point_features")(features)
        return voxel_feats + point_feats


class PVCNN2(nn.Module):
    """The PVD completion-style wrapper (`model_forward.py:17-52`): the noisy
    cloud is concatenated with the condition cloud, run through PVCNN2Base,
    and the output cropped back to the noisy part.

    out_dim: output channels (the reference's `num_classes`).
    """

    out_dim: int = 3
    embed_dim: int = 64
    use_att: bool = True
    dropout: float = 0.1
    extra_feature_channels: int = 0
    sa_blocks: Tuple = (
        ((32, 2, 32), (1024, 0.1, 32, (32, 64))),
        ((64, 3, 16), (256, 0.2, 32, (64, 128))),
        ((128, 3, 8), (64, 0.4, 32, (128, 256))),
        (None, (16, 0.8, 32, (256, 256, 512))),
    )
    fp_blocks: Tuple = (
        ((256, 256), (256, 3, 8)),
        ((256, 256), (256, 3, 8)),
        ((256, 128), (128, 2, 16)),
        ((128, 128, 64), (64, 2, 32)),
    )

    def _t_embed(self, ts):
        """(B,) steps -> (B, embed_dim); broadcast per stage by the caller.
        (Reference threads the broadcast through pooling/interpolation, which
        is the identity for a constant — see module docstring.)"""
        half = self.embed_dim // 2
        freqs = jnp.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
        ang = ts.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
        emb = mp.Dense(self.embed_dim, kernel_init=torch_kernel_init,
                       name="embedf_1")(emb)
        emb = jax.nn.leaky_relu(emb, negative_slope=0.1)
        emb = mp.Dense(self.embed_dim, kernel_init=torch_kernel_init,
                       name="embedf_2")(emb)
        return emb

    @nn.compact
    def __call__(self, pointcloud, condition=None, ts=None, label=None,
                 deterministic: bool = True):
        b, n1, _ = pointcloud.shape
        x = pointcloud if condition is None else \
            jnp.concatenate([pointcloud, condition], axis=1)
        coords = x[..., :3]
        features = x  # coords are the features at level 0 (in_channels = 3 + extra)
        if ts is None:
            ts = jnp.zeros((b,), jnp.int32)
        temb_vec = self._t_embed(ts)          # (B, embed_dim)

        def temb_at(n):
            return jnp.broadcast_to(temb_vec[:, None, :], (b, n, self.embed_dim))

        coords_list, feats_list = [], []
        sa_c = 0
        for i, (conv_cfg, sa_cfg) in enumerate(self.sa_blocks):
            feats_list.append(features)
            coords_list.append(coords)
            n = coords.shape[1]
            h = features if i == 0 else jnp.concatenate(
                [features, temb_at(n)], axis=-1)
            if conv_cfg is not None:
                out_c, num_blocks, vres = conv_cfg
                # the reference keeps only the FIRST conv block for stages
                # beyond the first (`pvcnn_completion.py:97-101`: the
                # `elif k==0` guard drops p>0 once c>0)
                n_blocks = num_blocks if i == 0 else 1
                for p in range(n_blocks):
                    attention = (sa_c + 1) % 2 == 0 and sa_c > 0 and \
                        self.use_att and p == 0
                    h = PVConv(out_c, vres, attention=attention,
                               with_se=not attention, dropout=self.dropout,
                               name=f"sa{i}_pv{p}")(h, coords,
                                                    deterministic=deterministic)
            num_centers, radius, num_neighbors, mlp_out = sa_cfg
            if num_centers is None:
                # PointNetAModule: global pool (`modules/pointnet.py:11-47`)
                g = jnp.concatenate([h, coords], axis=-1)
                g = PVSharedMLP(tuple(mlp_out), name=f"sa{i}_amod")(g)
                features = jnp.max(g, axis=1, keepdims=True)
                coords = jnp.zeros((b, 1, 3), coords.dtype)
            else:
                idx = furthest_point_sample(coords, num_centers)
                centers = gather_points(coords, idx)
                grouped, counts = query_and_group(
                    coords, centers, h, nsample=num_neighbors, radius=radius,
                    neighbor_def="radius", use_xyz=True, subset=True)
                g = PVSharedMLP(tuple(mlp_out), name=f"sa{i}_samod")(grouped)
                features = jnp.max(g, axis=2)
                coords = centers
            sa_c += 1

        # extra features of the FULL concatenated cloud (reference
        # `inputs[:, 3:, :]`, pvcnn_completion.py:232)
        feats_list[0] = x[..., 3:] if x.shape[-1] > 3 else \
            jnp.zeros(x.shape[:2] + (0,), x.dtype)

        if self.use_att:
            features = VoxelAttention(features.shape[-1], name="global_att")(features)

        for fp_idx, (fp_cfg, conv_cfg) in enumerate(self.fp_blocks):
            jump_coords = coords_list[-1 - fp_idx]
            jump_feats = feats_list[-1 - fp_idx]
            src = jnp.concatenate([features, temb_at(features.shape[1])], axis=-1)
            dist, idx3 = three_nn(jump_coords, coords)
            w = interp_weights_from_dists(dist)
            interp = three_interpolate(src, idx3, w)
            if jump_feats.shape[-1] > 0:
                interp = jnp.concatenate([interp, jump_feats], axis=-1)
            features = PVSharedMLP(tuple(fp_cfg), name=f"fp{fp_idx}_mlp")(interp)
            coords = jump_coords
            if conv_cfg is not None:
                out_c, num_blocks, vres = conv_cfg
                for p in range(num_blocks):
                    features = PVConv(out_c, vres, attention=False,
                                      with_se=True, dropout=self.dropout,
                                      name=f"fp{fp_idx}_pv{p}")(
                        features, coords, deterministic=deterministic)

        h = PVSharedMLP((128,), name="cls_mlp")(features)
        h = nn.Dropout(0.5, deterministic=deterministic)(h)
        out = mp.Dense(self.out_dim, kernel_init=torch_kernel_init,
                       name="cls_out")(h)
        return out[:, :n1]
