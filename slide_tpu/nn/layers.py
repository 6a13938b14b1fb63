"""Core layers: tail-passthrough GroupNorm, shared MLPs, and the injection MLP
(the reference's `Mlp_plus_t_emb`, `pointnet2_modules.py:71-176`).

Channels-last: a torch `Conv2d(kernel_size=1)` over (B, C, M, K) becomes a
`Dense` over the last axis of (B, M, K, C).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slide_tpu.nn import precision as mp

# Torch's Conv/Linear default init (kaiming_uniform with a=sqrt(5)) is
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform).
# We match the distribution so training dynamics are comparable; biases are
# zero-init (torch uses the same uniform — immaterial behind the group norms).
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def swish(x):
    return x * jax.nn.sigmoid(x)


_ACTIVATIONS = {"relu": jax.nn.relu, "swish": swish}


def get_activation(name: str):
    if name not in _ACTIVATIONS:
        raise ValueError(f"activation must be one of {list(_ACTIVATIONS)}, got {name}")
    return _ACTIVATIONS[name]


def calc_t_emb(ts: jax.Array, t_dim: int) -> jax.Array:
    """Sinusoidal diffusion-step embedding (`pointnet2/util.py:301-318`).

    ts: (B,) step indices (any numeric dtype). Returns (B, t_dim) =
    [sin(t * f_0..f_{h-1}), cos(t * f_0..f_{h-1})] with
    f_i = exp(-i * ln(10000)/(h-1)), h = t_dim//2.
    """
    if t_dim % 2 != 0:
        raise ValueError("t_dim must be even")
    half = t_dim // 2
    freqs = jnp.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    ang = ts.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)


class TailGroupNorm(nn.Module):
    """GroupNorm that normalizes only the first `channels - channels % num_groups`
    channels and passes the rest through untouched — the reference's
    `MyGroupNorm` (`pointnet2_modules.py:24-42`), whose tail carries raw
    coordinate channels that must not be normalized.

    `channels` is the channel count this norm was BUILT for (spec-derived);
    inputs must have exactly that many channels.
    """

    num_groups: int
    channels: int

    @nn.compact
    def __call__(self, x):
        c_norm = self.channels - self.channels % self.num_groups
        if x.shape[-1] != self.channels:
            raise ValueError(
                f"TailGroupNorm built for {self.channels} channels, got {x.shape[-1]}")
        gn = mp.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, name="group_norm")
        if c_norm == self.channels:
            return gn(x)
        return jnp.concatenate([gn(x[..., :c_norm]), x[..., c_norm:]], axis=-1)


class SharedMLP(nn.Module):
    """Sequence of 1x1 convs with GroupNorm + activation, matching
    `build_shared_mlp` (`pointnet2_modules.py:44-69`).

    dims: full channel spec including the input dim, e.g. (Cin, h, Cout).
    bn_first=True puts [norm, act, conv] per layer (normalizing the layer's
    INPUT channels); otherwise [conv, norm, act].
    `truncate_last` cuts the final layer to a bare conv (used by PNet's
    `remove_last_activation`, `models/pnet.py:15-25`).
    """

    dims: Sequence[int]
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    activation: str = "relu"
    truncate_last: bool = False

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        n = len(self.dims) - 1
        for i in range(1, len(self.dims)):
            last = i == n
            if self.bn_first:
                if self.bn:
                    x = TailGroupNorm(min(32, self.dims[i - 1]), self.dims[i - 1],
                                      name=f"norm_{i}")(x)
                x = act(x)
                x = mp.Dense(self.dims[i], use_bias=self.bias,
                             kernel_init=torch_kernel_init, name=f"conv_{i}")(x)
            else:
                x = mp.Dense(self.dims[i], use_bias=self.bias,
                             kernel_init=torch_kernel_init, name=f"conv_{i}")(x)
                if last and self.truncate_last:
                    continue
                if self.bn:
                    x = TailGroupNorm(min(32, self.dims[i]), self.dims[i],
                                      name=f"norm_{i}")(x)
                x = act(x)
        return x


def _broadcast_emb(emb: jax.Array, target_ndim: int) -> jax.Array:
    """(B, C) embedding -> (B, 1, ..., 1, C) to add onto rank-`target_ndim` h."""
    return emb.reshape(emb.shape[0], *([1] * (target_ndim - 2)), emb.shape[-1])


class InjectionMLP(nn.Module):
    """Shared MLP with timestep / condition / second-condition injection and a
    residual connection — the reference's `Mlp_plus_t_emb`
    (`pointnet2_modules.py:71-176`).

    Structure on spec (s0, s1, s2, ..., sn):
      [first_conv: Dense(first_conv_in -> s0)]
      h = SharedMLP(s0 -> s1);        h += Dense(t_emb -> s1)   if include_t
      h = SharedMLP(s1 -> s2);        h += Dense(cond -> s2)    if include_condition
      h = SharedMLP(s2 -> ... -> sn)  if len > 3
      h += Dense(cond2 -> sn)                                   if include_second_condition
      h += (feature if s0 == sn else Dense(feature -> sn))      if res_connect
    """

    mlp_spec: Sequence[int]
    bn: bool = True
    include_t: bool = False
    bn_first: bool = False
    bias: bool = False
    first_conv: bool = False
    first_conv_in_channel: int = 0
    res_connect: bool = False
    include_condition: bool = False
    include_second_condition: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, feature, t_emb=None, condition_emb=None, second_condition_emb=None):
        spec = list(self.mlp_spec)
        if len(spec) < 3:
            raise ValueError("mlp_spec must have at least 3 entries")
        if self.include_second_condition and len(spec) < 4:
            raise ValueError("second condition requires mlp_spec of length >= 4")

        if self.first_conv:
            feature = mp.Dense(spec[0], use_bias=self.bias,
                               kernel_init=torch_kernel_init, name="first_conv")(feature)

        mlp_kw = dict(bn=self.bn, bn_first=self.bn_first, bias=self.bias,
                      activation=self.activation)
        h = SharedMLP(spec[0:2], name="first_mlp", **mlp_kw)(feature)

        if self.include_t:
            if t_emb is None:
                raise ValueError("include_t module requires t_emb")
            t1 = mp.Dense(spec[1], kernel_init=torch_kernel_init, name="fc_t")(t_emb)
            h = h + _broadcast_emb(t1, h.ndim)
        elif t_emb is not None:
            raise ValueError("t_emb given to a module without include_t")

        h = SharedMLP(spec[1:3], name="second_mlp", **mlp_kw)(h)

        if self.include_condition:
            if condition_emb is None:
                raise ValueError("include_condition module requires condition_emb")
            c1 = mp.Dense(spec[2], kernel_init=torch_kernel_init,
                          name="fc_condition")(condition_emb)
            h = h + _broadcast_emb(c1, h.ndim)
        elif condition_emb is not None:
            raise ValueError("condition_emb given to a module without include_condition")

        if len(spec) > 3:
            h = SharedMLP(spec[2:], name="rest_mlp", **mlp_kw)(h)

        if self.include_second_condition:
            if second_condition_emb is None:
                raise ValueError("include_second_condition module requires second_condition_emb")
            c2 = mp.Dense(spec[-1], kernel_init=torch_kernel_init,
                          name="fc_second_condition")(second_condition_emb)
            h = h + _broadcast_emb(c2, h.ndim)
        elif second_condition_emb is not None:
            raise ValueError("second_condition_emb given without include_second_condition")

        if self.res_connect:
            if spec[0] == spec[-1]:
                h = h + feature
            else:
                h = h + mp.Dense(spec[-1], use_bias=self.bias,
                                 kernel_init=torch_kernel_init, name="res_conv")(feature)
        return h


class TimestepEmbedder(nn.Module):
    """Network-level t embedding: sinusoidal -> fc -> swish -> fc -> swish,
    output dim 4*t_dim (`pointnet2_ssg_sem.py:193-196, 262-267`)."""

    t_dim: int

    @nn.compact
    def __call__(self, ts):
        t = calc_t_emb(ts, self.t_dim)
        t = mp.Dense(4 * self.t_dim, kernel_init=torch_kernel_init, name="fc_t1")(t)
        t = swish(t)
        t = mp.Dense(4 * self.t_dim, kernel_init=torch_kernel_init, name="fc_t2")(t)
        return swish(t)
