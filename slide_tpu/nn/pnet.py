"""Two-stage global PointNet (`models/pnet.py:7-40`): per-point MLP ->
global max-pool -> concat global onto each point -> second MLP -> global
max-pool -> global feature vector."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from slide_tpu.nn.layers import SharedMLP


class PNet2Stage(nn.Module):
    """mlp1/mlp2 are full channel specs including input dim, e.g.
    mlp1=(3+C, 128, 256) and mlp2=(512, 1024); internally the second stage
    runs on (2*mlp1[-1],) + mlp2, matching `pnet.py:18`.

    remove_last_activation truncates each stage's final layer to a bare conv
    (`pnet.py:15-25`).  All convs have bias (the reference builds
    Mlp_plus_t_emb with bias=True here).
    """

    mlp1: Sequence[int]
    mlp2: Sequence[int]
    bn: bool = True
    remove_last_activation: bool = True

    @nn.compact
    def __call__(self, x):
        # x: (B, N, mlp1[0])
        if len(self.mlp1) != 3:
            raise ValueError("PNet2Stage expects a 3-entry mlp1 spec (in, h, out)")
        spec2 = (2 * self.mlp1[-1],) + tuple(self.mlp2)
        if len(spec2) != 3:
            raise ValueError("PNet2Stage expects a 2-entry mlp2 spec (h, out)")
        h = SharedMLP(self.mlp1, bn=self.bn, bias=True,
                      truncate_last=self.remove_last_activation, name="mlp1")(x)
        g = jnp.max(h, axis=1, keepdims=True)               # (B, 1, C)
        h = jnp.concatenate([h, jnp.broadcast_to(g, h.shape)], axis=-1)
        h = SharedMLP(spec2, bn=self.bn, bias=True,
                      truncate_last=self.remove_last_activation, name="mlp2")(h)
        return jnp.max(h, axis=1)                           # (B, mlp2[-1])
