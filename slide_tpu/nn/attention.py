"""Neighborhood attention pooling and the (degenerate) global attention of the
reference (`pointnet2_ops/attention.py:35-154`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from slide_tpu.nn import precision as mp

from slide_tpu.nn.layers import TailGroupNorm, torch_kernel_init
from slide_tpu.ops import count_to_mask


class AttentionPool(nn.Module):
    """Learned per-channel softmax pooling over the K neighbor slots — the
    reference's `AttentionModule` (`attention.py:35-96`).

    query `feat` (B, M, C_in1) -> conv to C1; key `grouped_feat`
    (B, M, K, C_in2) -> conv to C2; concat -> weight stack -> per-channel
    scores (B, M, K, C_out); masked softmax over K; value = (optionally
    transformed) `grouped_feat_out`; output (B, M, C_out).
    """

    c_in1: int
    c_in2: int
    c_out: int
    attention_bn: bool = True
    transform_grouped_feat_out: bool = True
    last_activation: bool = True

    @nn.compact
    def __call__(self, feat, grouped_feat, grouped_feat_out, count):
        c1 = max(self.c_in1, 32)
        c2 = max(self.c_in2, 32)
        k = grouped_feat.shape[-2]

        f1 = mp.Dense(c1, kernel_init=torch_kernel_init, name="feat_conv")(feat)
        f1 = jnp.broadcast_to(f1[:, :, None, :], f1.shape[:2] + (k, c1))
        g1 = mp.Dense(c2, kernel_init=torch_kernel_init, name="grouped_feat_conv")(grouped_feat)
        total = jnp.concatenate([f1, g1], axis=-1)          # (B, M, K, c1+c2)

        inter = min(c1 + c2, self.c_out)
        # weight stack: [relu, (GN), conv -> inter, relu, (GN), conv -> C_out]
        h = nn.relu(total)
        if self.attention_bn:
            h = TailGroupNorm(min(32, c1 + c2), c1 + c2, name="w_norm_1")(h)
        h = mp.Dense(inter, kernel_init=torch_kernel_init, name="w_conv_1")(h)
        h = nn.relu(h)
        if self.attention_bn:
            h = TailGroupNorm(min(32, inter), inter, name="w_norm_2")(h)
        scores = mp.Dense(self.c_out, kernel_init=torch_kernel_init, name="w_conv_2")(h)

        if not (isinstance(count, str) and count == "all"):
            mask = count_to_mask(jnp.maximum(count, 1), k)[..., None]  # (B, M, K, 1)
            scores = jnp.where(mask, scores, -1e9)
        weight = nn.softmax(scores, axis=-2)                # softmax over K

        value = grouped_feat_out
        if self.transform_grouped_feat_out:
            value = mp.Dense(self.c_out, kernel_init=torch_kernel_init,
                             name="feat_out_conv")(value)
            if self.last_activation:
                if self.attention_bn:
                    value = TailGroupNorm(min(32, self.c_out), self.c_out,
                                          name="feat_out_norm")(value)
                value = nn.relu(value)
        return jnp.sum(value * weight, axis=-2)


class GlobalAttention(nn.Module):
    """The reference's `GlobalAttentionModule` (`attention.py:98-154`).

    NOTE (behavioral parity): the reference's output reduces EXACTLY to its
    value path — at `attention.py:153` `value.unsqueeze(-1)` broadcasts the
    value over the softmax axis, so `(value * weight).sum(-1) == value`
    (softmax weights sum to 1).  We reproduce that behavior without paying the
    O(N^2 C) score computation; the key/query/score parameters are still
    created so parameter structure (and counts) match.  Set
    `use_intended_attention=True` to get the attention the reference
    presumably intended (value gathered at the softmax index).
    """

    c: int
    additional_dim: int = 0
    attention_bn: bool = True
    last_activation: bool = True
    use_intended_attention: bool = False

    @nn.compact
    def __call__(self, feat):
        # feat: (B, N, C + additional_dim)
        key = mp.Dense(self.c, kernel_init=torch_kernel_init, name="key_conv")(feat)
        query = mp.Dense(self.c, kernel_init=torch_kernel_init, name="query_conv")(feat)
        value = mp.Dense(self.c, kernel_init=torch_kernel_init, name="value_conv")(feat)
        if self.last_activation:
            if self.attention_bn:
                value = TailGroupNorm(min(32, self.c), self.c, name="value_norm")(value)
            value = nn.relu(value)

        if not self.use_intended_attention:
            # Reference behavior: attention output == value (see class note).
            # Materialize the weight-stack parameters only during init
            # (structural parity at zero steady-state cost).
            if self.is_initializing():
                _ = self._weight_stack(jnp.zeros(feat.shape[:2] + (2 * self.c,),
                                                 feat.dtype))
            return value

        n = feat.shape[1]
        q = jnp.broadcast_to(query[:, :, None, :], query.shape[:2] + (n, self.c))
        kk = jnp.broadcast_to(key[:, None, :, :], (key.shape[0], n) + key.shape[1:])
        score = self._weight_stack(jnp.concatenate([q, kk], axis=-1))  # (B,N,N,C)
        w = nn.softmax(score, axis=2)
        return jnp.einsum("bijc,bjc->bic", w, value)

    def _weight_stack(self, pair):
        h = nn.relu(pair)
        if self.attention_bn:
            h = TailGroupNorm(min(32, 2 * self.c), 2 * self.c, name="w_norm_1")(h)
        h = mp.Dense(self.c, kernel_init=torch_kernel_init, name="w_conv_1")(h)
        h = nn.relu(h)
        if self.attention_bn:
            h = TailGroupNorm(min(32, self.c), self.c, name="w_norm_2")(h)
        return mp.Dense(self.c, kernel_init=torch_kernel_init, name="w_conv_2")(h)
