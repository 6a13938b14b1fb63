"""Pointwise (ConcatSquash) denoiser — the reference's alternative backbone
(`pointnet2/models/pointwise_net.py:8-128`): six ConcatSquashLinear layers
conditioned on [beta_t, sin(beta_t), cos(beta_t), global PNet feature of the
condition cloud], optional residual output.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slide_tpu.nn import precision as mp

from slide_tpu.nn.layers import torch_kernel_init
from slide_tpu.nn.pnet import PNet2Stage


def variance_schedule(num_steps: int, beta_1: float, beta_t: float):
    """The PointwiseNet's own 1-indexed schedule with a zero-padded t=0 slot
    (`pointwise_net.py:8-48`).  Returns dict of (T+1,) arrays."""
    betas = np.concatenate([[0.0], np.linspace(beta_1, beta_t, num_steps)])
    alphas = 1.0 - betas
    alpha_bars = np.exp(np.cumsum(np.log(alphas)))
    sigmas_flex = np.sqrt(betas)
    sigmas_inflex = np.zeros_like(betas)
    sigmas_inflex[1:] = np.sqrt(
        (1 - alpha_bars[:-1]) / (1 - alpha_bars[1:]) * betas[1:])
    return {"betas": jnp.asarray(betas, jnp.float32),
            "alphas": jnp.asarray(alphas, jnp.float32),
            "alpha_bars": jnp.asarray(alpha_bars, jnp.float32),
            "sigmas_flex": jnp.asarray(sigmas_flex, jnp.float32),
            "sigmas_inflex": jnp.asarray(sigmas_inflex, jnp.float32)}


class ConcatSquashLinear(nn.Module):
    """(`pointwise_net.py:50-64`): out = W x * sigmoid(gate(ctx)) + bias(ctx)."""

    dim_out: int

    @nn.compact
    def __call__(self, ctx, x):
        h = mp.Dense(self.dim_out, kernel_init=torch_kernel_init, name="layer")(x)
        gate = jax.nn.sigmoid(
            mp.Dense(self.dim_out, kernel_init=torch_kernel_init,
                     name="hyper_gate")(ctx))
        bias = mp.Dense(self.dim_out, use_bias=False,
                        kernel_init=torch_kernel_init, name="hyper_bias")(ctx)
        return h * gate + bias


class PointwiseNet(nn.Module):
    residual: bool = True
    num_steps: int = 1000
    beta_1: float = 1e-4
    beta_T: float = 0.05
    mode: str = "linear"
    pnet_global_feature_architecture: Sequence[Sequence[int]] = (
        (3, 128, 256), (512, 1024))
    global_feature_remove_last_activation: bool = False

    def setup(self):
        if self.mode != "linear":
            raise ValueError("only the linear schedule is supported")
        self.var = variance_schedule(self.num_steps, self.beta_1, self.beta_T)
        arch = [tuple(a) for a in self.pnet_global_feature_architecture]
        self.global_pnet = PNet2Stage(
            arch[0], arch[1], bn=False,
            remove_last_activation=self.global_feature_remove_last_activation)
        dims = (128, 256, 512, 256, 128, 3)
        self.layers = tuple(ConcatSquashLinear(d) for d in dims)

    def __call__(self, x, condition=None, ts=None, label=None, cond_cache=None):
        """x (B, N, 3) noisy cloud; condition (B, M, d) condition cloud; ts
        (B,) 1-indexed steps into this net's own padded schedule."""
        b = x.shape[0]
        if ts is None:
            ts = jnp.zeros((b,), jnp.int32)
        beta = self.var["betas"][ts.astype(jnp.int32)].reshape(b, 1, 1)
        context = self.global_pnet(condition).reshape(b, 1, -1)
        time_emb = jnp.concatenate([beta, jnp.sin(beta), jnp.cos(beta)], axis=-1)
        ctx = jnp.concatenate([time_emb, context], axis=-1)   # (B, 1, F+3)
        out = x
        for i, layer in enumerate(self.layers):
            out = layer(ctx, out)
            if i < len(self.layers) - 1:
                out = jax.nn.leaky_relu(out, negative_slope=0.01)
        return x + out if self.residual else out


def get_pointwise_net(args: dict) -> PointwiseNet:
    """(`pointwise_net.py:126-128`), accepting the config's network_args."""
    args = dict(args)
    if "pnet_global_feature_architecture" in args:
        args["pnet_global_feature_architecture"] = tuple(
            tuple(a) for a in args["pnet_global_feature_architecture"])
    return PointwiseNet(**args)
