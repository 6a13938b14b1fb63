"""Latent diffusion over keypoint features — the reference's
`LatentDiffusion` (`diffusion_utils/diffusion.py:282-404`).

The latent is [keypoint positions | keypoint features] per sparse latent
point.  In keypoint-conditional mode (all shipped configs) positions are given
and PINNED at every reverse step; the model only denoises features.

Functional design: the engine takes the frozen autoencoder apply closures
rather than holding modules, so the whole denoise+decode compiles into one
jitted program.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from slide_tpu.diffusion.x0 import X0Schedule, x0_denoise, _bc


def latent_config_weights(config: dict):
    """(keypoint_position_loss_weight, feature_loss_weight) with the
    keypoint-conditional override (`diffusion.py:285-292`)."""
    kp_w = config.get("keypoint_position_loss_weight", 1.0)
    feat_w = config.get("feature_loss_weight", 1.0)
    if config.get("keypoint_conditional", False):
        kp_w = 0.0
    return kp_w, feat_w


def latent_encode(encode_fn: Callable, x, keypoint, label, key) -> jax.Array:
    """[keypoint | AE-encoded features] (`diffusion.py:301-309`).
    encode_fn(x, keypoint, label, key) -> (B, K, F) sampled posterior feats."""
    feat = encode_fn(x, keypoint, label, key)
    return jnp.concatenate([keypoint, feat], axis=-1)


def latent_train_loss(net_fn: Callable, encode_fn: Callable, key: jax.Array,
                      x: jax.Array, keypoint: jax.Array, label,
                      sched: X0Schedule, *, keypoint_conditional: bool,
                      keypoint_position_loss_weight: float,
                      feature_loss_weight: float) -> jax.Array:
    """Per-sample weighted eps-MSE on the latent (`diffusion.py:319-341`).
    Returns (B,) losses."""
    k_enc, k_t, k_z = jax.random.split(key, 3)
    latent = lax.stop_gradient(latent_encode(encode_fn, x, keypoint, label, k_enc))
    b = latent.shape[0]
    kp_dim = keypoint.shape[-1]
    ts = jax.random.randint(k_t, (b,), 0, sched.T)
    abar = _bc(sched.alphas_cumprod, ts, latent.ndim)
    z = jax.random.normal(k_z, latent.shape, latent.dtype)
    x_t = jnp.sqrt(abar) * latent + jnp.sqrt(1.0 - abar) * z
    if keypoint_conditional:
        x_t = jnp.concatenate([keypoint, x_t[..., kp_dim:]], axis=-1)
    out = net_fn(x_t, ts) * sched.model_output_scale_factor
    mse = (out - z) ** 2
    loss = (keypoint_position_loss_weight * mse[..., :kp_dim].sum(axis=-1)
            + feature_loss_weight * mse[..., kp_dim:].mean(axis=-1))
    return loss.mean(axis=1)


def latent_denoise_and_reconstruct(net_fn: Callable, decode_fn: Callable,
                                   key: jax.Array, n: int, keypoint_dim: int,
                                   shape: Sequence[int], sched: X0Schedule, *,
                                   label=None,
                                   keypoint: Optional[jax.Array] = None,
                                   x: Optional[jax.Array] = None,
                                   curr_step: Optional[int] = None,
                                   n_steps: Optional[int] = None,
                                   local_resampling: bool = False,
                                   complete_x0=None, keypoint_mask=None,
                                   sampler: str = "ddpm",
                                   fastdpm_kw: Optional[dict] = None):
    """Reverse-diffuse the latent (keypoints pinned when conditional), then
    decode through the frozen AE (`diffusion.py:346-404`).

    decode_fn(keypoint, feature, label, key) -> (B, N, out) reconstruction.
    Returns (reconstruction, keypoint, keypoint_feature).

    sampler="fastdpm" runs the S-step accelerated chain
    (`fastdpm.fast_x0_denoise`; fastdpm_kw: length/schedule/kappa) instead of
    the full T-step chain — incompatible with warm starts and local
    resampling, which are tied to full-chain timesteps.
    """
    if local_resampling and keypoint is None:
        raise ValueError("local resampling is keypoint-conditional")
    key, k_chain, k_dec = jax.random.split(key, 3)
    if sampler == "fastdpm":
        if (local_resampling or x is not None or curr_step is not None
                or n_steps is not None):
            raise ValueError("fastdpm sampling is full-chain-from-noise only")
        from slide_tpu.diffusion.fastdpm import fast_x0_denoise
        latent = fast_x0_denoise(
            net_fn, k_chain, (n,) + tuple(shape), sched,
            keypoint=keypoint, keypoint_dim=keypoint_dim,
            **(fastdpm_kw or {}))
    elif sampler != "ddpm":
        raise ValueError(f"unknown sampler {sampler}")
    else:
        latent = x0_denoise(
            net_fn, k_chain, (n,) + tuple(shape), sched, x=x,
            curr_step=curr_step, n_steps=n_steps, keypoint=keypoint,
            keypoint_dim=keypoint_dim,
            complete_x0=complete_x0 if local_resampling else None,
            keypoint_mask=keypoint_mask if local_resampling else None)
    kp = latent[..., :keypoint_dim]
    feat = latent[..., keypoint_dim:]
    recon = decode_fn(kp, feat, label, k_dec)
    return recon, kp, feat
