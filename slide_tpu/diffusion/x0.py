"""x0-parameterized DDPM engine — TPU-native equivalent of
`pointnet2/diffusion_utils/diffusion.py:12-280` (the engine behind the feature
DDPM and the chamfer-loss position DDPM variants).

The model still predicts epsilon; the engine converts to a clipped x0
prediction, forms the posterior mean, and (for training) computes losses ON
the predicted x0 — including differentiable chamfer losses and t-truncated
mixed losses (SURVEY.md §7.3 item 4).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from slide_tpu.ops import calc_cd


def _warmup_beta(beta_start, beta_end, t, frac):
    betas = beta_end * np.ones(t, dtype=np.float64)
    warmup = int(t * frac)
    betas[:warmup] = np.linspace(beta_start, beta_end, warmup, dtype=np.float64)
    return betas


def get_beta_schedule(beta_schedule: str, *, beta_start: float, beta_end: float,
                      num_diffusion_timesteps: int) -> np.ndarray:
    """Beta schedule zoo (`diffusion.py:12-28`)."""
    t = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, t, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, t, dtype=np.float64)
    elif beta_schedule == "warmup10":
        betas = _warmup_beta(beta_start, beta_end, t, 0.1)
    elif beta_schedule == "warmup50":
        betas = _warmup_beta(beta_start, beta_end, t, 0.5)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(t, dtype=np.float64)
    elif beta_schedule == "jsd":
        betas = 1.0 / np.linspace(t, 1, t, dtype=np.float64)
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (t,)
    return betas


@dataclasses.dataclass(frozen=True)
class X0Schedule:
    """All derived coefficients of the x0 engine (`diffusion.py:158-208`)."""

    T: int
    data_clamp_range: float
    model_output_scale_factor: float
    scale_loss_terms: bool
    t_truncation: int
    alphas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    sqrt_alphas: jax.Array
    sqrt_one_minus_alphas: jax.Array
    logvar: jax.Array

    @staticmethod
    def from_config(config: dict) -> "X0Schedule":
        betas = get_beta_schedule(
            config["beta_schedule"], beta_start=config["beta_start"],
            beta_end=config["beta_end"],
            num_diffusion_timesteps=config["num_diffusion_timesteps"])
        t = betas.shape[0]
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
        model_var_type = config.get("model_var_type", "fixedsmall")
        if model_var_type == "fixedlarge":
            logvar = np.log(np.append(posterior_variance[1], betas[1:]))
        elif model_var_type == "fixedsmall":
            logvar = np.log(np.maximum(posterior_variance, 1e-20))
        else:
            raise ValueError(f"variance type {model_var_type} not supported")

        sqrt_recip = np.sqrt(1.0 / acp)
        t_trunc = 0
        if config.get("loss_type") in ("mixed_cd_p_epsilon_mse", "mixed_cd_t_epsilon_mse"):
            if "t_trunction" in config:            # sic — reference key spelling
                t_trunc = int(config["t_trunction"])
            else:
                coef = config["xt_coefficient_trunction"]
                t_trunc = int((sqrt_recip < coef).sum())

        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return X0Schedule(
            T=t,
            data_clamp_range=config["data_clamp_range"],
            model_output_scale_factor=config["model_output_scale_factor"],
            scale_loss_terms=config.get("scale_loss_terms", False),
            t_truncation=t_trunc,
            alphas=f32(alphas), alphas_cumprod=f32(acp),
            sqrt_recip_alphas_cumprod=f32(sqrt_recip),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
            sqrt_alphas=f32(np.sqrt(alphas)),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            logvar=f32(logvar))


def _bc(coeffs: jax.Array, ts: jax.Array, ndim: int) -> jax.Array:
    """coefficient gather broadcast to rank-ndim x (`diffusion.py:31-39`)."""
    return coeffs[ts].reshape((ts.shape[0],) + (1,) * (ndim - 1))


def predict_xstart(sched: X0Schedule, x_t, ts, model_output):
    """Clipped x0 prediction from eps prediction (`diffusion.py:71-75`).
    model_output must already include the engine's output scale factor."""
    x0 = (_bc(sched.sqrt_recip_alphas_cumprod, ts, x_t.ndim) * x_t
          - _bc(sched.sqrt_recipm1_alphas_cumprod, ts, x_t.ndim) * model_output)
    if sched.data_clamp_range > 0:
        x0 = jnp.clip(x0, -sched.data_clamp_range, sched.data_clamp_range)
    return x0


def denoising_step(sched: X0Schedule, key, x, ts, model_output, *,
                   complete_x0=None, keypoint_mask=None):
    """One reverse step p(x_{t-1} | x_t) via the x0 parameterization
    (`diffusion.py:58-95`).  With `keypoint_mask` (B, N) and `complete_x0`,
    only masked points are resampled (local resampling,
    `diffusion.py:76-79`)."""
    x0 = predict_xstart(sched, x, ts, model_output)
    if keypoint_mask is not None:
        m = keypoint_mask.reshape(keypoint_mask.shape + (1,) * (x.ndim - keypoint_mask.ndim))
        x0 = x0 * m + complete_x0 * (1.0 - m)
    mean = (_bc(sched.posterior_mean_coef1, ts, x.ndim) * x0
            + _bc(sched.posterior_mean_coef2, ts, x.ndim) * x)
    logvar = _bc(sched.logvar, ts, x.ndim)
    noise = jax.random.normal(key, x.shape, x.dtype)
    nonzero = 1.0 - (ts == 0).astype(x.dtype).reshape((x.shape[0],) + (1,) * (x.ndim - 1))
    sample = mean + nonzero * jnp.exp(0.5 * logvar) * noise
    return sample, x0


def x0_training_loss(net_fn: Callable, key: jax.Array, x: jax.Array,
                     sched: X0Schedule, *, loss_type: str = "cd_p",
                     normal_loss_type: str = "cos"):
    """`Diffusion.train_loss` (`diffusion.py:105-155`): diffuse, predict x0,
    compute CD/F1/MSE losses on it.  Returns a dict of scalar losses incl.
    'training_loss'."""
    b = x.shape[0]
    k_t, k_z = jax.random.split(key)
    ts = jax.random.randint(k_t, (b,), 0, sched.T)
    abar = _bc(sched.alphas_cumprod, ts, x.ndim)
    z = jax.random.normal(k_z, x.shape, x.dtype)
    x_t = jnp.sqrt(abar) * x + jnp.sqrt(1.0 - abar) * z
    model_output = net_fn(x_t, ts) * sched.model_output_scale_factor
    x0 = (_bc(sched.sqrt_recip_alphas_cumprod, ts, x.ndim) * lax.stop_gradient(x_t)
          - _bc(sched.sqrt_recipm1_alphas_cumprod, ts, x.ndim) * model_output)
    target = x
    if sched.scale_loss_terms:
        scale = _bc(sched.sqrt_recipm1_alphas_cumprod, ts, x.ndim)
        x0 = x0 / scale
        target = target / scale

    loss_dict = calc_cd(x0, lax.stop_gradient(target), calc_f1=True,
                        f1_threshold=0.0001, normal_loss_type=normal_loss_type)
    loss_dict["x0_mse"] = jnp.sum((x0 - target) ** 2, axis=2).mean(axis=1)
    loss_dict["epsilon_mse"] = jnp.sum((model_output - z) ** 2, axis=2).mean(axis=1)
    zero = jnp.zeros_like(loss_dict["cd_p"])
    feat_p = loss_dict.get("cd_feature_p", zero)
    feat_t = loss_dict.get("cd_feature_t", zero)

    if loss_type == "cd_p":
        loss = loss_dict["cd_p"] + feat_p
    elif loss_type == "cd_t":
        loss = loss_dict["cd_t"] + feat_t
    elif loss_type == "x0_mse":
        loss = loss_dict["x0_mse"]
    elif loss_type == "epsilon_mse":
        loss = loss_dict["epsilon_mse"]
    elif loss_type == "mixed_cd_p_epsilon_mse":
        small = (ts < sched.t_truncation).astype(x.dtype)
        loss = small * (loss_dict["cd_p"] + feat_p) + (1 - small) * loss_dict["epsilon_mse"]
    elif loss_type == "mixed_cd_t_epsilon_mse":
        small = (ts < sched.t_truncation).astype(x.dtype)
        loss = small * (loss_dict["cd_t"] + feat_t) + (1 - small) * loss_dict["epsilon_mse"]
    else:
        raise ValueError(f"loss type {loss_type} is not supported")
    loss_dict["training_loss"] = loss
    return {k: jnp.mean(v) for k, v in loss_dict.items()}


def x0_denoise(net_fn: Callable, key: jax.Array, shape: Sequence[int],
               sched: X0Schedule, *, x: Optional[jax.Array] = None,
               curr_step: Optional[int] = None, n_steps: Optional[int] = None,
               keypoint: Optional[jax.Array] = None, keypoint_dim: int = 0,
               complete_x0=None, keypoint_mask=None):
    """Reverse chain as one lax.scan (`diffusion.py:211-248` and the
    keypoint-conditional variant `diffusion.py:346-397`).

    keypoint: if given (keypoint-conditional latent diffusion), the first
    `keypoint_dim` channels are PINNED to it before every net call and on the
    final output (`diffusion.py:383-397`).
    """
    shape = tuple(shape)
    b = shape[0]
    curr = sched.T if curr_step is None else curr_step
    steps = curr if (n_steps is None or curr - n_steps < 0) else n_steps
    if x is None:
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, shape)

    def pin(x):
        if keypoint is None:
            return x
        return jnp.concatenate([keypoint, x[..., keypoint_dim:]], axis=-1)

    def step(carry, t):
        x, key = carry
        key, k_step = jax.random.split(key)
        x = pin(x)
        ts = jnp.full((b,), t, dtype=jnp.int32)
        out = net_fn(x, ts) * sched.model_output_scale_factor
        x, _ = denoising_step(sched, k_step, x, ts, out,
                              complete_x0=complete_x0, keypoint_mask=keypoint_mask)
        return (x, key), None

    ts_seq = jnp.arange(curr - 1, curr - steps - 1, -1, dtype=jnp.int32)
    (x, _), _ = lax.scan(step, (x, key), ts_seq)
    return pin(x)


def diffuse(key: jax.Array, x: jax.Array, sched: X0Schedule, *,
            curr_step: int = 0, n_steps: Optional[int] = None) -> jax.Array:
    """FORWARD diffusion q(x_{t+n} | x_t) step by step — the reference's
    `Diffusion.diffuse` (`diffusion.py:250-272`), a loop of
    `diffusion_step` (`diffusion.py:42-56`), compiled to one lax.scan.

    x is x_{curr_step}; returns x_{curr_step + n_steps}.
    """
    if curr_step >= sched.T:
        raise ValueError(f"curr_step {curr_step} must be < T={sched.T}")
    if n_steps is None or curr_step + n_steps > sched.T:
        n_steps = sched.T - curr_step

    def step(carry, t):
        x, key = carry
        key, k = jax.random.split(key)
        noise = jax.random.normal(k, x.shape, x.dtype)
        x = (_bc(sched.sqrt_alphas, t[None], x.ndim) * x
             + _bc(sched.sqrt_one_minus_alphas, t[None], x.ndim) * noise)
        return (x, key), None

    ts_seq = jnp.arange(curr_step, curr_step + n_steps, dtype=jnp.int32)
    (x, _), _ = lax.scan(step, (x, key), ts_seq)
    return x


def diffuse_t_steps(key: jax.Array, x0: jax.Array, t, sched: X0Schedule) -> jax.Array:
    """One-shot forward jump x_t ~ q(x_t | x_0) — the reference's
    `Diffusion.diffuse_t_steps` (`diffusion.py:274-279`).  `t` in [0, T-1]."""
    abar = sched.alphas_cumprod[t]
    noise = jax.random.normal(key, x0.shape, x0.dtype)
    return jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * noise
