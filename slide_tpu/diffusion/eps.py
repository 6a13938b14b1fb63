"""Epsilon-prediction DDPM engine — TPU-native equivalent of
`pointnet2/util.py:167-298`.

The reference's reverse loop is a python for-loop doing one net forward per
step with host round-trips (`util.py:235-253`); here the full T-step chain
compiles to a single `lax.scan` whose carry is (x, rng) — zero host syncs, the
denoiser network is traced once (SURVEY.md §7.1 idiomatic move 1).

Networks are passed as closures `net_fn(x, ts) -> eps_hat` with labels /
conditions / condition caches already bound, keeping the engine agnostic of
model and conditioning plumbing.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Linear-beta DDPM hyperparameters (`util.py:167-194`)."""

    T: int
    beta: jax.Array        # (T,)
    alpha: jax.Array       # (T,)
    alpha_bar: jax.Array   # (T,)
    sigma: jax.Array       # (T,) = sqrt(beta_tilde)


def calc_diffusion_hyperparams(T: int, beta_0: float, beta_T: float) -> DiffusionSchedule:
    beta = np.linspace(beta_0, beta_T, T, dtype=np.float64)
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha)
    beta_tilde = beta.copy()
    beta_tilde[1:] = beta[1:] * (1.0 - alpha_bar[:-1]) / (1.0 - alpha_bar[1:])
    sigma = np.sqrt(beta_tilde)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DiffusionSchedule(T=T, beta=f32(beta), alpha=f32(alpha),
                             alpha_bar=f32(alpha_bar), sigma=f32(sigma))


def diffusion_training_loss(net_fn: Callable, key: jax.Array, x0: jax.Array,
                            sched: DiffusionSchedule) -> jax.Array:
    """MSE(eps_hat, eps) at a uniformly sampled timestep per batch element
    (`util.py:262-298`).  net_fn(x_t, ts) -> eps_hat."""
    b = x0.shape[0]
    k_t, k_z = jax.random.split(key)
    ts = jax.random.randint(k_t, (b,), 0, sched.T)
    z = jax.random.normal(k_z, x0.shape, x0.dtype)
    abar = sched.alpha_bar[ts].reshape((b,) + (1,) * (x0.ndim - 1))
    x_t = jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * z
    eps_hat = net_fn(x_t, ts)
    return jnp.mean((eps_hat - z) ** 2)


def diffusion_sampling(net_fn: Callable, key: jax.Array, shape: Sequence[int],
                       sched: DiffusionSchedule, *,
                       t_slices: Optional[Sequence[int]] = None,
                       xT: Optional[jax.Array] = None,
                       start_step: Optional[int] = None):
    """Full ancestral sampling chain p(x_0 | x_T) as one scan
    (`util.py:197-259`).

    Args:
      net_fn: (x, ts(B,)) -> eps_hat.
      shape: (B, N, D) output shape.
      t_slices: optional list of timesteps at which to record the PRE-noise
        state (the reference's `return_multiple_t_slices`).
      xT / start_step: warm start from a precomputed x_{start_step}
        (`use_a_precomputed_XT`, `util.py:229-232`): x = xT + sigma[step]*z and
        the chain runs from start_step-1 down to 0.

    Returns x0, or (x0, {t: slice}) if t_slices is given.
    """
    shape = tuple(shape)
    b = shape[0]
    key, k_init = jax.random.split(key)
    if xT is not None:
        if start_step is None:
            raise ValueError("start_step required with a precomputed xT")
        x = xT + sched.sigma[start_step] * jax.random.normal(k_init, shape)
        start = start_step - 1
    else:
        x = jax.random.normal(k_init, shape)
        start = sched.T - 1

    slices = tuple(t_slices) if t_slices else ()
    slice_init = jnp.zeros((len(slices),) + shape) if slices else None

    def step(carry, t):
        x, key, slc = carry
        key, k_noise = jax.random.split(key)
        ts = jnp.full((b,), t, dtype=jnp.int32)
        eps = net_fn(x, ts)
        a_t = sched.alpha[t]
        abar_t = sched.alpha_bar[t]
        x = (x - (1.0 - a_t) / jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(a_t)
        if slices:
            for i, t_rec in enumerate(slices):
                slc = slc.at[i].set(jnp.where(t == t_rec, x, slc[i]))
        noise = jax.random.normal(k_noise, shape)
        x = jnp.where(t > 0, x + sched.sigma[t] * noise, x)
        return (x, key, slc), None

    ts_seq = jnp.arange(start, -1, -1, dtype=jnp.int32)
    (x, _, slc), _ = lax.scan(step, (x, key, slice_init), ts_seq)
    if slices:
        return x, {t: slc[i] for i, t in enumerate(slices)}
    return x
