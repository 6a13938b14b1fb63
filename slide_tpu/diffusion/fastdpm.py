"""FastDPM accelerated sampling — reference `pointnet2/util_fastdpmv2.py:
186-476` (VAR / STEP methods × linear / quadratic schedules × kappa).

Schedule search (bisection over noise levels, continuous-timestep adaptation
via the Stirling-approximated log-noise) runs once on the host in numpy; the
S-step reverse chain itself compiles to one `lax.scan` with all per-step
coefficients precomputed as arrays.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from slide_tpu.diffusion.eps import DiffusionSchedule


def bisearch(f, domain, target, eps: float = 1e-8) -> float:
    """Smallest x with f(x) > target (`util_fastdpmv2.py:186-209`)."""
    sign = -1 if target < 0 else 1
    left, right = domain
    x = (left + right) / 2
    for _ in range(1000):
        x = (left + right) / 2
        if f(x) < target:
            right = x
        elif f(x) > (1 + sign * eps) * target:
            left = x
        else:
            break
    return x


def get_var_noise(s: int, diffusion_config: dict, schedule: str = "linear") -> np.ndarray:
    """VAR noise levels matching the full chain's terminal alpha_bar
    (`util_fastdpmv2.py:212-236`)."""
    dc = diffusion_config
    target = np.prod(1 - np.linspace(dc["beta_0"], dc["beta_T"], dc["T"]))
    if schedule == "linear":
        g = lambda x: np.linspace(dc["beta_0"], x, s)
        domain = (dc["beta_0"], 0.99)
    elif schedule == "quadratic":
        g = lambda x: np.array([dc["beta_0"] * (1 + i * x) ** 2 for i in range(s)])
        domain = (0.0, 0.95 / np.sqrt(dc["beta_0"]) / s)
    else:
        raise NotImplementedError(schedule)
    largest = bisearch(lambda x: np.prod(1 - g(x)), domain, target, eps=1e-4)
    return g(largest)


def get_step_steps(s: int, diffusion_config: dict, schedule: str = "linear"):
    """STEP timestep subsets (`util_fastdpmv2.py:239-258`)."""
    t = diffusion_config["T"]
    if schedule == "linear":
        c = (t - 1.0) / (s - 1.0)
        taus = [np.floor(i * c) for i in range(s)]
    elif schedule == "quadratic":
        taus = np.linspace(0, np.sqrt(t * 0.8), s) ** 2
    else:
        raise NotImplementedError(schedule)
    return [int(x) for x in taus]


def _log_gamma(x):
    y = x - 1
    return np.log(2 * np.pi * y) / 2 + y * (np.log(y) - 1) + np.log(1 + 1 / (12 * y))


def _log_cont_noise(t, beta_0, beta_t, big_t):
    delta = (beta_t - beta_0) / (big_t - 1)
    c = (1.0 - beta_0) / delta
    t1 = t + 1
    return t1 * np.log(delta) + _log_gamma(c + 1) - _log_gamma(c - t1 + 1)


def precompute_var_steps(sched: DiffusionSchedule, user_defined_eta: np.ndarray,
                         beta_0: float, beta_t: float):
    """Continuous timesteps matching each VAR noise level
    (`util_fastdpmv2.py:275-304`).  Returns a DECREASING list of floats."""
    alpha_bar = np.asarray(sched.alpha_bar, np.float64)
    t = sched.T
    # f32 like the reference (`util_fastdpmv2.py:284-287`) — the f32 rounding
    # matters: gamma_bar[0] must compare EQUAL to alpha_bar[0] so the first
    # noise level brackets at i=0
    gamma_bar = np.cumprod((1 - np.asarray(user_defined_eta)).astype(np.float32))
    gamma_bar = gamma_bar.astype(np.float64)
    if gamma_bar[0] > alpha_bar[0] * (1 + 1e-5) or \
            gamma_bar[-1] < alpha_bar[-1] * (1 - 1e-3):
        raise ValueError("VAR noise levels out of the chain's alpha_bar range")
    steps = []
    for ti in range(len(gamma_bar) - 1, -1, -1):
        t_adapted = None
        for i in range(t - 1):
            if alpha_bar[i] >= gamma_bar[ti] > alpha_bar[i + 1]:
                t_adapted = bisearch(
                    lambda _t: _log_cont_noise(_t, beta_0, beta_t, t),
                    domain=(i - 0.01, i + 1.01),
                    target=np.log(gamma_bar[ti]))
                break
        if t_adapted is None:
            t_adapted = t - 1
        steps.append(t_adapted)
    return steps


def _generalized_chain(net_fn: Callable, key: jax.Array, shape, taus: np.ndarray,
                       abar_cur: np.ndarray, abar_next: np.ndarray, kappa: float):
    """Shared DDIM-style generalized reverse chain for VAR and STEP
    (`util_fastdpmv2.py:350-373, 421-444`): for each step i,
      sigma_i = kappa * sqrt((1-a_next)/(1-a_cur) * (1 - a_cur/a_next))
      x <- x * sqrt(a_next/a_cur) + c_i * eps + sigma_i * z,
      c_i = sqrt(1 - a_next - sigma_i^2) - sqrt(1-a_cur) * sqrt(a_next/a_cur).
    Final step uses a_next = 1, sigma = 0."""
    s = len(taus)
    sigma = kappa * np.sqrt((1 - abar_next) / (1 - abar_cur)
                            * (1 - abar_cur / abar_next))
    sigma[-1] = 0.0
    mult = np.sqrt(abar_next / abar_cur)
    c = np.sqrt(np.maximum(1 - abar_next - sigma ** 2, 0.0)) \
        - np.sqrt(1 - abar_cur) * mult
    coefs = (jnp.asarray(taus, jnp.float32), jnp.asarray(mult, jnp.float32),
             jnp.asarray(c, jnp.float32), jnp.asarray(sigma, jnp.float32))

    b = shape[0]
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, tuple(shape))

    def step(carry, per_step):
        x, key = carry
        tau, m, cc, sg = per_step
        key, kz = jax.random.split(key)
        eps = net_fn(x, jnp.full((b,), tau))
        x = x * m + cc * eps + sg * jax.random.normal(kz, x.shape)
        return (x, key), None

    (x, _), _ = lax.scan(step, (x, key), coefs)
    return x


def var_sampling(net_fn: Callable, key: jax.Array, shape: Sequence[int],
                 user_defined_eta: np.ndarray, continuous_steps, kappa: float):
    """(`util_fastdpmv2.py:307-381`)."""
    gamma_bar = np.cumprod(1 - np.asarray(user_defined_eta, np.float64))
    s = len(gamma_bar)
    # step i uses current gamma_bar[S-1-i]; next = gamma_bar[S-2-i] (1 at end)
    abar_cur = gamma_bar[::-1].copy()
    abar_next = np.append(gamma_bar[::-1][1:], 1.0)
    return _generalized_chain(net_fn, key, shape,
                              np.asarray(continuous_steps, np.float64),
                              abar_cur, abar_next, kappa)


def step_sampling(net_fn: Callable, key: jax.Array, shape: Sequence[int],
                  sched: DiffusionSchedule, user_defined_steps, kappa: float):
    """(`util_fastdpmv2.py:384-452`)."""
    steps = sorted(list(user_defined_steps), reverse=True)
    alpha_bar = np.asarray(sched.alpha_bar, np.float64)
    abar_cur = alpha_bar[steps]
    abar_next = np.append(alpha_bar[steps[1:]], 1.0)
    return _generalized_chain(net_fn, key, shape, np.asarray(steps, np.float64),
                              abar_cur, abar_next, kappa)


def fast_sampling(net_fn: Callable, key: jax.Array, shape: Sequence[int],
                  sched: DiffusionSchedule, diffusion_config: dict, *,
                  length: int = 100, sampling_method: str = "var",
                  schedule: str = "quadratic", kappa: float = 0.0):
    """`fast_sampling_function_v2` (`util_fastdpmv2.py:455-476`)."""
    if sampling_method not in ("var", "step"):
        raise ValueError(sampling_method)
    if schedule not in ("quadratic", "linear"):
        raise ValueError(schedule)
    if sampling_method == "var":
        eta = get_var_noise(length, diffusion_config, schedule)
        csteps = precompute_var_steps(sched, eta, diffusion_config["beta_0"],
                                      diffusion_config["beta_T"])
        return var_sampling(net_fn, key, shape, eta, csteps, kappa)
    steps = get_step_steps(length, diffusion_config, schedule)
    return step_sampling(net_fn, key, shape, sched, steps, kappa)


def diffusion_config_of(sched: DiffusionSchedule) -> dict:
    """Recover the {T, beta_0, beta_T} dict `fast_sampling` needs from a
    linear-beta DiffusionSchedule (the only kind `calc_diffusion_hyperparams`
    builds) — lets eval paths accept just the schedule object."""
    beta = np.asarray(sched.beta, np.float64)
    return {"T": sched.T, "beta_0": float(beta[0]), "beta_T": float(beta[-1])}


def fast_x0_denoise(net_fn: Callable, key: jax.Array, shape: Sequence[int],
                    sched, *, length: int = 50, schedule: str = "quadratic",
                    kappa: float = 0.0, keypoint=None, keypoint_dim: int = 0):
    """STEP-method accelerated reverse chain for the x0 ENGINE
    (`diffusion_utils/diffusion.py:211-248` chain, subsampled the
    `util_fastdpmv2.py:384-452` way).

    The x0 engine's net still predicts epsilon (scaled by
    model_output_scale_factor); each of the S steps forms the clipped x0
    prediction exactly like `x0.predict_xstart` and takes the generalized
    DDIM jump to the next selected timestep.  Works for ANY beta schedule in
    the zoo because only alpha_bar at the selected steps enters (the VAR
    method's bisection assumes the linear chain, so it is not offered here).
    Keypoints are pinned before every net call and on the output, matching
    `x0_denoise`.
    """
    from slide_tpu.diffusion.x0 import X0Schedule  # local: avoid import cycle

    assert isinstance(sched, X0Schedule)
    steps = sorted(get_step_steps(length, {"T": sched.T}, schedule),
                   reverse=True)
    alpha_bar = np.asarray(sched.alphas_cumprod, np.float64)
    abar_cur = alpha_bar[steps]
    abar_next = np.append(alpha_bar[steps[1:]], 1.0)
    sigma = kappa * np.sqrt((1 - abar_next) / (1 - abar_cur)
                            * (1 - abar_cur / abar_next))
    sigma[-1] = 0.0
    coefs = (jnp.asarray(steps, jnp.int32),
             jnp.asarray(abar_cur, jnp.float32),
             jnp.asarray(abar_next, jnp.float32),
             jnp.asarray(sigma, jnp.float32))

    shape = tuple(shape)
    b = shape[0]
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, shape)

    def pin(x):
        if keypoint is None:
            return x
        return jnp.concatenate([keypoint, x[..., keypoint_dim:]], axis=-1)

    def step(carry, per_step):
        x, key = carry
        tau, a_cur, a_next, sg = per_step
        x = pin(x)
        eps = net_fn(x, jnp.full((b,), tau)) * sched.model_output_scale_factor
        x0 = (x - jnp.sqrt(1.0 - a_cur) * eps) / jnp.sqrt(a_cur)
        if sched.data_clamp_range > 0:
            x0 = jnp.clip(x0, -sched.data_clamp_range, sched.data_clamp_range)
        key, kz = jax.random.split(key)
        c = jnp.sqrt(jnp.maximum(1.0 - a_next - sg ** 2, 0.0))
        x = (jnp.sqrt(a_next) * x0 + c * eps
             + sg * jax.random.normal(kz, x.shape))
        return (x, key), None

    (x, _), _ = lax.scan(step, (x, key), coefs)
    return pin(x)
