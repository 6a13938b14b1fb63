"""FastDPM tests: schedule search numerics vs the reference's own math, and
the all-combination shape check the reference ships
(`util_fastdpmv2.py:479-495`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.diffusion import calc_diffusion_hyperparams
from slide_tpu.diffusion.fastdpm import (get_var_noise, get_step_steps,
                                         precompute_var_steps, fast_sampling,
                                         bisearch)

DC = {"T": 200, "beta_0": 1e-4, "beta_T": 0.02}


def test_bisearch():
    # bisearch expects a DECREASING f (it searches prod(1 - g(x)))
    x = bisearch(lambda v: 16.0 / v, (0.1, 10.0), 4.0, eps=1e-6)
    assert abs(x - 4.0) < 1e-3


@pytest.mark.parametrize("schedule", ["linear", "quadratic"])
def test_var_noise_matches_terminal_alpha_bar(schedule):
    eta = get_var_noise(20, DC, schedule)
    assert eta.shape == (20,)
    target = np.prod(1 - np.linspace(DC["beta_0"], DC["beta_T"], DC["T"]))
    got = np.prod(1 - eta)
    np.testing.assert_allclose(got, target, rtol=2e-3)
    assert (eta > 0).all() and (eta < 1).all()


@pytest.mark.parametrize("schedule", ["linear", "quadratic"])
def test_step_steps(schedule):
    steps = get_step_steps(10, DC, schedule)
    assert len(steps) == 10
    assert steps[0] == 0
    assert steps[-1] <= DC["T"] - 1
    assert steps == sorted(steps)


def test_precompute_var_steps_decreasing():
    sched = calc_diffusion_hyperparams(**DC)
    eta = get_var_noise(10, DC, "quadratic")
    csteps = precompute_var_steps(sched, eta, DC["beta_0"], DC["beta_T"])
    assert len(csteps) == 10
    assert all(csteps[i] >= csteps[i + 1] for i in range(len(csteps) - 1))
    assert abs(csteps[-1]) < 1.5   # last step near t=0
    # the adapted continuous step's alpha_bar matches gamma_bar
    gamma_bar = np.cumprod(1 - eta)
    log_ab = np.log(np.asarray(sched.alpha_bar))
    t0 = csteps[0]    # corresponds to gamma_bar[-1]
    i = int(np.floor(t0))
    interp = log_ab[i] + (t0 - i) * (log_ab[min(i + 1, DC["T"] - 1)] - log_ab[i])
    np.testing.assert_allclose(interp, np.log(gamma_bar[-1]), atol=0.05)


@pytest.mark.parametrize("method", ["var", "step"])
@pytest.mark.parametrize("schedule", ["linear", "quadratic"])
@pytest.mark.parametrize("kappa", [0.0, 0.5, 1.0])
def test_fast_sampling_all_combinations(method, schedule, kappa):
    """The reference's own smoke matrix: every method x schedule x kappa runs
    an identity-ish net through the chain and produces the right shape."""
    sched = calc_diffusion_hyperparams(**DC)
    net_fn = lambda x, ts: x * 0.1
    out = fast_sampling(net_fn, jax.random.key(0), (2, 16, 3), sched, DC,
                        length=8, sampling_method=method, schedule=schedule,
                        kappa=kappa)
    assert out.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_fast_sampling_approaches_full_chain():
    """With eps-prediction = 0 net, both the full chain and FastDPM(kappa=1)
    should produce ~standard-normal output; with the DDIM-style kappa=0 the
    output is deterministic given the key."""
    sched = calc_diffusion_hyperparams(**DC)
    net_fn = lambda x, ts: jnp.zeros_like(x)
    out1 = fast_sampling(net_fn, jax.random.key(1), (4, 256, 3), sched, DC,
                         length=10, sampling_method="step", schedule="linear",
                         kappa=0.0)
    # zero eps-prediction, kappa=0: x_0 = x_T * sqrt(1/alpha_bar[T-1])
    want_std = 1.0 / np.sqrt(float(sched.alpha_bar[-1]))
    std = float(jnp.std(out1))
    assert abs(std - want_std) / want_std < 0.2, (std, want_std)
