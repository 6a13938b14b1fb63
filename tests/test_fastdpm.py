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


def test_diffusion_config_of_roundtrip():
    from slide_tpu.diffusion import diffusion_config_of
    sched = calc_diffusion_hyperparams(**DC)
    dc = diffusion_config_of(sched)
    assert dc["T"] == DC["T"]
    np.testing.assert_allclose(dc["beta_0"], DC["beta_0"], rtol=1e-6)
    np.testing.assert_allclose(dc["beta_T"], DC["beta_T"], rtol=1e-6)


def _x0_sched(t=200, clamp=3.0):
    from slide_tpu.diffusion import X0Schedule
    return X0Schedule.from_config({
        "beta_schedule": "linear", "beta_start": 1e-4, "beta_end": 0.02,
        "num_diffusion_timesteps": t, "data_clamp_range": clamp,
        "model_output_scale_factor": 1.0})


@pytest.mark.parametrize("kappa", [0.0, 1.0])
def test_fast_x0_denoise_shapes_and_clamp(kappa):
    from slide_tpu.diffusion import fast_x0_denoise
    sched = _x0_sched()
    net_fn = lambda x, ts: x * 0.05
    out = fast_x0_denoise(net_fn, jax.random.key(0), (3, 16, 51), sched,
                          length=8, schedule="quadratic", kappa=kappa)
    assert out.shape == (3, 16, 51)
    assert np.isfinite(np.asarray(out)).all()
    # final step is a clamped x0 prediction -> obeys data_clamp_range
    assert float(jnp.abs(out).max()) <= sched.data_clamp_range + 1e-5


def test_fast_x0_denoise_pins_keypoints():
    from slide_tpu.diffusion import fast_x0_denoise
    sched = _x0_sched()
    kp = jnp.broadcast_to(jnp.asarray([0.25, -0.5, 1.0]), (2, 16, 3))
    seen = []
    def net_fn(x, ts):
        seen.append(x)
        return jnp.zeros_like(x)
    out = fast_x0_denoise(net_fn, jax.random.key(1), (2, 16, 51), sched,
                          length=6, keypoint=kp, keypoint_dim=3)
    np.testing.assert_allclose(np.asarray(out[..., :3]), np.asarray(kp))


def test_fast_x0_denoise_matches_full_chain_statistics():
    """Zero-eps net: S-step jumps and the T-step posterior chain both end at
    x0 = clamp(x_T / sqrt(abar)); kappa=0 makes FastDPM deterministic."""
    from slide_tpu.diffusion import fast_x0_denoise
    sched = _x0_sched(clamp=100.0)
    net_fn = lambda x, ts: jnp.zeros_like(x)
    out = fast_x0_denoise(net_fn, jax.random.key(2), (4, 256, 3), sched,
                          length=10, schedule="linear", kappa=0.0)
    want_std = float(np.sqrt(1.0 / np.asarray(sched.alphas_cumprod)[-1]))
    std = float(jnp.std(out))
    assert abs(std - want_std) / want_std < 0.2, (std, want_std)


def test_latent_reconstruct_fastdpm_sampler():
    from slide_tpu.diffusion.latent import latent_denoise_and_reconstruct
    sched = _x0_sched(t=50)
    net_fn = lambda x, ts: x * 0.01
    decode_fn = lambda kp, feat, lbl, kk: jnp.concatenate(
        [kp, feat[..., :3]], axis=1)
    kp = jnp.zeros((2, 16, 3))
    recon, kp_out, feat = latent_denoise_and_reconstruct(
        net_fn, decode_fn, jax.random.key(3), 2, 3, (16, 51), sched,
        keypoint=kp, sampler="fastdpm", fastdpm_kw={"length": 5})
    assert recon.shape[0] == 2 and feat.shape == (2, 16, 48)
    with pytest.raises(ValueError, match="full-chain"):
        latent_denoise_and_reconstruct(
            net_fn, decode_fn, jax.random.key(3), 2, 3, (16, 51), sched,
            keypoint=kp, sampler="fastdpm", curr_step=10)
