"""Fused single-kernel denoiser (models/fused_denoiser.py): config gating,
numerical parity with the flax ConditionalPointNet2 (both the plain-jnp path
and the Pallas kernel in interpret mode), and the sampling-chain drop-in."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slide_tpu.configs import keypoint_ddpm_config, latent_ddpm_config
from slide_tpu.diffusion import calc_diffusion_hyperparams, diffusion_sampling
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.models.fused_denoiser import (build_spec, extract_weights,
                                             fused_forward, make_fused_net_fn,
                                             supports_config)


def _setup(cfg_fn, din, b=8, n=16):
    cfg = cfg_fn("airplane")["pointnet_config"]
    net = ConditionalPointNet2(cfg)
    x = jax.random.normal(jax.random.key(1), (b, n, din)) * 0.5
    ts = jnp.asarray(np.random.default_rng(0).integers(0, 1000, b), jnp.int32)
    lbl = jnp.asarray(np.random.default_rng(1).integers(0, 13, b), jnp.int32)
    variables = net.init(jax.random.key(0), x, ts=ts, label=lbl)
    return cfg, net, variables, x, ts, lbl


def test_supports_config():
    assert supports_config(keypoint_ddpm_config("airplane")["pointnet_config"])
    assert supports_config(latent_ddpm_config("airplane")["pointnet_config"])
    bad = dict(keypoint_ddpm_config("airplane")["pointnet_config"])
    bad["bn_first"] = True
    assert not supports_config(bad)
    bad = dict(keypoint_ddpm_config("airplane")["pointnet_config"])
    bad["include_local_feature"] = True
    assert not supports_config(bad)
    assert not supports_config({})


@pytest.mark.parametrize("cfg_fn,din", [(keypoint_ddpm_config, 3),
                                        (latent_ddpm_config, 51)])
def test_jnp_path_matches_flax(cfg_fn, din):
    cfg, net, variables, x, ts, lbl = _setup(cfg_fn, din)
    ref = net.apply(variables, x, ts=ts, label=lbl)
    fn = make_fused_net_fn(cfg, variables["params"], 16, use_pallas=False)
    got = fn(x, ts, lbl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_interpret_matches_flax():
    cfg, net, variables, x, ts, lbl = _setup(keypoint_ddpm_config, 3)
    ref = net.apply(variables, x, ts=ts, label=lbl)
    fn = make_fused_net_fn(cfg, variables["params"], 16, block_b=4,
                           use_pallas=True, interpret=True)
    got = fn(x, ts, lbl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_sampling_chain_matches_flax():
    cfg, net, variables, x, ts, lbl = _setup(keypoint_ddpm_config, 3)
    sched = calc_diffusion_hyperparams(10, 1e-4, 0.02)
    params = variables["params"]

    def flax_fn(x, ts):
        return net.apply({"params": params}, x, ts=ts, label=lbl)

    fused = make_fused_net_fn(cfg, params, 16, use_pallas=False)

    def fused_fn(x, ts):
        return fused(x, ts, lbl)

    key = jax.random.key(7)
    a = diffusion_sampling(flax_fn, key, (8, 16, 3), sched)
    b = diffusion_sampling(fused_fn, key, (8, 16, 3), sched)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-3, atol=1e-3)


def test_batch_tiling_adapts_and_rejects():
    """Non-divisible small batches fall back to a single tile (always
    Mosaic-lowerable); large non-multiple-of-8 batches still raise."""
    cfg, net, variables, x, ts, lbl = _setup(keypoint_ddpm_config, 3, b=6)
    spec = build_spec(cfg, 16)
    weights = extract_weights(variables["params"])
    out = fused_forward(spec, weights, x, ts, lbl, block_b=4, use_pallas=True,
                        interpret=True)
    ref = fused_forward(spec, weights, x, ts, lbl, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    big = jnp.zeros((100, 16, 3))
    with pytest.raises(ValueError, match="divisible"):
        jax.eval_shape(lambda: fused_forward(
            spec, weights, big, jnp.zeros((100,), jnp.int32),
            jnp.zeros((100,), jnp.int32), block_b=16, use_pallas=True,
            interpret=True))


def test_unsupported_shapes_return_none():
    """Shape-level rejections must yield None (callers fall back), not raise:
    npoint < N (latent eval at full cloud size) and FP K > N."""
    cfg, net, variables, *_ = _setup(keypoint_ddpm_config, 3)
    assert make_fused_net_fn(cfg, variables["params"], 2048) is None  # npoint<N
    assert make_fused_net_fn(cfg, variables["params"], 4) is None     # K=8>N
    fn = make_fused_net_fn(cfg, variables["params"], 16)
    assert fn is not None and fn.block_b == 8


def test_duplicate_points_stay_finite():
    """Coincident points cancel to tiny negative sqdist in x²+y²−2xy; the
    clamp keeps the kNN weight channel finite and positive (parity with
    ops/neighbors.pairwise_sqdist)."""
    cfg, net, variables, x, ts, lbl = _setup(keypoint_ddpm_config, 3)
    x = x.at[:, 1].set(x[:, 0])          # exact duplicate point
    x = x.at[:, 2].set(x[:, 0] + 1e-5)   # near-duplicate
    fn = make_fused_net_fn(cfg, variables["params"], 16, use_pallas=False)
    out = fn(x, ts, lbl)
    assert np.isfinite(np.asarray(out)).all()
    # exact parity is NOT expected here: duplicate points make the kNN set
    # ambiguous (distance ties resolve differently between lax.top_k on the
    # flax side and the masked-argmin extraction), so only require the two
    # equally-valid resolutions to stay in the same ballpark
    ref = np.asarray(net.apply(variables, x, ts=ts, label=lbl))
    assert np.abs(np.asarray(out) - ref).max() < 0.1
