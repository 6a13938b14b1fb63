"""Tests for chamfer / calc_cd / fscore vs brute-force numpy, including the
gradient path (the x0-diffusion engine trains through chamfer)."""

import numpy as np
import jax
import jax.numpy as jnp

from slide_tpu.ops import calc_cd, chamfer_parts, fscore


def brute_cd(a, b):
    d = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    return d.min(2), d.min(1)


def test_chamfer_parts_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 30, 3)).astype(np.float32)
    y = rng.normal(size=(3, 20, 3)).astype(np.float32)
    parts = chamfer_parts(jnp.asarray(x), jnp.asarray(y))
    dx, dy = brute_cd(x, y)
    np.testing.assert_allclose(np.asarray(parts["dist_x"]), dx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(parts["dist_y"]), dy, atol=1e-5)


def test_calc_cd_values():
    rng = np.random.default_rng(1)
    out = rng.normal(size=(2, 16, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 16, 3)).astype(np.float32)
    r = calc_cd(jnp.asarray(out), jnp.asarray(gt), calc_f1=True)
    d1, d2 = brute_cd(gt, out)  # reference order: dist1 = gt->output
    np.testing.assert_allclose(np.asarray(r["cd_p"]),
                               (np.sqrt(d1).mean(1) + np.sqrt(d2).mean(1)) / 2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r["cd_t"]), d1.mean(1) + d2.mean(1), atol=1e-5)
    assert r["f1"].shape == (2,)


def test_calc_cd_identical_clouds():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
    r = calc_cd(jnp.asarray(pts), jnp.asarray(pts), calc_f1=True)
    # cd_p tolerance: the quadratic-expansion sqdist has ~1e-8 cancellation
    # error which sqrt amplifies to ~1e-4 for identical points.
    np.testing.assert_allclose(np.asarray(r["cd_p"]), 0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(r["cd_t"]), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r["f1"]), 1.0)


def test_feature_chamfer_cos_and_mse():
    rng = np.random.default_rng(3)
    out = rng.normal(size=(2, 10, 6)).astype(np.float32)
    gt = out.copy()
    r = calc_cd(jnp.asarray(out), jnp.asarray(gt), normal_loss_type="cos")
    np.testing.assert_allclose(np.asarray(r["cd_feature_t"]), 0, atol=1e-5)
    r2 = calc_cd(jnp.asarray(out), jnp.asarray(gt), normal_loss_type="mse")
    np.testing.assert_allclose(np.asarray(r2["cd_feature_t"]), 0, atol=1e-5)
    # perturbed features give positive feature loss
    out2 = out.copy()
    out2[..., 3:] += 1.0
    r3 = calc_cd(jnp.asarray(out2), jnp.asarray(gt), normal_loss_type="mse")
    assert (np.asarray(r3["cd_feature_t"]) > 0).all()


def test_chamfer_is_differentiable():
    rng = np.random.default_rng(4)
    out = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))

    def loss(o):
        return jnp.mean(calc_cd(o, gt)["cd_t"])

    g = jax.grad(loss)(out)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_fscore_nan_guard():
    d1 = jnp.ones((1, 4)) * 10.0  # nothing under threshold
    d2 = jnp.ones((1, 4)) * 10.0
    f, p1, p2 = fscore(d1, d2, threshold=0.1)
    np.testing.assert_allclose(np.asarray(f), 0.0)
