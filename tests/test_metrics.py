"""Metric suite tests: approx EMD vs scipy optimal transport, 1-NNA behavior,
MMD/COV, JSD."""

import numpy as np
import jax.numpy as jnp
import pytest

from slide_tpu.ops.emd import approx_match, earth_mover_distance
from slide_tpu.eval.metrics import (emd_cd, pairwise_emd_cd, knn_classifier,
                                    lgan_mmd_cov, compute_all_metrics,
                                    jsd_between_point_cloud_sets,
                                    jensen_shannon_divergence)


def test_emd_identical_clouds_near_zero():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.3
    d = np.asarray(earth_mover_distance(jnp.asarray(x), jnp.asarray(x)))
    assert (d < 1e-3).all(), d


def test_emd_close_to_optimal_assignment():
    # cost metric is SQUARED distance, like the reference matchcost kernel
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, 24, 3)).astype(np.float32) * 0.3
    b = rng.standard_normal((1, 24, 3)).astype(np.float32) * 0.3
    approx = float(earth_mover_distance(jnp.asarray(a), jnp.asarray(b))[0])
    cost = np.sum((a[0][:, None] - b[0][None]) ** 2, axis=-1)
    ri, ci = linear_sum_assignment(cost)
    optimal = cost[ri, ci].sum() / 24
    assert approx >= optimal - 1e-4          # can't beat the optimum
    # the annealed soft matching lands within ~2x of the optimum on
    # random clouds (same algorithm/quality as the reference kernel)
    assert approx <= optimal * 2.0 + 1e-3


def test_approx_match_is_doubly_stochastic_ish():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((2, 32, 3)).astype(np.float32)
    b = rng.standard_normal((2, 32, 3)).astype(np.float32)
    m = np.asarray(approx_match(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(m.sum(axis=2), 1.0, atol=0.05)  # row mass
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=0.05)  # col mass
    assert (m >= 0).all()


def test_emd_shifted_cloud():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 32, 3)).astype(np.float32) * 0.1
    y = x + np.array([1.0, 0, 0], np.float32)
    d = float(earth_mover_distance(jnp.asarray(x), jnp.asarray(y))[0])
    assert abs(d - 1.0) < 0.1     # pure translation: EMD ~ shift distance


def test_emd_cd_paired():
    rng = np.random.default_rng(4)
    s = rng.standard_normal((4, 32, 3)).astype(np.float32) * 0.3
    out = emd_cd(s, s)
    np.testing.assert_allclose(np.asarray(out["CD"]), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["fscore"]), 1.0)
    assert (np.asarray(out["EMD"]) < 1e-3).all()


def test_pairwise_and_mmd_cov():
    rng = np.random.default_rng(5)
    ref = rng.standard_normal((6, 24, 3)).astype(np.float32) * 0.3
    sample = ref + 0.001 * rng.standard_normal((6, 24, 3)).astype(np.float32)
    cd, emd = pairwise_emd_cd(sample, ref, batch_size=4)
    assert cd.shape == (6, 6)
    # nearest reference of sample i is reference i
    np.testing.assert_array_equal(cd.argmin(axis=1), np.arange(6))
    res = lgan_mmd_cov(cd)
    assert res["lgan_cov"] == 1.0
    assert res["lgan_mmd"] < 1e-3


def test_knn_classifier_indistinguishable_sets():
    """Identically-distributed sets -> 1-NNA accuracy ~ 0.5."""
    rng = np.random.default_rng(6)
    n = 60
    d_all = rng.uniform(1, 2, (2 * n, 2 * n))
    d_all = (d_all + d_all.T) / 2
    res = knn_classifier(d_all[:n, :n], d_all[:n, n:], d_all[n:, n:], k=1)
    assert 0.3 < res["acc"] < 0.7


def test_knn_classifier_separable_sets():
    n = 20
    near = np.ones((n, n)) * 0.1
    far = np.ones((n, n)) * 10.0
    res = knn_classifier(near, far, near, k=1)
    assert res["acc"] == 1.0       # perfectly separable -> accuracy 1


def test_compute_all_metrics_keys():
    rng = np.random.default_rng(7)
    ref = rng.standard_normal((4, 16, 3)).astype(np.float32) * 0.3
    sample = rng.standard_normal((4, 16, 3)).astype(np.float32) * 0.3
    res = compute_all_metrics(sample, ref, batch_size=2)
    for key in ("lgan_mmd-CD", "lgan_cov-CD", "lgan_mmd-EMD", "lgan_cov-EMD",
                "1-NN-CD-acc", "1-NN-EMD-acc"):
        assert key in res, key
        assert np.isfinite(res[key])


def test_jsd():
    rng = np.random.default_rng(8)
    a = rng.uniform(-0.4, 0.4, (8, 128, 3)).astype(np.float32)
    same = jsd_between_point_cloud_sets(a, a, resolution=12)
    assert same < 1e-9
    b = np.abs(a)     # half-space only -> different occupancy
    diff = jsd_between_point_cloud_sets(a, b, resolution=12)
    assert diff > 0.05
    with pytest.raises(ValueError):
        jensen_shannon_divergence(np.array([-1.0, 1]), np.array([1.0, 1]))
