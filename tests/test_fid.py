"""FID math unit tests (feature extraction gated on local weights)."""
import numpy as np
import pytest

from dynamicvectorquantization_tpu.eval.fid import compute_statistics, frechet_distance


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=8)
    a = rng.normal(size=(200, 8))
    sigma = np.cov(a, rowvar=False)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_analytic_mean_shift():
    # identical covariance, mean shift d -> FID = ||d||^2
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 4))
    sigma = np.cov(a, rowvar=False)
    mu1 = np.zeros(4)
    mu2 = np.array([1.0, 2.0, 0.0, 0.0])
    got = frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(got, 5.0, atol=1e-5)


def test_compute_statistics_shapes():
    rng = np.random.default_rng(0)
    feature_fn = lambda x: x.reshape(x.shape[0], -1)[:, :16]
    batches = [rng.normal(size=(8, 4, 4, 3)).astype(np.float32) for _ in range(3)]
    mu, sigma = compute_statistics(batches, feature_fn)
    assert mu.shape == (16,)
    assert sigma.shape == (16, 16)
