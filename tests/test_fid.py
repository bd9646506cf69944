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


def test_compute_fid_pipeline(tmp_path):
    """scripts/tools/compute_fid.py end-to-end on synthetic dumps + folder
    (proxy features: plumbing validation; real FID requires
    DQVQ_INCEPTION_WEIGHTS — see script docstring)."""
    import pickle
    import subprocess
    import sys
    import json as _json

    import numpy as np
    from PIL import Image

    g = np.random.default_rng(0)
    dumps = tmp_path / "numpys"
    dumps.mkdir()
    for i in range(2):
        arr = (g.random((8, 32, 32, 3)) * 255).astype(np.uint8)
        with open(dumps / f"batch_{i}.pkl", "wb") as f:
            pickle.dump(arr, f)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(16):
        Image.fromarray((g.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            data / f"{i}.png"
        )

    out = subprocess.run(
        [sys.executable, "scripts/tools/compute_fid.py", "--a", str(dumps),
         "--b", str(data), "--proxy_features", "--size", "32"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    res = _json.loads(out.stdout.strip().splitlines()[-1])
    assert res["metric"] == "proxy_fid"
    assert np.isfinite(res["value"]) and res["value"] >= 0

    # same distribution -> (near) zero
    out2 = subprocess.run(
        [sys.executable, "scripts/tools/compute_fid.py", "--a", str(dumps),
         "--b", str(dumps), "--proxy_features", "--size", "32"],
        capture_output=True, text=True, timeout=300,
    )
    res2 = _json.loads(out2.stdout.strip().splitlines()[-1])
    assert res2["value"] < res["value"] * 0.1
