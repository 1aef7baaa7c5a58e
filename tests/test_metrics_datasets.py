"""Metrics (≙ scorefunctions.jl) and synthetic datasets (≙ datasets.jl)."""
import numpy as np
from scipy import stats as sps

from deepstructuredmixtures_tpu import mse, sse, mae, sae, nlpd, nonstationary


def test_metrics_against_direct_formulas():
    rng = np.random.default_rng(0)
    y = rng.normal(size=100)
    p = y + rng.normal(0, 0.3, 100)
    se = (y - p) ** 2
    ae = np.abs(y - p)
    assert abs(mse(y, p) - se.mean()) < 1e-12
    assert abs(sse(y, p) - se.std(ddof=1) / 10) < 1e-12
    assert abs(mae(y, p) - ae.mean()) < 1e-12
    assert abs(sae(y, p) - ae.std(ddof=1) / 10) < 1e-12


def test_nlpd_matches_scipy():
    rng = np.random.default_rng(1)
    y = rng.normal(size=50)
    mu = y + rng.normal(0, 0.1, 50)
    var = rng.uniform(0.5, 2.0, 50)
    want = -np.mean(sps.norm.logpdf(y, mu, np.sqrt(var)))
    assert abs(nlpd(y, mu, var) - want) < 1e-12


def test_nonstationary_shapes_and_standardization():
    x, y, noise = nonstationary(500, seed=0)
    assert x.shape == (500, 1)
    assert y.shape == (500,)
    assert noise.shape == (500,)
    # x standardized then scaled by 10 (datasets.jl:17-23)
    assert abs(x.mean()) < 1e-8
    assert abs(x.std(ddof=1) - 10.0) < 1e-8
    # heteroscedastic noise has two bumps
    assert noise.max() / noise.min() > 2.0
