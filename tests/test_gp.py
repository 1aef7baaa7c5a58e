"""Exact single-GP parity vs the closed-form oracle (SURVEY §4 oracle 2)."""
import numpy as np
import pytest

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.train import train_gp
from .oracle import OracleGP

rng = np.random.default_rng(1)
N = 40
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 4 * np.pi) + rng.normal(0, 0.2, N)
XT = np.linspace(-0.2, 1.2, 13).reshape(-1, 1)


def test_mll_and_predict_parity():
    gp = dsm.GaussianProcess(X, Y, kernel=dsm.IsoSE(0.3, 0.1), log_noise=-1.0)
    og = OracleGP(X, Y, "iso_se", [0.3], 0.1, -1.0)
    assert abs(gp.mll() - og.mll()) < 1e-9
    mu, var = gp.predict(XT)
    omu, ovar = og.predict(XT)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-9)


def test_full_covariance_diag_consistent():
    gp = dsm.GaussianProcess(X, Y, kernel=dsm.IsoSE(0.0, 0.0), log_noise=-0.5)
    mu, var = gp.predict(XT)
    mu2, Sigma = gp.predict(XT, full_cov=True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(var), np.diag(np.asarray(Sigma)), atol=1e-9)


def test_grad_matches_finite_differences():
    gp = dsm.GaussianProcess(X, Y, kernel=dsm.IsoSE(0.2, -0.1), log_noise=-0.8)
    g = np.asarray(gp.grad_mll())
    theta0 = np.asarray(gp.theta)
    h = 1e-6
    for i in range(theta0.size):
        tp, tm = theta0.copy(), theta0.copy()
        tp[i] += h
        tm[i] -= h
        gp.set_params(tp)
        fp = gp.mll()
        gp.set_params(tm)
        fm = gp.mll()
        fd = (fp - fm) / (2 * h)
        assert abs(g[i] - fd) < 1e-4 * max(1.0, abs(fd))
    gp.set_params(theta0)


@pytest.mark.parametrize("kernel,kind", [
    (dsm.ArdSE([0.3, -0.2], 0.1), "ard_se"),
    (dsm.IsoLinear(0.4), "iso_linear"),
    (dsm.ArdLinear([0.1, 0.2]), "ard_linear"),
])
def test_other_kernels_parity(kernel, kind):
    X2 = rng.normal(size=(30, 2))
    Y2 = X2[:, 0] + np.sin(X2[:, 1]) + rng.normal(0, 0.1, 30)
    gp = dsm.GaussianProcess(X2, Y2, kernel=kernel, log_noise=-1.0)
    og = OracleGP(X2, Y2, kind, list(kernel.logl), kernel.logsigma, -1.0)
    assert abs(gp.mll() - og.mll()) < 1e-9
    mu, var = gp.predict(X2[:5])
    omu, ovar = og.predict(X2[:5])
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-9)


def test_train_gp_improves_mll():
    gp = dsm.GaussianProcess(X, Y, kernel=dsm.IsoSE(0.0, 0.0), log_noise=0.0)
    before = gp.mll()
    hist = train_gp(gp, iterations=200, lam=1e-4, randinit=False)
    assert gp.mll() > before
    assert hist.shape[0] >= 1
