"""The five BASELINE.json gating configs, end-to-end with parity gates.

Each config runs the full user workflow at test scale and is gated against
the NumPy reference engine (the transcribed Julia recursions) or the exact
OracleGP, per BASELINE.md: log-evidence and predictive mean/variance to
1e-6 in float64.
"""
import numpy as np
import optax
import pytest

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.train import finetune, train, train_gp

from .oracle import OracleGP
from .reference_engine import make_engine

rng = np.random.default_rng(42)


def _sine(n, noise=0.2, seed=0):
    r = np.random.default_rng(seed)
    x = np.sort(r.uniform(0, 1, n)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 4 * np.pi) + r.normal(0, noise, n)
    return x, y


def test_config1_exact_gp_readme_example():
    """Exact GaussianProcess, IsoSE + ConstMean, N=100 sine: train + predict."""
    x, y = _sine(100)
    gp = dsm.GaussianProcess(x, y, mean=dsm.ConstMean(float(y.mean())),
                             kernel=dsm.IsoSE(1.0, 1.0), log_noise=-1.0)
    gp.fit()
    oracle = OracleGP(x, y, "iso_se", np.array([1.0]), 1.0, -1.0,
                      mean=float(y.mean()))
    assert abs(gp.mll() - oracle.mll()) < 1e-8
    hist = train_gp(gp, iterations=150, lam=1e-3, randinit=False)
    assert hist[-1] >= hist[0] - 1e-9  # mll ascent improved (or flat)
    xt = np.linspace(-0.1, 1.1, 40).reshape(-1, 1)
    mu, var = gp.predict(xt)
    th = np.asarray(gp.theta, dtype=np.float64)
    oracle2 = OracleGP(x, y, "iso_se", th[:1], float(th[1]), float(th[2]),
                       mean=float(y.mean()))
    omu, ovar = oracle2.predict(xt)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6)


def test_config2_generalized_poe():
    """buildPoE generalized, K=4: batched leaf fits + gPoE fusion parity."""
    x, y = _sine(300, seed=1)
    m = dsm.build_poe(x, y, K=4, generalized=True, M=25,
                      kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0, seed=2)
    xt = np.linspace(-0.1, 1.1, 61).reshape(-1, 1)
    mu, var = m.predict(xt)
    eng = make_engine(m)
    omu, ovar = eng.predict_gpoe(xt)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6)


def test_config3_rbcm():
    """buildBCM: robust-BCM prediction-only fusion parity."""
    x, y = _sine(300, seed=3)
    m = dsm.build_bcm(x, y, K=4, M=25, kernel=dsm.IsoSE(0.2, 0.1),
                      log_noise=-0.8, seed=4)
    xt = np.linspace(-0.1, 1.1, 61).reshape(-1, 1)
    mu, var = m.predict(xt)
    eng = make_engine(m)
    omu, ovar = eng.predict_rbcm(xt)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6)


def test_config4_dsmgp_v1_shared_fit_update():
    """DSMGP V=1, K=4: shared-Cholesky fit + exact posterior update parity."""
    x, y = _sine(400, seed=5)
    m = dsm.build_dsmgp(x, y, V=1, K=4, M=25, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=6, do_fit=False)
    m.fit(method="shared")
    z = m.update()
    eng = make_engine(m)
    oz = eng.update()
    assert abs(z - oz) < 1e-8, f"log-evidence mismatch {z} vs {oz}"
    # shared factors numerically equal fresh ones
    mll_s = np.asarray(m.leaf_mlls()).copy()
    m.fit(method="batched")
    mll_b = np.asarray(m.leaf_mlls())
    np.testing.assert_allclose(mll_s, mll_b, atol=1e-8, rtol=1e-10)


def test_config5_dsmgp_ardse_multid_warmstart_finetune():
    """Full DSMGP V=3, K=4, additive-ARD SE on 4-D data with the README
    warm-start recipe and per-leaf fine-tuning."""
    r = np.random.default_rng(7)
    N, D = 500, 4
    X = r.uniform(0, 1, (N, D))
    Y = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2 - 0.5 * X[:, 2]
         + 0.1 * r.standard_normal(N))
    kern = dsm.ArdSE([0.0] * D, 0.0)

    # stage 1: shallow model, tied training
    m1 = dsm.build_dsmgp(X, Y, V=1, K=4, M=40, kernel=kern, log_noise=-1.0,
                         seed=8)
    train(m1, optax.adam(3e-2), iterations=40, lam=1e-6, randinit=False)
    hyp = m1.get_params()
    assert hyp.shape == (D + 2,)

    # stage 2: deep model warm-started from stage 1
    m = dsm.build_dsmgp(X, Y, V=3, K=4, M=40, kernel=kern, log_noise=-1.0,
                        seed=9)
    base = m.mll()
    m.set_params(hyp)
    m.fit()
    warm = m.mll()
    assert np.isfinite(warm)

    # parity of the warm-started model against the reference engine
    z = m.update()
    eng = make_engine(m)
    assert abs(z - eng.update()) < 1e-8
    xt = r.uniform(0, 1, (31, D))
    mu, var = m.predict(xt)
    omu, ovar = eng.predict(xt)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6)

    # stage 3: untied per-leaf fine-tuning improves (or holds) the root mll
    hist = finetune(m, optax.adam(1e-2), iterations=4)
    assert np.all(np.isfinite(hist))
    H = m.theta
    assert H.ndim == 2 and H.shape == (m.num_leaves, D + 2)
