"""Randomized structural parity fuzz: many tree shapes / kernels / dims,
each gated against the transcribed-reference engine at float64.

Covers corners the targeted tests don't reach: deep trees, non-sum roots,
kernel mixtures over multi-D data, tiny experts, duplicated inputs
(ill-conditioned grams), posterior vs uniform weights, and the infer!
variant — all through the public API.
"""
import numpy as np
import pytest

import deepstructuredmixtures_tpu as dsm

from .reference_engine import make_engine

CASES = [
    # (seed, N, D, V, K, M, depth, kernels, sum_root)
    (0, 260, 1, 2, 2, 15, 3, dsm.IsoSE(0.2, 0.0), True),
    (1, 300, 2, 3, 2, 25, 2, dsm.IsoSE(-0.3, 0.2), True),
    (2, 280, 1, 1, 5, 20, 2, dsm.IsoSE(0.0, 0.0), False),
    (3, 320, 3, 2, 3, 30, 2, dsm.ArdSE([0.1, -0.1, 0.3], 0.1), True),
    (4, 240, 1, 2, 2, 18, 2, [dsm.IsoSE(0.0, 0.0), dsm.IsoLinear(0.5)], True),
    (5, 300, 2, 2, 2, 25, 2, [dsm.ArdSE([0.0, 0.0], 0.0),
                              dsm.ArdLinear([0.2, -0.2])], True),
    (6, 200, 1, 4, 2, 12, 2, dsm.IsoSE(0.5, -0.5), True),
    (7, 350, 1, 2, 4, 30, 3, dsm.IsoSE(-0.5, 0.3), True),
    # deep 1-D tree with many head-overlapping leaf pairs — exercises the
    # generalized delete-then-continue schedule entries at depth
    (8, 400, 1, 3, 4, 15, 3, dsm.IsoSE(-0.2, 0.1), True),
    # 4-D kernel mixture (ARD SE + ARD Linear)
    (9, 330, 4, 2, 2, 30, 2, [dsm.ArdSE([0.0, 0.1, -0.1, 0.2], 0.0),
                              dsm.ArdLinear([0.2, -0.2, 0.0, 0.1])], True),
]


def _data(seed, N, D, duplicates=False):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, (N, D))
    if duplicates:
        X[: N // 10] = X[N // 10 : 2 * (N // 10)]  # repeated rows
    y = np.sin(3 * X[:, 0]) + (X[:, 1] if D > 1 else 0.0) + 0.1 * rng.standard_normal(N)
    return X, y


@pytest.mark.parametrize("case", CASES, ids=[f"cfg{c[0]}" for c in CASES])
def test_random_config_parity(case):
    seed, N, D, V, K, M, depth, kern, sum_root = case
    X, y = _data(seed, N, D)
    m = dsm.build_dsmgp(X, y, V=V, K=K, M=M, depth=depth, kernel=kern,
                        log_noise=-1.0, sum_root=sum_root, seed=seed + 100)
    eng = make_engine(m)

    # root mll under uniform weights
    assert abs(m.mll() - eng.mll()) < 1e-8

    # posterior update (log evidence) + weighted prediction
    z = m.update()
    oz = eng.update()
    assert abs(z - oz) < 1e-8

    rng = np.random.default_rng(seed)
    xt = rng.uniform(-0.1, 1.1, (41, D))
    mu, var = m.predict(xt)
    omu, ovar = eng.predict(xt)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6)

    # shared-Cholesky fit reproduces the same leaf likelihoods
    m.fit(method="shared")
    mll_s = np.asarray(m.leaf_mlls())
    m.fit(method="batched")
    np.testing.assert_allclose(mll_s, np.asarray(m.leaf_mlls()),
                               atol=1e-7, rtol=1e-9)


def test_duplicated_inputs_still_finite():
    """Repeated rows make leaf grams maximally ill-conditioned; the jitter
    + float64 must keep everything finite and parity within looser bounds."""
    X, y = _data(9, 300, 1, duplicates=True)
    m = dsm.build_dsmgp(X, y, V=2, K=3, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-2.0, seed=9)
    z = m.update()
    assert np.isfinite(z)
    mu, var = m.predict(np.linspace(0, 1, 31).reshape(-1, 1))
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.asarray(var) > 0)
