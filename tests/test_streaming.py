"""Memory-bounded (streamed) fit/predict must match the cached-factor path."""
import numpy as np

import deepstructuredmixtures_tpu as dsm

rng = np.random.default_rng(0)
N = 280
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 4 * np.pi) + rng.normal(0, 0.2, N)
XT = np.linspace(-0.05, 1.05, 41).reshape(-1, 1)


def test_light_fit_matches_full():
    m = dsm.build_dsmgp(X, Y, V=2, K=3, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=1, do_fit=False)
    m.fit(store="full")
    mll_full = np.asarray(m.posterior.mll)
    alpha_full = np.asarray(m.posterior.alpha)
    m.fit(store="light", chunk=3)
    assert m.posterior.chol is None
    assert m.posterior.alpha is None  # light mode keeps only the mlls
    assert alpha_full.shape[0] == m.num_leaves
    np.testing.assert_allclose(np.asarray(m.posterior.mll), mll_full, atol=1e-12)


def test_streamed_dsmgp_predict_matches_cached():
    m = dsm.build_dsmgp(X, Y, V=2, K=3, M=20, kernel=dsm.IsoSE(0.2, 0.1),
                        log_noise=-1.0, seed=2)
    m.update()
    mu0, var0 = map(np.asarray, m.predict(XT))
    m.fit(store="light", chunk=4)
    m.update()
    mu1, var1 = map(np.asarray, m.predict(XT))
    np.testing.assert_allclose(mu1, mu0, atol=1e-10)
    np.testing.assert_allclose(var1, var0, atol=1e-10)


def test_streamed_poe_predict_matches_cached():
    m = dsm.build_poe(X, Y, K=4, M=20, generalized=True,
                      kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0, seed=3)
    mu0, var0 = map(np.asarray, m.predict(XT))
    m.fit(store="light", chunk=2)
    mu1, var1 = map(np.asarray, m.predict(XT))
    np.testing.assert_allclose(mu1, mu0, atol=1e-10)
    np.testing.assert_allclose(var1, var0, atol=1e-10)
