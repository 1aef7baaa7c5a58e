"""Introspection helpers (≙ common.jl/fit.jl misc queries)."""
import numpy as np

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.utils.profiling import PhaseTimer

rng = np.random.default_rng(0)
N = 200
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 5) + rng.normal(0, 0.1, N)


def _model(seed=1):
    return dsm.build_dsmgp(X, Y, V=2, K=2, M=25, kernel=dsm.IsoSE(0.0, 0.0),
                           log_noise=-1.0, seed=seed)


def test_blockmatrix_weighted_cooccurrence():
    m = _model()
    B = dsm.blockmatrix(m)
    assert B.shape == (N, N)
    assert np.allclose(B, B.T)
    # each observation co-occurs with itself in every mixture branch with
    # total weight = number of split-leaves on each root path = positive
    assert np.all(np.diag(B) > 0)
    Bb = dsm.blockmatrix(m, best=True)
    assert Bb.shape == (N, N)
    assert set(np.unique(Bb)).issubset({0.0, 1.0, 2.0, 3.0, 4.0})


def test_observation_counts():
    m = _model()
    P = dsm.observation_counts(m)
    assert np.all(np.diag(P) == 0)
    # direct recomputation
    want = np.zeros((N, N), dtype=np.int64)
    for obs in m.plan.leaf_obs:
        want[np.ix_(obs, obs)] += 1
    np.fill_diagonal(want, 0)
    np.testing.assert_array_equal(P, want)


def test_blockindecies():
    m = _model()
    ix = dsm.blockindecies(m)
    assert len(ix) == N
    # every obs appears in its own co-occurrence list
    assert all(n in ix[n] for n in range(N))


def test_get_log_noise_constant_for_tied():
    m = _model()
    m.update()
    xt = np.linspace(0.2, 0.8, 9).reshape(-1, 1)
    ln = dsm.get_log_noise(m, xt)
    # tied hypers + normalized mixture weights → logsumexp(pw + c) = c
    np.testing.assert_allclose(ln, -1.0, atol=1e-10)


def test_left_right_gp_and_warm_start():
    m = _model()
    gpl = dsm.left_gp(m)
    gpr = dsm.right_gp(m)
    assert gpl.n == m.plan.leaf_obs[0].size
    assert gpr.n == m.plan.leaf_obs[-1].size
    # leftGP-based warm start (README.md:58-71): leaf params == tied params
    logl, logsigma, lognoise = gpl.params()
    np.testing.assert_allclose(
        np.concatenate([logl, [logsigma, lognoise]]), m.get_params()
    )
    # leaf mll must match the batched engine's value for that leaf
    assert abs(gpl.mll() - float(m.leaf_mlls()[0])) < 1e-9


def test_rand_init_changes_params():
    m = _model()
    before = m.get_params().copy()
    dsm.rand_init(m, seed=0)
    assert not np.allclose(m.get_params(), before)
    assert np.isfinite(m.mll())


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts()["a"] == 2
    assert "a" in t.report()
