"""Distributed blocked Cholesky / solves vs dense oracles on the fake mesh.

The multi-chip "leaf bigger than one chip" path (SURVEY §5): row-sharded
right-looking Cholesky with panel broadcast over the mesh, distributed
forward substitution, and the full giant-leaf GP fit, each checked against
single-matrix float64 oracles.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepstructuredmixtures_tpu.parallel import make_mesh
from deepstructuredmixtures_tpu.parallel.dist_chol import (
    sharded_cholesky,
    sharded_gp_fit,
    sharded_solve_lower,
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


@pytest.mark.parametrize("block", [64, 128])
def test_sharded_cholesky_matches_dense(block):
    mesh = make_mesh(8)
    N = 1024
    A = _spd(N)
    L = np.asarray(sharded_cholesky(jnp.asarray(A), mesh, block=block))
    Lref = np.linalg.cholesky(A)
    assert np.abs(L - Lref).max() < 1e-8 * N
    assert np.abs(np.triu(L, 1)).max() == 0.0


def test_sharded_solve_lower_matches_dense():
    mesh = make_mesh(8)
    N = 512
    A = _spd(N, seed=1)
    Lref = np.linalg.cholesky(A)
    b = np.random.default_rng(2).standard_normal(N)
    x = np.asarray(
        sharded_solve_lower(jnp.asarray(Lref), jnp.asarray(b), mesh, block=64)
    )
    xref = np.linalg.solve(Lref, b)
    assert np.abs(x - xref).max() < 1e-9 * N


def test_sharded_solve_lower_t_matches_dense():
    from deepstructuredmixtures_tpu.parallel import sharded_solve_lower_t

    mesh = make_mesh(8)
    N = 512
    A = _spd(N, seed=4)
    Lref = np.linalg.cholesky(A)
    z = np.random.default_rng(5).standard_normal(N)
    x = np.asarray(
        sharded_solve_lower_t(jnp.asarray(Lref), jnp.asarray(z), mesh, block=64)
    )
    xref = np.linalg.solve(Lref.T, z)
    assert np.abs(x - xref).max() < 1e-9 * N


def test_invalid_block_raises():
    from deepstructuredmixtures_tpu.parallel import sharded_solve_lower_t

    mesh = make_mesh(8)
    N = 1024  # rows per device = 128
    A = _spd(100, seed=6)  # 100 not divisible by 8 devices
    L = np.linalg.cholesky(_spd(N, seed=6))
    b = np.zeros(N)
    for fn in (sharded_cholesky,):
        with pytest.raises(ValueError):
            fn(jnp.asarray(L @ L.T), mesh, block=96)
    with pytest.raises(ValueError):
        sharded_solve_lower(jnp.asarray(L), jnp.asarray(b), mesh, block=96)
    with pytest.raises(ValueError):
        sharded_solve_lower_t(jnp.asarray(L), jnp.asarray(b), mesh, block=96)
    with pytest.raises(ValueError):
        # N not divisible by mesh size
        sharded_cholesky(jnp.asarray(A), mesh, block=32)


def test_sharded_gp_fit_matches_exact_gp():
    import scipy.linalg as sla

    mesh = make_mesh(8)
    N = 512
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 6) + 0.1 * rng.standard_normal(N)
    logl, logsigma, lognoise = -1.0, 0.0, -1.5

    alpha, mll = sharded_gp_fit(
        jnp.asarray(x), jnp.asarray(y), logl, logsigma, lognoise, mesh,
        block=64,
    )

    d2 = (x[:, None, 0] - x[None, :, 0]) ** 2
    K = np.exp(2 * logsigma) * np.exp(-0.5 * d2 * np.exp(-2 * logl))
    K[np.diag_indices_from(K)] += np.exp(2 * lognoise) + 1e-8
    Lref = np.linalg.cholesky(K)
    aref = sla.cho_solve((Lref, True), y)
    mll_ref = -0.5 * (
        y @ aref + 2 * np.log(np.diag(Lref)).sum() + N * np.log(2 * np.pi)
    )
    assert np.abs(np.asarray(alpha) - aref).max() < 1e-6
    assert abs(float(mll) - mll_ref) < 1e-6 * max(1.0, abs(mll_ref))

    # ragged N: pad x/y up to the tiling and pass valid_n — padding rows
    # are masked to identity and must not perturb alpha or the mll.
    pad = 512 + 3 * 64  # not divisible by 8*64 -> pad to 1024
    Np = 1024
    xp = np.zeros((Np, 1))
    xp[:pad] = 0.0
    xp[: N] = x
    yp = np.zeros(Np)
    yp[:N] = y
    alpha_p, mll_p = sharded_gp_fit(
        jnp.asarray(xp), jnp.asarray(yp), logl, logsigma, lognoise, mesh,
        block=64, valid_n=N,
    )
    assert np.abs(np.asarray(alpha_p)[:N] - aref).max() < 1e-6
    assert np.abs(np.asarray(alpha_p)[N:]).max() == 0.0
    assert abs(float(mll_p) - mll_ref) < 1e-6 * max(1.0, abs(mll_ref))


def test_sharded_solve_lower_matrix_rhs():
    mesh = make_mesh(8)
    N, T = 512, 9
    A = _spd(N, seed=5)
    L = np.linalg.cholesky(A)
    rng = np.random.default_rng(6)
    B = rng.standard_normal((N, T))
    X = sharded_solve_lower(jnp.asarray(L), jnp.asarray(B), mesh, block=64)
    import scipy.linalg as sla

    Xref = sla.solve_triangular(L, B, lower=True)
    assert np.abs(np.asarray(X) - Xref).max() < 1e-8


def test_giant_gp_model_layer_distributed_fit_predict():
    """The model-layer route for experts past one chip:
    GaussianProcess.fit(mesh=...) + predict must match the dense
    single-device GP (including automatic padding to the mesh tiling)."""
    import deepstructuredmixtures_tpu as dsm

    mesh = make_mesh(8)
    N = 700  # deliberately NOT divisible by 8*64 — exercises the padding
    rng = np.random.default_rng(9)
    x = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 6) + 0.1 * rng.standard_normal(N)
    kern = dsm.IsoSE(-1.0, 0.0)

    gp_d = dsm.GaussianProcess(x, y, kernel=kern, log_noise=-1.5).fit(
        mesh=mesh, block=64
    )
    gp_s = dsm.GaussianProcess(x, y, kernel=kern, log_noise=-1.5).fit()

    assert abs(gp_d.mll() - gp_s.mll()) < 1e-8 * max(1.0, abs(gp_s.mll()))
    xt = np.linspace(-0.1, 1.1, 33).reshape(-1, 1)
    mu_d, var_d = gp_d.predict(xt)
    mu_s, var_s = gp_s.predict(xt)
    np.testing.assert_allclose(np.asarray(mu_d), np.asarray(mu_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_d), np.asarray(var_s), atol=1e-8)

    # set_params must NOT silently drop the distributed configuration —
    # the refit after a hyper change stays on the mesh (a single-device
    # rebuild of the [N, N] covariance is exactly what the mesh avoids).
    new_theta = np.asarray(gp_d.theta) + 0.05
    gp_d.set_params(new_theta)
    gp_s.set_params(new_theta)
    mu_d2, var_d2 = gp_d.predict(xt)  # triggers the remembered-mesh refit
    assert gp_d._mesh is not None, "distributed config lost by set_params"
    mu_s2, var_s2 = gp_s.predict(xt)
    np.testing.assert_allclose(np.asarray(mu_d2), np.asarray(mu_s2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_d2), np.asarray(var_s2), atol=1e-8)


def test_tree_model_oversized_leaves_route_to_dist_chol():
    """model.fit(mesh=) — a tree model whose leaves exceed the synthetic
    HBM budget routes those leaves through the distributed Cholesky; leaf
    mlls, routed DSMGP prediction, and PoE prediction must match the
    single-device oracle (VERDICT r2 item 6: the 'long-context' story for
    tree leaves, ≙ gaussianprocess.jl:87-108 without the one-host cap)."""
    import deepstructuredmixtures_tpu as dsm

    mesh = make_mesh(8)
    rng = np.random.default_rng(21)
    N = 400
    x = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 5) + 0.1 * rng.standard_normal(N)

    m_ref = dsm.build_dsmgp(x, y, V=2, K=2, M=40, kernel=dsm.IsoSE(0.0, 0.0),
                            log_noise=-1.0, seed=3)
    m_d = dsm.build_dsmgp(x, y, V=2, K=2, M=40, kernel=dsm.IsoSE(0.0, 0.0),
                          log_noise=-1.0, seed=3, do_fit=False)
    # budget sized so only the LARGEST bucket exceeds it -> mixed path
    sizes = sorted(b.nmax for b in m_d.bucket_batches)
    budget = (sizes[-1] ** 2) * 8 - 1 if len(sizes) == 1 else (
        (sizes[-2] ** 2) * 8
    )
    m_d.fit(mesh=mesh, giant_leaf_bytes=budget, block=16)
    assert m_d.last_fit_diagnostics["distributed_leaves"] >= 1
    assert len(m_d._giant) < m_d.num_leaves or len(sizes) == 1

    np.testing.assert_allclose(
        np.asarray(m_d.leaf_mlls()), np.asarray(m_ref.leaf_mlls()),
        atol=1e-8, rtol=1e-10,
    )
    z_d, z_r = m_d.update(), m_ref.update()
    assert abs(z_d - z_r) < 1e-8

    xt = np.linspace(-0.05, 1.05, 41).reshape(-1, 1)
    mu_d, var_d = m_d.predict(xt)
    mu_r, var_r = m_ref.predict(xt)
    np.testing.assert_allclose(np.asarray(mu_d), np.asarray(mu_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_d), np.asarray(var_r), atol=1e-8)

    # every-leaf-is-giant extreme + PoE-family predict path
    p_d = dsm.build_poe(x, y, K=3, M=40, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=4, do_fit=False)
    p_r = dsm.build_poe(x, y, K=3, M=40, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=4)
    p_d.fit(mesh=mesh, giant_leaf_bytes=1, block=16)
    assert p_d.last_fit_diagnostics["distributed_leaves"] == p_d.num_leaves
    mu_d, var_d = p_d.predict(xt)
    mu_r, var_r = p_r.predict(xt)
    np.testing.assert_allclose(np.asarray(mu_d), np.asarray(mu_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_d), np.asarray(var_r), atol=1e-8)

    # MIXED normal+giant PoE predict: exercises the writable-copy fix in
    # _leaf_predict_all (np.asarray of a float64 jax array is a read-only
    # zero-copy view; assigning giant rows into it crashed)
    p_m = dsm.build_poe(x, y, K=3, M=40, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=4, do_fit=False)
    psizes = sorted(b.nmax for b in p_m.bucket_batches)
    if len(psizes) > 1:
        p_m.fit(mesh=mesh, giant_leaf_bytes=(psizes[-2] ** 2) * 8, block=16)
        assert 0 < p_m.last_fit_diagnostics["distributed_leaves"] < p_m.num_leaves
        mu_m, var_m = p_m.predict(xt)
        np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_r), atol=1e-8)
        np.testing.assert_allclose(np.asarray(var_m), np.asarray(var_r), atol=1e-8)

    # refine after fit(mesh=) has no distributed path -> explicit error
    import pytest

    with pytest.raises(ValueError, match="refine_steps"):
        m_d.predict(xt, refine_steps=1)

    # multi-axis meshes need an explicit axis
    import jax
    from jax.sharding import Mesh

    multi = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("a", "b"))
    with pytest.raises(ValueError, match="single mesh axis"):
        m_d.fit(mesh=multi, giant_leaf_bytes=1, block=16)

    # set_params invalidates the mesh-resident factors
    m_d.set_params(np.asarray(m_d.get_params()) + 0.1)
    assert m_d._giant is None


def test_mesh_fit_alpha_mean_fast_path_and_jit_persistence():
    """fit(mesh=, cache_alpha=True) (the default) must (a) keep the
    normal buckets' alpha cache so predict(return_var=False) serves the
    exact mean without restreaming factorizations — giant leaves via
    their mesh-fit alphas — and (b) retain the compiled normal-bucket
    programs across refits with an unchanged normal/giant split (a
    refit-then-serve cycle must not retrace)."""
    import pytest
    import deepstructuredmixtures_tpu as dsm

    mesh = make_mesh(8)
    rng = np.random.default_rng(33)
    N = 400
    x = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 5) + 0.1 * rng.standard_normal(N)

    m_ref = dsm.build_dsmgp(x, y, V=3, K=2, M=30, kernel=dsm.IsoSE(0.0, 0.0),
                            log_noise=-1.0, seed=5)
    m_d = dsm.build_dsmgp(x, y, V=3, K=2, M=30, kernel=dsm.IsoSE(0.0, 0.0),
                          log_noise=-1.0, seed=5, do_fit=False)
    sizes = sorted(b.nmax for b in m_d.bucket_batches)
    assert len(sizes) >= 2, "test tree must span two size classes"
    budget = (sizes[-2] ** 2) * 8
    m_d.fit(mesh=mesh, giant_leaf_bytes=budget, block=16)
    assert m_d._alpha_cache is not None  # cache_alpha honored on mesh path
    assert m_d.last_fit_diagnostics["distributed_leaves"] >= 1

    xt = np.linspace(-0.05, 1.05, 41).reshape(-1, 1)
    mu_ref = np.asarray(m_ref.predict(xt)[0])
    mean_fast = np.asarray(m_d.predict(xt, return_var=False))
    assert any(k[0] == "routed_mean" for k in m_d._giant_jit), \
        "mean-only predict did not take the cached-alpha fast path"
    np.testing.assert_allclose(mean_fast, mu_ref, atol=1e-8)

    # (b) refit with the same split: compiled programs must survive
    m_d.predict(xt)  # populate the ("routed", tmax) program too
    progs = dict(m_d._giant_jit)
    m_d.fit(mesh=mesh, giant_leaf_bytes=budget, block=16)
    assert m_d._giant_jit, "giant-jit cache dropped on same-split refit"
    for k, v in progs.items():
        assert m_d._giant_jit.get(k) is v, f"program {k} was retraced"
    # and a changed split must invalidate them
    m_d.fit(mesh=mesh, giant_leaf_bytes=1, block=16)
    assert not any(m_d._giant_jit.get(k) is v for k, v in progs.items())
