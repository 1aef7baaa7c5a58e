"""End-to-end prediction parity against the NumPy reference engine (the
transcribed Julia recursions) — the BASELINE.md 1e-6 gate."""
import numpy as np

import deepstructuredmixtures_tpu as dsm

from .reference_engine import make_engine

rng = np.random.default_rng(0)
N = 350
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 4 * np.pi) + rng.normal(0, 0.2, N)
XT = np.linspace(-0.1, 1.1, 83).reshape(-1, 1)


def test_dsmgp_predict_parity_uniform_weights():
    m = dsm.build_dsmgp(X, Y, V=3, K=3, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=11)
    eng = make_engine(m)
    mu, var = m.predict(XT)
    omu, ovar = eng.predict(XT)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6)


def test_dsmgp_predict_parity_posterior_weights():
    m = dsm.build_dsmgp(X, Y, V=2, K=4, M=25, kernel=dsm.IsoSE(0.3, 0.1),
                        log_noise=-0.7, seed=13)
    z = m.update()
    eng = make_engine(m)
    oz = eng.update()
    assert abs(z - oz) < 1e-8
    mu, var = m.predict(XT)
    omu, ovar = eng.predict(XT)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6)


def test_mll_parity():
    m = dsm.build_dsmgp(X, Y, V=2, K=3, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=17)
    eng = make_engine(m)
    assert abs(m.mll() - eng.mll()) < 1e-8


def test_poe_gpoe_rbcm_parity():
    for builder, refname in [
        (lambda: dsm.build_poe(X, Y, K=4, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                               log_noise=-1.0, seed=19), "predict_poe"),
        (lambda: dsm.build_poe(X, Y, K=4, generalized=True, M=20,
                               kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0,
                               seed=19), "predict_gpoe"),
        (lambda: dsm.build_bcm(X, Y, K=4, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                               log_noise=-1.0, seed=19), "predict_rbcm"),
    ]:
        m = builder()
        eng = make_engine(m)
        mu, var = m.predict(XT)
        omu, ovar = getattr(eng, refname)(XT)
        np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6,
                                   err_msg=refname)
        np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6,
                                   err_msg=refname)


def test_single_leaf_dsmgp_equals_exact_gp():
    """A DSMGP degenerate to one leaf must equal the exact GP posterior
    (SURVEY §4 oracle 2)."""
    Xs, Ys = X[:80], Y[:80]
    m = dsm.build_dsmgp(Xs, Ys, V=1, K=1, M=200, depth=0,
                        kernel=dsm.IsoSE(0.2, 0.1), log_noise=-1.0, seed=23)
    assert m.num_leaves == 1
    gp = dsm.GaussianProcess(Xs, Ys, kernel=dsm.IsoSE(0.2, 0.1), log_noise=-1.0)
    mu, var = m.predict(XT)
    gmu, gvar = gp.predict(XT)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(gmu), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), np.asarray(gvar), atol=1e-8)
    assert abs(m.mll() - gp.mll()) < 1e-8


def test_kernel_mixture_model():
    kernels = [dsm.IsoSE(0.0, 0.0), dsm.IsoLinear(0.0)]
    m = dsm.build_dsmgp(X, Y, V=2, K=2, M=30, kernel=kernels,
                        log_noise=-1.0, seed=29)
    assert set(np.unique(m.plan.leaf_kernelid)) == {0, 1}
    m.update()
    eng = make_engine(m)
    eng.update()
    mu, var = m.predict(XT)
    omu, ovar = eng.predict(XT)
    np.testing.assert_allclose(np.asarray(mu), omu, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6, rtol=1e-6)


def test_mean_fast_path_matches_full_predict():
    """predict(return_var=False) on a light-store model takes the cached-
    alpha O(n·t) cross-gram path; it must equal the full factor-cached
    predict's mean exactly (same μ = m + K_nt'α, gaussianprocess.jl:118,
    through the same routed moment match). Covers tied AND untied
    (finetuned-style) hypers, posterior weights, and cache staleness."""
    m = dsm.build_dsmgp(X, Y, V=2, K=4, M=25, kernel=dsm.IsoSE(0.3, 0.1),
                        log_noise=-0.7, seed=13)
    m.update()
    mu_full, _ = m.predict(XT)

    m.fit(store="light")
    assert m.posterior.chol is None and m._alpha_cache is not None
    mu_fast = m.predict(XT, return_var=False)
    assert any(k[0] == "predict_routed_mean" for k in m._jit_cache)
    np.testing.assert_allclose(np.asarray(mu_fast), np.asarray(mu_full),
                               atol=1e-9, rtol=1e-9)

    # untied per-leaf hypers
    L = m.num_leaves
    H = np.tile(np.asarray(m.theta), (L, 1))
    H[:, 0] += np.linspace(-0.2, 0.2, L)
    m.set_params(H)
    assert m._alpha_cache is None  # stale on hyper change
    m.fit(store="full")
    m.update()
    mu_full2, _ = m.predict(XT)
    m.fit(store="light")
    mu_fast2 = m.predict(XT, return_var=False)
    np.testing.assert_allclose(np.asarray(mu_fast2), np.asarray(mu_full2),
                               atol=1e-9, rtol=1e-9)

    # cache_alpha=False: no fast path, return_var=False still mean-only
    m.fit(store="light", cache_alpha=False)
    assert m._alpha_cache is None
    mu_stream = m.predict(XT, return_var=False)
    np.testing.assert_allclose(np.asarray(mu_stream), np.asarray(mu_full2),
                               atol=1e-9, rtol=1e-9)


def test_f64_combine_default_on_f32_model(monkeypatch):
    """The SPN combine (weight update + log-space moment matching) runs in
    f64 by DEFAULT on f32 models (VERDICT r4 item 1): the f32 combine's
    E[mu^2]-mean^2 cancellation floors the end-to-end variance at ~2e-3
    while the f32 leaves sit at ~1e-5. Gate: the combined outputs must
    match the f64 host replica applied to the PROGRAM'S OWN f32 leaf
    moments to f64 precision; DSMGP_F32_COMBINE=1 restores the f32 path."""
    import jax
    import jax.numpy as jnp

    import bench as benchmod
    from deepstructuredmixtures_tpu import fit as fitlib
    from deepstructuredmixtures_tpu import infer as inferlib
    from deepstructuredmixtures_tpu.models import _routed_moment_match

    m = dsm.build_dsmgp(X, Y, V=2, K=4, M=25, kernel=dsm.IsoSE(0.3, 0.1),
                        log_noise=-0.7, seed=13, dtype=jnp.float32,
                        do_fit=False)
    layout, plan = m.layout, m.plan
    ids, L = m.bucket_spec.leaf_ids, m.num_leaves
    T = XT.shape[0]
    tidx, tmask = m._route(XT)
    ti, tm = jnp.asarray(tidx), jnp.asarray(tmask)
    xtd = jnp.asarray(XT, jnp.float32)

    @jax.jit
    def program(theta, batches):
        mu, var, mll = fitlib.bucketed_streamed_predict(
            layout, theta, batches, ids, L, xtd, ti, tm)
        lw, z = inferlib.update_weights(plan, mll)
        mean, v = _routed_moment_match(plan, mu, var, lw, ti, tm, T)
        return z, mean, v, mll, mu, var

    z, mean, v, mll, mu, var = program(m.theta, m.bucket_batches)
    assert mll.dtype == jnp.float32        # leaf programs stay f32
    assert mean.dtype == jnp.float64       # combine epilogue is f64

    # f64 host replica on the program's own f32 leaf moments: must agree
    # to f64 roundoff (was ~2e-4 under the f32 combine at this scale)
    lw64, z64 = benchmod._np_update_weights(
        plan, np.asarray(mll, np.float64))
    m64, v64 = benchmod._np_moment_match(
        plan, np.asarray(mu, np.float64), np.asarray(var, np.float64),
        lw64, tidx, tmask, T)
    assert abs(float(z) - z64) <= 1e-12 * abs(z64)
    np.testing.assert_allclose(np.asarray(mean), m64, atol=1e-12, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v), v64, rtol=1e-11)

    # A/B switch: DSMGP_F32_COMBINE=1 keeps everything f32
    # (fresh jit: the switch is read at trace time)
    monkeypatch.setenv("DSMGP_F32_COMBINE", "1")

    @jax.jit
    def program_f32(theta, batches):
        mu, var, mll = fitlib.bucketed_streamed_predict(
            layout, theta, batches, ids, L, xtd, ti, tm)
        lw, z = inferlib.update_weights(plan, mll)
        mean, v = _routed_moment_match(plan, mu, var, lw, ti, tm, T)
        return mean, v

    mean_f32, v_f32 = program_f32(m.theta, m.bucket_batches)
    assert mean_f32.dtype == jnp.float32
    assert v_f32.dtype == jnp.float32
