"""Training loops: tied mll ascent, chunked gradients, warm start,
fine-tuning (≙ optimisers.jl / finetuning.jl)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.train import make_mll_fn

rng = np.random.default_rng(0)
N = 250
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 4 * np.pi) + rng.normal(0, 0.2, N)


def _model(seed=1, **kw):
    kw.setdefault("V", 2)
    kw.setdefault("K", 2)
    kw.setdefault("M", 20)
    kw.setdefault("kernel", dsm.IsoSE(0.0, 0.0))
    kw.setdefault("log_noise", -1.0)
    return dsm.build_dsmgp(X, Y, seed=seed, **kw)


def test_train_improves_mll():
    m = _model()
    before = m.mll()
    hist = dsm.train(m, optax.adam(5e-2), iterations=60, lam=1e-5,
                     randinit=False)
    assert m.mll() > before
    assert hist[-1] > hist[0]


def test_train_randinit_and_earlystop():
    m = _model(seed=2)
    hist = dsm.train(m, optax.adam(5e-2), iterations=500, lam=10.0,
                     earlystop=3, seed=4)
    # huge lambda → early stop long before 500 iterations
    assert hist.shape[0] < 500


def test_warm_start_workflow():
    """README warm-start: get params from a trained model, set on another,
    train with randinit=False (README.md:58-71)."""
    m1 = _model(seed=5)
    dsm.train(m1, optax.adam(5e-2), iterations=30, lam=1e-6, randinit=False)
    hyp = m1.get_params()
    m2 = _model(seed=6, V=3)
    m2.set_params(hyp)
    np.testing.assert_allclose(m2.get_params(), hyp)
    before = m2.mll()
    dsm.train(m2, optax.adam(1e-2), iterations=20, lam=1e-6, randinit=False)
    assert m2.mll() >= before - 1e-6


def test_chunked_gradient_matches_unchunked():
    m = _model(seed=7)
    f_full = make_mll_fn(m.layout, m.plan, m.batch, chunk=None)
    f_chunk = make_mll_fn(m.layout, m.plan, m.batch, chunk=3)
    theta = m.theta
    v1, g1 = jax.value_and_grad(f_full)(theta)
    v2, g2 = jax.value_and_grad(f_chunk)(theta)
    assert abs(float(v1) - float(v2)) < 1e-10
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_gradient_matches_finite_differences():
    """The autodiff gradient equals the responsibility-weighted sum of leaf
    gradients (the exact version of ∇mll!, optimize.jl:42-89)."""
    m = _model(seed=8)
    f = make_mll_fn(m.layout, m.plan, m.batch)
    theta = np.asarray(m.theta)
    g = np.asarray(jax.grad(f)(m.theta))
    h = 1e-6
    for i in range(theta.size):
        tp, tm = theta.copy(), theta.copy()
        tp[i] += h
        tm[i] -= h
        fd = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) / (2 * h)
        assert abs(g[i] - fd) < 1e-4 * max(1.0, abs(fd))


def test_finetune_improves_and_unties():
    m = _model(seed=9)
    dsm.train(m, optax.adam(5e-2), iterations=20, lam=1e-6, randinit=False)
    hist = dsm.finetune(m, optax.adam(1e-2), iterations=8, lam=1e-6)
    assert m.theta.ndim == 2  # untied per-leaf hypers
    assert m.theta.shape[0] == m.num_leaves
    assert hist.shape[0] >= 2
    # finetune optimizes the sum of own-leaf mlls (≙ l += L[gp.id],
    # finetuning.jl:51): it must STRICTLY improve that quantity over the
    # run (hist[0] is evaluated at the pre-finetune tied hypers)
    assert hist[-1] > hist[0]
    # the final heterogeneous refit must be the exact batched posterior
    # (auto must never route untied hypers to the shared schedule)
    from deepstructuredmixtures_tpu import fit as fitlib

    pb = fitlib.fit_batched(m.layout, m.theta, m.batch)
    np.testing.assert_allclose(
        np.asarray(m.leaf_mlls()), np.asarray(pb.mll), atol=1e-6, rtol=1e-9
    )


def test_finetuned_poe_family_predicts():
    """PoE/gPoE/rBCM predict after finetune (untied per-leaf hypers) —
    rBCM's prior variance must come from leaf 0's own row (≙ leftGP)."""
    for builder, kw in ((dsm.build_poe, {}),
                        (dsm.build_poe, {"generalized": True}),
                        (dsm.build_bcm, {})):
        p = builder(X, Y, K=3, M=25, kernel=dsm.IsoSE(0.0, 0.0),
                    log_noise=-1.0, seed=12, **kw)
        dsm.finetune(p, optax.adam(1e-2), iterations=3, lam=1e-9)
        assert p.theta.ndim == 2
        mu, var = p.predict(np.linspace(0, 1, 21).reshape(-1, 1))
        assert np.all(np.isfinite(np.asarray(mu)))
        assert np.all(np.asarray(var) > 0)


def test_train_poe_models():
    p = dsm.build_poe(X, Y, K=3, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                      log_noise=-1.0, seed=10)
    before = p.mll()
    dsm.train(p, optax.adam(5e-2), iterations=30, lam=1e-6, randinit=False)
    assert p.mll() > before


def test_per_bucket_value_and_grad_matches_monolithic():
    """make_value_and_grad_bucketed (the large-model path, chain rule
    through the SPN responsibilities) must equal jax.value_and_grad of the
    monolithic bucketed objective exactly."""
    import jax

    from deepstructuredmixtures_tpu.train import (
        make_mll_fn_bucketed,
        make_value_and_grad_bucketed,
    )

    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 1, 400)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 5) + 0.1 * rng.standard_normal(400)
    m = dsm.build_dsmgp(x, y, V=2, K=3, M=25, kernel=dsm.IsoSE(0.1, -0.1),
                        log_noise=-1.0, seed=4)
    mono = jax.value_and_grad(make_mll_fn_bucketed(
        m.layout, m.plan, m.bucket_batches, m.bucket_spec.leaf_ids
    ))
    per = make_value_and_grad_bucketed(
        m.layout, m.plan, m.bucket_batches, m.bucket_spec.leaf_ids
    )
    v1, g1 = mono(m.theta)
    v2, g2 = per(m.theta)
    assert abs(float(v1) - float(v2)) < 1e-10
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-9, rtol=1e-9)


def test_finetune_bucketed_candidate_grad_matches_monolithic():
    """The large-model finetune path (make_finetune_vg_bucketed) must
    reproduce the monolithic vmapped candidate gradients exactly — same
    D-row-weighted objective, different program partitioning."""
    from deepstructuredmixtures_tpu.train import (
        _weighted_root_mll,
        make_finetune_vg_bucketed,
    )

    m = _model(seed=6, V=2, K=3)
    L = m.num_leaves
    H = np.tile(np.asarray(m.theta), (L, 1))
    H[:, 0] += np.linspace(-0.3, 0.3, L)
    Dd = m.plan.overlap.copy()
    np.fill_diagonal(Dd, 1.0)

    vg = make_finetune_vg_bucketed(
        m.layout, m.plan, m.bucket_batches, m.bucket_spec.leaf_ids
    )
    # all candidates in one call (lax.map inside the per-bucket programs)
    lm_all, g_all = vg(jnp.asarray(H), jnp.asarray(Dd))

    def mono(theta_j, w_j):
        (root, lm), vjp = jax.vjp(
            lambda th: _weighted_root_mll(m.layout, m.plan, m.batch, th, w_j),
            theta_j,
        )
        (g,) = vjp((jnp.ones((), dtype=theta_j.dtype), jnp.zeros_like(lm)))
        return lm, g

    for j in (0, L // 2, L - 1):
        lm_m, g_m = mono(jnp.asarray(H[j]), jnp.asarray(Dd[j]))
        np.testing.assert_allclose(np.asarray(lm_all[j]), np.asarray(lm_m),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(g_all[j]), np.asarray(g_m),
                                   atol=1e-9, rtol=1e-9)


def test_finetune_kernel_mixture_parity():
    """Kernel-mixture leaves (GPSumNode over per-kernel GPNodes): finetune
    must untie the full multi-block hyper vector per leaf, the bucketed
    candidate path must match the monolithic one, and the sum of own-leaf
    mlls must strictly improve (same gate as the single-kernel case)."""
    kernels = [dsm.IsoSE(0.0, 0.0), dsm.IsoLinear(0.0)]
    m1 = dsm.build_dsmgp(X, Y, V=2, K=2, M=25, kernel=kernels,
                         log_noise=-1.0, seed=13)
    m2 = dsm.build_dsmgp(X, Y, V=2, K=2, M=25, kernel=kernels,
                         log_noise=-1.0, seed=13)
    h1 = dsm.finetune(m1, optax.adam(1e-2), iterations=4, lam=1e-9)
    h2 = dsm.finetune(m2, optax.adam(1e-2), iterations=4, lam=1e-9,
                      bucketed=True)
    assert m1.theta.ndim == 2 and m1.theta.shape == (
        m1.num_leaves, m1.layout.total
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(m1.theta), np.asarray(m2.theta),
                               atol=1e-8)
    assert h1[-1] > h1[0]


def test_finetune_sparse_backward_matches_dense():
    """The sparse pair-list backward (only (candidate, leaf) pairs with
    nonzero overlap weight are differentiated) must equal the dense
    all-pairs VJP exactly — the zero-weight VJPs it skips contribute
    nothing (≙ the D-row weighting of ``optimize.jl:92-150``). Covers
    pair padding (pair_map > pairs in the smallest bucket) and a
    candidate whose row is diagonal-only."""
    from deepstructuredmixtures_tpu.train import make_finetune_vg_bucketed

    m = _model(seed=8, V=2, K=3)
    L = m.num_leaves
    H = np.tile(np.asarray(m.theta), (L, 1))
    H[:, 0] += np.linspace(-0.2, 0.2, L)
    Dd = m.plan.overlap.copy()
    np.fill_diagonal(Dd, 1.0)
    Dd[0, 1:] = 0.0  # candidate 0: self-weight only
    args = (m.layout, m.plan, m.bucket_batches, m.bucket_spec.leaf_ids)
    vg_d = make_finetune_vg_bucketed(*args, sparse=False)
    vg_s = make_finetune_vg_bucketed(*args, sparse=True, pair_map=16)
    md, gd = vg_d(jnp.asarray(H), jnp.asarray(Dd))
    ms, gs = vg_s(jnp.asarray(H), jnp.asarray(Dd))
    np.testing.assert_allclose(np.asarray(md), np.asarray(ms), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs),
                               atol=1e-10, rtol=1e-10)


def test_finetune_bucketed_path_end_to_end():
    """finetune(bucketed=True) runs the large-model per-bucket candidate
    path end to end and lands on the same hypers as the monolithic path
    (identical objective, deterministic optimizer)."""
    m1 = _model(seed=7, V=2, K=2)
    m2 = _model(seed=7, V=2, K=2)
    h1 = dsm.finetune(m1, optax.adam(1e-2), iterations=4, lam=1e-9)
    h2 = dsm.finetune(m2, optax.adam(1e-2), iterations=4, lam=1e-9,
                      bucketed=True)
    assert m1.theta.ndim == 2 and m2.theta.ndim == 2
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(m1.theta), np.asarray(m2.theta),
                               atol=1e-8)


def test_finetune_sparse_kwarg_api_parity():
    """finetune(sparse=True) must reproduce finetune(sparse=False)
    exactly through the public API (bucketed path)."""
    m1 = _model(seed=12, V=2, K=3)
    h1 = dsm.finetune(m1, optax.adam(1e-2), iterations=3, bucketed=True,
                      sparse=True, progress=False)
    m2 = _model(seed=12, V=2, K=3)
    h2 = dsm.finetune(m2, optax.adam(1e-2), iterations=3, bucketed=True,
                      sparse=False, progress=False)
    np.testing.assert_allclose(h1, h2, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(m1.theta), np.asarray(m2.theta),
                               rtol=1e-9, atol=1e-9)


def test_finetune_sparse_overlap_matches_dense():
    """finetune on a model whose D is stored sparse (CSR) must reproduce
    the dense-D run exactly — same early-stop history, same final hypers."""
    md = _model(seed=31, do_fit=False, overlap_format="dense")
    ms = _model(seed=31, do_fit=False, overlap_format="sparse")
    import scipy.sparse as sp

    assert sp.issparse(ms.plan.overlap) and not sp.issparse(md.plan.overlap)
    hd = dsm.finetune(md, optax.adam(1e-2), iterations=4, lam=1e-9)
    hs = dsm.finetune(ms, optax.adam(1e-2), iterations=4, lam=1e-9)
    np.testing.assert_array_equal(hd, hs)
    np.testing.assert_array_equal(np.asarray(md.theta), np.asarray(ms.theta))


def test_finetune_leaf_subset():
    """finetune(leaves=[...]) must tune ONLY those leaves' rows (others
    keep the tied start), track the tuned leaves' own-mll sum, and
    improve it."""
    m = _model(seed=32)
    dsm.train(m, optax.adam(5e-2), iterations=20, lam=1e-6, randinit=False)
    L = m.num_leaves
    theta0 = np.asarray(m.theta)
    pick = np.array([0, L - 1])
    hist = dsm.finetune(m, optax.adam(1e-2), iterations=6, lam=1e-9,
                        leaves=pick)
    H = np.asarray(m.theta)
    assert H.shape == (L,) + theta0.shape
    untouched = np.setdiff1d(np.arange(L), pick)
    np.testing.assert_array_equal(
        H[untouched], np.broadcast_to(theta0, (untouched.size,) + theta0.shape)
    )
    assert not np.allclose(H[pick], theta0)  # tuned rows moved
    assert hist[-1] > hist[0]  # sum of tuned leaves' own mlls ascends
    # out-of-range / empty subsets fail loudly
    for bad in ([L], [-1], []):
        try:
            dsm.finetune(m, optax.adam(1e-2), iterations=1, leaves=bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
