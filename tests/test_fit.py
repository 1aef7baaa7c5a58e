"""Posterior fitting: batched vs shared-Cholesky parity, forced case
coverage (copy / delete / continue), chunking, and per-leaf mll parity
against the oracle."""
import numpy as np
import jax.numpy as jnp

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu import fit as fitlib
from deepstructuredmixtures_tpu.hyper import initial_vector, make_layout
from deepstructuredmixtures_tpu.plan import build_schedule, compile_tree
from deepstructuredmixtures_tpu.tree import LeafNode, SumNode

from .oracle import OracleGP

rng = np.random.default_rng(0)
N = 60
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 6) + rng.normal(0, 0.1, N)


def _leaf(obs, mean=None):
    obs = np.asarray(obs, dtype=np.int64)
    return LeafNode(
        obs=obs,
        lb=np.array([-np.inf]),
        ub=np.array([np.inf]),
        kernelid=0,
        mean=float(Y[obs].mean()) if mean is None else mean,
    )


def _handcrafted():
    """Sum node over four leaves engineered to hit every schedule case:
    main (0..39), copy of main, subset (delete 1 interior row), and a
    prefix-superset (continue)."""
    main = _leaf(np.arange(40))
    copy = _leaf(np.arange(40))
    sub = _leaf(np.delete(np.arange(40), 7))
    ext = _leaf(np.arange(60))
    node = SumNode(children=[main, copy, sub, ext],
                   logweights=np.full(4, -np.log(4.0)))
    return node


def test_schedule_covers_all_cases():
    root = _handcrafted()
    plan = compile_tree(root, X)
    sched = build_schedule(plan, tau=0.05)
    assert sched.copy_j.size == 1
    assert sched.del_j.size == 1
    assert sched.cont_j.size == 1
    assert sched.full_idx.size == 1


def test_shared_fit_matches_batched_on_forced_cases():
    root = _handcrafted()
    plan = compile_tree(root, X)
    sched = build_schedule(plan, tau=0.05)
    kernels = (dsm.IsoSE(0.1, 0.2),)
    layout = make_layout(kernels)
    theta = jnp.asarray(initial_vector(kernels, -1.0))
    batch = plan.leaf_batch(X, Y, jnp.float64)

    pb = fitlib.fit_batched(layout, theta, batch)
    ps = fitlib.fit_shared(layout, theta, batch, sched)
    np.testing.assert_allclose(np.asarray(ps.mll), np.asarray(pb.mll), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ps.alpha), np.asarray(pb.alpha), atol=1e-7)

    # factor parity on valid regions
    for l in range(plan.num_leaves):
        n = int(batch.n[l])
        np.testing.assert_allclose(
            np.asarray(ps.chol)[l, :n, :n],
            np.asarray(pb.chol)[l, :n, :n],
            atol=1e-8,
        )


def _gencont_pair():
    """Two leaves hitting the GENERALIZED delete-then-continue case: the
    main's factor must be row-deleted (interior row 7 of main is absent
    from j) before the continue extension — neither leaf is a subset of
    the other, so the reference (and the r1 schedule) would refit j from
    scratch."""
    main = _leaf(np.arange(40))
    j = _leaf(np.concatenate([np.delete(np.arange(40), 7), np.arange(40, 60)]))
    return SumNode(children=[main, j], logweights=np.full(2, -np.log(2.0)))


def test_general_delete_then_continue_schedule():
    plan = compile_tree(_gencont_pair(), X)
    sched = build_schedule(plan, tau=0.05)
    assert sched.full_idx.size == 1
    assert sched.cont_j.size == 1
    assert sched.cont_del_ndel[0] == 1  # one interior Givens deletion
    assert sched.cont_p[0] == 39  # continue from the 39-row prefix


def test_general_delete_then_continue_parity():
    plan = compile_tree(_gencont_pair(), X)
    sched = build_schedule(plan, tau=0.05)
    kernels = (dsm.IsoSE(0.1, 0.2),)
    layout = make_layout(kernels)
    theta = jnp.asarray(initial_vector(kernels, -1.0))
    batch = plan.leaf_batch(X, Y, jnp.float64)
    pb = fitlib.fit_batched(layout, theta, batch)
    ps = fitlib.fit_shared(layout, theta, batch, sched)
    np.testing.assert_allclose(np.asarray(ps.mll), np.asarray(pb.mll), atol=1e-8)
    for l in range(plan.num_leaves):
        n = int(batch.n[l])
        np.testing.assert_allclose(
            np.asarray(ps.chol)[l, :n, :n],
            np.asarray(pb.chol)[l, :n, :n],
            atol=1e-8,
        )


def test_leaf_mll_matches_oracle():
    root = _handcrafted()
    plan = compile_tree(root, X)
    kernels = (dsm.IsoSE(0.1, 0.2),)
    layout = make_layout(kernels)
    theta = jnp.asarray(initial_vector(kernels, -1.0))
    batch = plan.leaf_batch(X, Y, jnp.float64)
    post = fitlib.fit_batched(layout, theta, batch)
    for l, obs in enumerate(plan.leaf_obs):
        og = OracleGP(X[obs], Y[obs], "iso_se", [0.1], 0.2, -1.0)
        assert abs(float(post.mll[l]) - og.mll()) < 1e-9


def test_chunked_fit_matches_unchunked():
    m = dsm.build_dsmgp(X, Y, V=2, K=2, M=10, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=3, do_fit=False)
    p1 = fitlib.fit_batched(m.layout, m.theta, m.batch)
    p2 = fitlib.fit_batched(m.layout, m.theta, m.batch, chunk=3)
    np.testing.assert_allclose(np.asarray(p1.mll), np.asarray(p2.mll), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p1.alpha), np.asarray(p2.alpha), atol=1e-12)


def test_shared_fit_on_built_model():
    m = dsm.build_dsmgp(X, Y, V=3, K=3, M=8, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=5)
    m.fit(method="batched")
    mll_b = m.mll()
    m.fit(method="shared")
    mll_s = m.mll()
    assert abs(mll_b - mll_s) < 1e-8


def _model_from_root(root):
    from deepstructuredmixtures_tpu.models import DSMGP

    plan = compile_tree(root, X)
    sched = build_schedule(plan, tau=0.05)
    kernels = (dsm.IsoSE(0.1, 0.2),)
    layout = make_layout(kernels)
    theta = initial_vector(kernels, -1.0)
    batch = plan.leaf_batch(X, Y, jnp.float64)
    return DSMGP(root, plan, sched, layout, batch, theta, jnp.float64,
                 X=X, y=Y)


def test_untied_hypers_never_use_shared_schedule():
    """VERDICT r1 bug: fit(method='auto') selected the shared-Cholesky
    schedule under per-leaf hypers, deriving factors from a main with
    DIFFERENT hypers (9.5-nat leaf mll error). Per-leaf theta must always
    take the batched path, matching the f64 oracle at 1e-6."""
    import pytest

    m = _model_from_root(_handcrafted())
    # the schedule has a large derived fraction — auto WOULD pick shared
    # if hypers were tied
    assert m.schedule.full_idx.size < 0.75 * m.num_leaves
    L = m.num_leaves
    H = np.tile(np.asarray(m.theta), (L, 1))
    H[:, 0] += np.linspace(-0.5, 0.5, L)  # untie the lengthscales
    m.set_params(H)
    m.fit(method="auto")
    mlls = np.asarray(m.leaf_mlls())
    pb = fitlib.fit_batched(m.layout, jnp.asarray(H), m.batch)
    np.testing.assert_allclose(mlls, np.asarray(pb.mll), atol=1e-6)
    for l, obs in enumerate(m.plan.leaf_obs):
        og = OracleGP(X[obs], Y[obs], "iso_se", [H[l, 0]], H[l, 1], H[l, 2])
        assert abs(mlls[l] - og.mll()) < 1e-8
    # the shared engine refuses untied hypers outright
    with pytest.raises(ValueError):
        fitlib.fit_shared(m.layout, jnp.asarray(H), m.batch, m.schedule)


def test_post_finetune_parity_with_derived_schedule(tmp_path):
    """After finetune unties the hypers, the final model.fit() (and a
    checkpoint round-trip) must equal fit_batched at 1e-6 even on a tree
    whose schedule has >25% derived leaves (≙ per-leaf full
    refactorization, finetuning.jl:74-85)."""
    m = _model_from_root(_handcrafted())
    assert m.schedule.full_idx.size < 0.75 * m.num_leaves
    dsm.finetune(m, iterations=3, lam=1e-9)
    assert m.theta.ndim == 2
    pb = fitlib.fit_batched(m.layout, m.theta, m.batch)
    np.testing.assert_allclose(
        np.asarray(m.leaf_mlls()), np.asarray(pb.mll), atol=1e-6, rtol=1e-9
    )
    # checkpoint-load of the finetuned (untied) model: same surface
    from deepstructuredmixtures_tpu import checkpoint as ckpt

    p = str(tmp_path / "ft.npz")
    ckpt.save(m, p)
    m2 = ckpt.load(p)
    m2.fit(method="auto")
    np.testing.assert_allclose(
        np.asarray(m2.leaf_mlls()), np.asarray(pb.mll), atol=1e-6, rtol=1e-9
    )


def test_rebuild_schedule_tau():
    """A τ change rebuilds the static schedule (≙ fit!(model; τ)): τ=0
    disables every deletion-bearing derivation; results stay identical."""
    m = _model_from_root(_handcrafted())
    base_mll = m.mll()
    derived0 = m.schedule.num_derived
    assert derived0 >= 3
    m.rebuild_schedule(tau=1e-12)
    # delete case (1 interior deletion) no longer qualifies; copy and
    # pure-prefix continue (0 deletions) survive
    assert m.schedule.del_j.size == 0
    assert m.schedule.num_derived < derived0
    m.fit(method="shared")
    assert abs(m.mll() - base_mll) < 1e-8


def test_untied_theta_fit():
    """Per-leaf hyper matrices must be accepted by the batched engine."""
    m = dsm.build_dsmgp(X, Y, V=2, K=2, M=10, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=7, do_fit=False)
    L = m.num_leaves
    H = np.tile(np.asarray(m.theta), (L, 1))
    H[:, 0] += np.linspace(-0.2, 0.2, L)  # vary lengthscales per leaf
    post = fitlib.fit_batched(m.layout, jnp.asarray(H), m.batch)
    for l, obs in enumerate(m.plan.leaf_obs):
        og = OracleGP(X[obs], Y[obs], "iso_se", [H[l, 0]], H[l, 1], H[l, 2])
        assert abs(float(post.mll[l]) - og.mll()) < 1e-9


def test_monolithic_batch_is_lazy():
    """The [L, nmax] monolithic LeafBatch must not be built (or
    transferred) by model construction or the bucketed/streamed paths —
    only on first `.batch` access (it is pure padding overhead at scale,
    BASELINE.md round-3 host-build campaign)."""
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0, 1, 400)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 5) + rng.normal(0, 0.1, 400)
    model = dsm.build_dsmgp(x, y, V=2, K=3, M=30, seed=0, do_fit=False)
    assert model._batch is None
    model.fit(store="light")          # streamed path
    _ = model.leaf_mlls()
    assert model._batch is None       # still untouched
    b = model.batch                   # first access builds it
    assert model._batch is b and b.x.shape[0] == model.num_leaves
    # and the non-streamed path through it still works
    model.fit(method="batched")
    assert np.isfinite(float(model.update()))
