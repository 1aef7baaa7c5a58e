"""Factor-reuse kernels vs from-scratch Cholesky oracles.

Generalizes the reference's own self-tests: ``lrtest``
(``AdvancedCholeskey.jl:61-110``: Givens row-deletion vs fresh Cholesky of
the submatrix) and ``test_chol_continue`` (``AdvancedCholeskey.jl:121-135``:
resumed factorization vs full ``cholesky!``).
"""
import numpy as np
import jax
import jax.numpy as jnp

from deepstructuredmixtures_tpu.ops import cholesky as chol


def gen_cov(rng, n):
    """SPD test matrix (≙ ``genCov``, ``AdvancedCholeskey.jl:12``)."""
    A = rng.uniform(size=(n, n))
    A = 0.5 * (A + A.T) + n * np.eye(n)
    return A


def test_givens_delete_single_row():
    rng = np.random.default_rng(0)
    n = 20
    A = gen_cov(rng, n)
    Lf = np.linalg.cholesky(A)
    for r in [0, 5, n - 2, n - 1]:
        out = np.asarray(chol.givens_delete_one(jnp.asarray(Lf), r))
        keep = np.delete(np.arange(n), r)
        got = np.tril(out[np.ix_(keep, keep)])
        want = np.linalg.cholesky(A[np.ix_(keep, keep)])
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_givens_delete_multiple_rows():
    """≙ lrtest with 10 random deletions on a 120x120 SPD matrix."""
    rng = np.random.default_rng(1)
    n = 120
    A = gen_cov(rng, n)
    Lf = np.linalg.cholesky(A)
    dels = np.sort(rng.choice(n - 1, size=10, replace=False))
    out = jnp.asarray(Lf)
    pos = jnp.asarray(dels.astype(np.int32))
    out = chol.givens_delete_rows(out, pos, jnp.asarray(len(dels)))
    keep = np.setdiff1d(np.arange(n), dels)
    got = np.tril(np.asarray(out)[np.ix_(keep, keep)])
    want = np.linalg.cholesky(A[np.ix_(keep, keep)])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_givens_delete_respects_padding():
    """Identity padding rows must be invariant under the sweep."""
    rng = np.random.default_rng(2)
    n, valid = 16, 10
    A = np.eye(n)
    A[:valid, :valid] = gen_cov(rng, valid)
    Lf = np.linalg.cholesky(A)
    out = np.asarray(chol.givens_delete_one(jnp.asarray(Lf), 3))
    np.testing.assert_allclose(out[valid:], np.eye(n)[valid:], atol=1e-12)
    keep = np.delete(np.arange(valid), 3)
    want = np.linalg.cholesky(A[np.ix_(keep, keep)])
    np.testing.assert_allclose(np.tril(out[np.ix_(keep, keep)]), want, atol=1e-10)


def test_chol_continue_matches_full():
    """≙ test_chol_continue (D=100, P=10)."""
    rng = np.random.default_rng(3)
    n, p = 100, 10
    A = gen_cov(rng, n)
    Lfull = np.linalg.cholesky(A)
    Ltop = np.zeros_like(A)
    Ltop[:p, :p] = np.linalg.cholesky(A[:p, :p])
    out = np.asarray(
        chol.chol_continue(jnp.asarray(A), jnp.asarray(Ltop), jnp.asarray(p))
    )
    np.testing.assert_allclose(np.tril(out), Lfull, atol=1e-10)


def test_chol_continue_vmapped_dynamic_p():
    rng = np.random.default_rng(4)
    n = 32
    As, Ltops, Ps, wants = [], [], [], []
    for p in [4, 17, 31]:
        A = gen_cov(rng, n)
        Ltop = np.zeros_like(A)
        Ltop[:p, :p] = np.linalg.cholesky(A[:p, :p])
        As.append(A)
        Ltops.append(Ltop)
        Ps.append(p)
        wants.append(np.linalg.cholesky(A))
    out = np.asarray(
        jax.vmap(chol.chol_continue)(
            jnp.asarray(np.stack(As)),
            jnp.asarray(np.stack(Ltops)),
            jnp.asarray(np.asarray(Ps)),
        )
    )
    for o, w in zip(out, wants):
        np.testing.assert_allclose(np.tril(o), w, atol=1e-10)


def test_masked_cholesky_padding_noop():
    rng = np.random.default_rng(5)
    n, valid = 24, 15
    A = gen_cov(rng, valid)
    K = np.zeros((n, n))
    K[:valid, :valid] = A
    mask = np.arange(n) < valid
    Lf = np.asarray(chol.masked_cholesky(jnp.asarray(K), jnp.asarray(mask)))
    np.testing.assert_allclose(Lf[:valid, :valid], np.linalg.cholesky(A), atol=1e-10)
    np.testing.assert_allclose(Lf[valid:, valid:], np.eye(n - valid), atol=1e-12)
    assert abs(float(chol.masked_logdet(jnp.asarray(Lf), jnp.asarray(mask)))
               - np.linalg.slogdet(A)[1]) < 1e-9


def test_cho_solve_and_factor_valid():
    rng = np.random.default_rng(6)
    n = 12
    A = gen_cov(rng, n)
    y = rng.normal(size=n)
    Lf = jnp.asarray(np.linalg.cholesky(A))
    x = np.asarray(chol.cho_solve_lower(Lf, jnp.asarray(y)))
    np.testing.assert_allclose(A @ x, y, atol=1e-9)
    mask = jnp.ones(n, dtype=bool)
    assert bool(chol.factor_is_valid(Lf, mask))
    bad = Lf.at[3, 3].set(jnp.nan)
    assert not bool(chol.factor_is_valid(bad, mask))
