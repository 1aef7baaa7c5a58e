"""Kernel Gram matrices vs the NumPy oracle (reference kernels.jl semantics)."""
import numpy as np
import jax.numpy as jnp
import pytest

from deepstructuredmixtures_tpu.kernels import (
    IsoSE,
    ArdSE,
    IsoLinear,
    ArdLinear,
    gram,
    gram_diag,
)
from .oracle import gram_np

rng = np.random.default_rng(0)
X1 = rng.normal(size=(7, 3))
X2 = rng.normal(size=(5, 3))

CASES = [
    ("iso_se", np.array([0.3]), 0.2),
    ("ard_se", np.array([0.3, -0.1, 0.5]), -0.4),
    ("iso_linear", np.array([0.7]), 0.0),
    ("ard_linear", np.array([0.2, -0.3, 0.1]), 0.0),
]


@pytest.mark.parametrize("kind,logl,logsigma", CASES)
def test_gram_matches_oracle(kind, logl, logsigma):
    K = gram(kind, jnp.asarray(logl), jnp.asarray(logsigma), jnp.asarray(X1),
             jnp.asarray(X2))
    Ko = gram_np(kind, logl, logsigma, X1, X2)
    np.testing.assert_allclose(np.asarray(K), Ko, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("kind,logl,logsigma", CASES)
def test_gram_diag(kind, logl, logsigma):
    d = gram_diag(kind, jnp.asarray(logl), jnp.asarray(logsigma), jnp.asarray(X1))
    Ko = gram_np(kind, logl, logsigma, X1, X1)
    np.testing.assert_allclose(np.asarray(d), np.diag(Ko), rtol=1e-12, atol=1e-12)


def test_gram_symmetric_psd():
    for kind, logl, logsigma in CASES:
        K = np.asarray(
            gram(kind, jnp.asarray(logl), jnp.asarray(logsigma),
                 jnp.asarray(X1), jnp.asarray(X1))
        )
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        w = np.linalg.eigvalsh(K + 1e-9 * np.eye(len(K)))
        assert np.all(w > -1e-8)


def test_ard_se_memory_lean_paths_match_dense():
    """The per-dim accumulated ArdSE gram (unrolled D<=32 and scanned
    D>32 paths) must equal the dense [N, M, D] formulation it replaced
    (which OOMs at benchmark leaf sizes), values AND gradients."""
    import jax

    def dense(logl, logsigma, x1, x2):
        diff2 = (x1[:, None, :] - x2[None, :, :]) ** 2
        return jnp.exp(2.0 * logsigma) * jnp.sum(
            jnp.exp(-0.5 * diff2 * jnp.exp(-2.0 * logl)), axis=-1
        )

    for d in (1, 4, 40):  # 40 exercises the scan path
        r = np.random.default_rng(d)
        x1 = jnp.asarray(r.normal(size=(9, d)))
        x2 = jnp.asarray(r.normal(size=(6, d)))
        logl = jnp.asarray(r.normal(size=(d,)) * 0.3)
        ls = jnp.asarray(0.2)
        K = gram("ard_se", logl, ls, x1, x2)
        np.testing.assert_allclose(np.asarray(K), np.asarray(dense(logl, ls, x1, x2)),
                                   rtol=1e-12, atol=1e-12)
        # custom VJP vs autodiff of the dense form: ALL cotangents
        # (logl, logsigma, x1, x2), with a non-trivial upstream cotangent
        w = jnp.asarray(r.normal(size=(9, 6)))
        g1 = jax.grad(
            lambda p, s, a, b: jnp.sum(w * gram("ard_se", p, s, a, b)),
            argnums=(0, 1, 2, 3),
        )(logl, ls, x1, x2)
        g2 = jax.grad(
            lambda p, s, a, b: jnp.sum(w * dense(p, s, a, b)),
            argnums=(0, 1, 2, 3),
        )(logl, ls, x1, x2)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)
        # and under vmap (the batched leaf path)
        xb1 = jnp.stack([x1, x1 * 0.5])
        xb2 = jnp.stack([x2, x2 * 2.0])
        gv = jax.grad(lambda p: jnp.sum(jax.vmap(
            lambda a, b: gram("ard_se", p, ls, a, b))(xb1, xb2)))(logl)
        gd = jax.grad(lambda p: jnp.sum(jax.vmap(
            lambda a, b: dense(p, ls, a, b))(xb1, xb2)))(logl)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gd),
                                   rtol=1e-10, atol=1e-12)


def test_ard_se_large_leaf_fuzz():
    """ArdSE at a benchmark-scale leaf (n >= 4096, D=4): the accumulated
    gram must stay finite/SPD-able and match the oracle on a sampled
    row block (full dense oracle at this size is fine on CPU)."""
    r = np.random.default_rng(11)
    n, d = 4352, 4
    x = r.uniform(0, 1, size=(n, d))
    logl = np.array([0.1, -0.2, 0.3, 0.0])
    K = np.asarray(gram("ard_se", jnp.asarray(logl), jnp.asarray(-0.1),
                        jnp.asarray(x), jnp.asarray(x)))
    assert np.all(np.isfinite(K))
    rows = r.choice(n, size=16, replace=False)
    Ko = gram_np("ard_se", logl, -0.1, x[rows], x)
    np.testing.assert_allclose(K[rows], Ko, rtol=1e-9, atol=1e-9)
    # diagonal dominance of the noisy gram at benchmark noise scales
    # guarantees the Cholesky the streamed path takes
    L = np.linalg.cholesky(K + 0.5 * np.eye(n))
    assert np.all(np.isfinite(L))


def test_constructors():
    k = IsoSE(1.0, 2.0)
    assert k.n_lengthscales == 1 and k.n_params == 3 and k.has_variance
    k = ArdSE([1.0, 2.0], 0.5)
    assert k.n_lengthscales == 2 and k.n_params == 4
    k = IsoLinear(0.3)
    assert not k.has_variance and k.n_params == 3
    k = ArdLinear([0.1, 0.2, 0.3])
    assert k.n_params == 5
