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


def test_constructors():
    k = IsoSE(1.0, 2.0)
    assert k.n_lengthscales == 1 and k.n_params == 3 and k.has_variance
    k = ArdSE([1.0, 2.0], 0.5)
    assert k.n_lengthscales == 2 and k.n_params == 4
    k = IsoLinear(0.3)
    assert not k.has_variance and k.n_params == 3
    k = ArdLinear([0.1, 0.2, 0.3])
    assert k.n_params == 5
