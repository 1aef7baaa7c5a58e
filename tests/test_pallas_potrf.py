"""HBM-streaming blocked Cholesky kernel vs. dense float64 oracles.

Same methodology as ``test_pallas_chol.py`` (≙ the reference's own kernel
self-tests, ``AdvancedCholeskey.jl:61-135``): random SPD batches through
the Pallas *interpreter* on CPU, compared against ``np.linalg.cholesky``
in float64. The compiled-on-TPU path is measured by the bench harness.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from deepstructuredmixtures_tpu.ops import pallas_potrf


def _spd_batch(g, n, seed=0, noise=0.3):
    """Random IsoSE-like SPD matrices with realistic conditioning, the
    last one identity-padded beyond a ragged valid size."""
    rng = np.random.default_rng(seed)
    out = np.zeros((g, n, n), np.float32)
    valid = n - (n // 4 if g > 1 else 0)
    for l in range(g):
        nv = n if l < g - 1 else valid
        x = np.sort(rng.uniform(0, 1, nv))
        d2 = (x[:, None] - x[None, :]) ** 2
        K = np.exp(-0.5 * d2 / 0.02) + noise * np.eye(nv)
        out[l, :nv, :nv] = K
        if nv < n:
            out[l, range(nv, n), range(nv, n)] = 1.0
    return out


@pytest.mark.parametrize("g,n", [(1, 512), (2, 512), (4, 768)])
def test_streamed_potrf_matches_oracle(g, n):
    A = _spd_batch(g, n, seed=g * 7 + n)
    out = np.asarray(
        pallas_potrf.hbm_blocked_cholesky(jnp.asarray(A), interpret=True,
                                          tril=True)
    )
    assert not np.isnan(out).any()
    for l in range(g):
        Lref = np.linalg.cholesky(A[l].astype(np.float64))
        err = np.abs(out[l] - Lref).max()
        assert err < 5e-4, f"matrix {l}: max abs err {err}"
        # reconstruction: L L^T must reproduce A to f32 accuracy
        rec = out[l] @ out[l].T
        rerr = np.abs(rec - A[l]).max() / np.abs(A[l]).max()
        assert rerr < 1e-4, f"matrix {l}: reconstruction rel err {rerr}"
        assert np.abs(np.triu(out[l], 1)).max() == 0.0


def test_streamed_potrf_logdet_accuracy():
    """logdet (the mll ingredient) from the streamed factor vs float64."""
    A = _spd_batch(2, 768, seed=5)
    out = np.asarray(
        pallas_potrf.hbm_blocked_cholesky(jnp.asarray(A), interpret=True)
    )
    for l in range(2):
        ld = 2.0 * np.sum(np.log(np.diag(out[l])))
        ld_ref = 2.0 * np.sum(np.log(np.diag(
            np.linalg.cholesky(A[l].astype(np.float64)))))
        assert abs(ld - ld_ref) / abs(ld_ref) < 1e-5


def test_validation_and_gates():
    with pytest.raises(ValueError):
        pallas_potrf.hbm_blocked_cholesky(jnp.zeros((1, 300, 300)),
                                          interpret=True)
    with pytest.raises(ValueError):
        pallas_potrf.hbm_blocked_cholesky(jnp.zeros((8, 256, 256)),
                                          interpret=True)
    assert not pallas_potrf.supported(4096, 4, jnp.float64)  # dtype
    assert not pallas_potrf.supported(4100, 4, jnp.float32)  # alignment
    assert not pallas_potrf.supported(1024, 4, jnp.float32)  # too small
    assert not pallas_potrf.supported(4096, 8, jnp.float32)  # stack depth
    # on the CPU test platform the TPU path must be off regardless
    assert not pallas_potrf.supported(4096, 4, jnp.float32)
    assert pallas_potrf.good_chunk(4096) == 4
    assert pallas_potrf.good_chunk(16384) == 1
