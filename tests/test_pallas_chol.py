"""Pallas fused gram+Cholesky kernel vs. dense oracles.

Mirrors the reference's own kernel self-test methodology (``lrtest`` /
``test_chol_continue``, ``AdvancedCholeskey.jl:61-135``): generate random
leaf batches, run the fused kernel, and compare against a from-scratch
float64 Cholesky of the explicitly constructed covariance.

The CPU test suite exercises the kernel through the Pallas *interpreter*
(the same kernel program Mosaic compiles on TPU, executed without the
TPU lowering). The compiled-on-TPU path is NOT covered here — the test
suite pins JAX_PLATFORMS=cpu — and is driven by ``_verify_drive.py``
(repo root), which runs the compiled kernel against the same float64
oracle on the real chip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepstructuredmixtures_tpu.kernels import gram
from deepstructuredmixtures_tpu.ops import pallas_chol


def _make_batch(L, N, D, seed=0, nmin_frac=0.5):
    rng = np.random.default_rng(seed)
    x = np.zeros((L, N, D), np.float32)
    n = rng.integers(int(nmin_frac * N), N + 1, L).astype(np.int32)
    for l in range(L):
        x[l, : n[l]] = np.sort(
            rng.uniform(0.0, 1.0, (n[l], D)), axis=0
        )
    return x, n


def _oracle(xl, logl, logsigma, noise, eps=1e-8):
    K = np.asarray(
        gram(
            "iso_se",
            jnp.asarray([logl], jnp.float64),
            jnp.asarray(logsigma, jnp.float64),
            jnp.asarray(xl, jnp.float64),
            jnp.asarray(xl, jnp.float64),
        )
    )
    K = K + (noise + eps) * np.eye(len(xl))
    return np.linalg.cholesky(K)


@pytest.mark.parametrize("N", [128, 384])
def test_fused_gram_cholesky_matches_oracle(N):
    L, D = 5, 1
    x, n = _make_batch(L, N, D, seed=42)
    logl = np.full(L, -0.5, np.float32)
    logsigma = np.full(L, 0.2, np.float32)
    noise = np.full(L, 0.05, np.float32)

    out = np.asarray(
        pallas_chol.fused_gram_cholesky(
            jnp.asarray(x),
            jnp.asarray(n),
            jnp.asarray(logl),
            jnp.asarray(logsigma),
            jnp.asarray(noise),
            interpret=True,
        )
    )
    assert not np.isnan(out).any()
    for l in range(L):
        Lref = _oracle(x[l, : n[l]], -0.5, 0.2, 0.05)
        err = np.abs(out[l, : n[l], : n[l]] - Lref).max()
        assert err < 5e-4, f"leaf {l}: max abs err {err}"
        # padding contract: identity diagonal, zero off-diagonal
        pad = out[l, n[l]:, n[l]:]
        assert np.allclose(pad, np.eye(N - n[l]), atol=1e-6)
        assert np.abs(out[l, n[l]:, : n[l]]).max() < 1e-6
        # strictly lower triangular output
        assert np.abs(np.triu(out[l], 1)).max() == 0.0


def test_supported_gates():
    assert not pallas_chol.supported(100, jnp.float32, ("iso_se",))  # not /128
    assert not pallas_chol.supported(2048, jnp.float32, ("iso_se",))  # VMEM
    assert not pallas_chol.supported(256, jnp.float64, ("iso_se",))  # dtype
    assert not pallas_chol.supported(256, jnp.float32, ("ard_se",))  # kind
    # on the CPU test platform the TPU path must be off regardless
    assert not pallas_chol.supported(256, jnp.float32, ("iso_se",))


def test_fused_kernel_per_leaf_hypers():
    """Untied (post-finetune) hypers: the kernel takes per-leaf scalars —
    each leaf factored under ITS OWN hypers must match its oracle."""
    L, N, D = 4, 256, 1
    x, n = _make_batch(L, N, D, seed=7)
    logl = np.linspace(-0.8, 0.1, L).astype(np.float32)
    logsigma = np.linspace(-0.2, 0.4, L).astype(np.float32)
    noise = np.linspace(0.03, 0.2, L).astype(np.float32)
    out = np.asarray(pallas_chol.fused_gram_cholesky(
        jnp.asarray(x), jnp.asarray(n), jnp.asarray(logl),
        jnp.asarray(logsigma), jnp.asarray(noise), interpret=True,
    ))
    for l in range(L):
        Lref = _oracle(x[l, : n[l]], logl[l], logsigma[l], noise[l])
        assert np.abs(out[l, : n[l], : n[l]] - Lref).max() < 5e-4


def test_streamed_body_untied_dispatch_consistency():
    """_maybe_pallas_chol accepts per-leaf theta rows; on CPU it returns
    None (platform gate) and the streamed paths fall through to XLA —
    tied and untied streamed mlls must both equal fit_batched."""
    import deepstructuredmixtures_tpu as dsm
    from deepstructuredmixtures_tpu import fit as fitlib

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 1, 300)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 7) + 0.1 * rng.standard_normal(300)
    m = dsm.build_dsmgp(x, y, V=2, K=2, M=30, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=5)
    L = m.num_leaves
    H = np.tile(np.asarray(m.theta), (L, 1))
    H[:, 0] += np.linspace(-0.2, 0.2, L)
    H = jnp.asarray(H, m.dtype)
    ref = fitlib.fit_batched(m.layout, H, m.batch).mll
    light = fitlib.fit_light(m.layout, H, m.batch, chunk=3).mll
    np.testing.assert_allclose(np.asarray(light), np.asarray(ref),
                               atol=1e-9, rtol=1e-11)
