"""Pallas TPU kernels: fused covariance + blocked Cholesky per leaf expert.

The reference's hot op is one LAPACK ``potrf`` per leaf
(``gaussianprocess.jl:101``) preceded by a full kernel-matrix materialization
(``kernels.jl:21-27``). On TPU that pattern costs two HBM round-trips of the
[N, N] covariance (write K, read K) before the factorization even starts —
for VMEM-sized experts the op is *memory-bound*, not compute-bound.

``fused_gram_cholesky`` computes, per grid program (= per leaf, batched over
the grid):

  1. the IsoSE covariance tile directly from the [N, D] inputs in VMEM
     (squared distances via one MXU matmul),
  2. noise + jitter on the valid diagonal, identity padding beyond the
     leaf's valid size,
  3. an in-place right-looking *blocked* Cholesky: per 128-column panel an
     unblocked column sweep (VPU) followed by a full-width rank-128 trailing
     update on the MXU,

all without the covariance ever touching HBM — only the [N, D] inputs come
in and the [N, N] factor goes out. float32, N ≤ ~1024 (VMEM residency).

Validated against float64 Cholesky oracles in ``tests/test_pallas_chol.py``
(interpreter on CPU, compiled on TPU via the benchmark harness).

STATUS / honest measurement: on a single v5e core at [L=64, N=512] the
fused kernel runs ~20ms on-device vs ~10ms for XLA's gram+cholesky — the
per-grid-program overhead (sequential per-leaf sweeps + many small MXU
dispatches) currently outweighs the HBM-traffic saving, so the XLA path
remains the default everywhere and ``supported()`` is the integration
gate for when a stacked multi-leaf-per-program variant lands. Kept as a
correct, tested reference kernel for the VMEM-resident expert regime.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
MAX_VMEM_N = 1024


def _fused_kernel(n_ref, logl_ref, logsigma_ref, noise_ref, x_ref, out_ref,
                  *, nmax: int, eps: float):
    """One leaf: IsoSE gram + noise + identity padding + blocked Cholesky."""
    l = pl.program_id(0)
    n_valid = n_ref[l]
    logl = logl_ref[l]
    logsigma = logsigma_ref[l]
    noise = noise_ref[l]

    x = x_ref[0]  # [N, D]
    # squared distances via the inner-product expansion (MXU)
    sq = jnp.sum(x * x, axis=1, keepdims=True)  # [N, 1]
    cross = jax.lax.dot_general(
        x, x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(sq + sq.T - 2.0 * cross, 0.0)
    K = jnp.exp(2.0 * logsigma) * jnp.exp(-0.5 * d2 * jnp.exp(-2.0 * logl))

    ridx = jax.lax.broadcasted_iota(jnp.int32, (nmax, nmax), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (nmax, nmax), 1)
    valid = (ridx < n_valid) & (cidx < n_valid)
    diag = ridx == cidx
    K = jnp.where(valid, K, 0.0)
    K = jnp.where(diag & (ridx < n_valid), K + noise + eps, K)
    K = jnp.where(diag & (ridx >= n_valid), 1.0, K)

    out_ref[0] = K

    # ---- in-place right-looking blocked Cholesky -------------------------
    # Two-stage panel factorization (all full-tile ops — Mosaic forbids
    # dynamic lane-dimension indexing, and tiny slices lower poorly):
    #   1. a 128-step unblocked sweep factors ONLY the [B, B] diagonal
    #      block (the sequential critical path, on a minimal tile);
    #   2. inv(L11) is built in log2(B) block-doubling steps of masked
    #      [B, B] matmuls (triangular inversion by 2x2 block recursion,
    #      X_{2m} = X_m - X_m (L ⊙ offdiag_m) X_m — MXU work, no loops);
    #   3. the [N, B] sub-panel solves against inv(L11) with ONE MXU
    #      matmul, and the rank-B trailing update is a second matmul.
    # The per-column sequential work is O(B^2) instead of O(N·B), so the
    # kernel is MXU-bound rather than sweep-bound for N >> B.
    nb = nmax // BLOCK
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nmax, 1), 0)  # [N, 1]
    bi = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)  # [B, B] rows
    bj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)  # [B, B] cols
    bcol = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)  # [1, B]
    brow = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)  # [B, 1]
    HI = jax.lax.Precision.HIGHEST

    def dotT(a, b):  # a @ b^T on the MXU at full f32 precision
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )

    for kb in range(nb):
        s = kb * BLOCK

        # -- 1. factor the diagonal block D -> L11 (unblocked sweep) ------
        D = out_ref[0, s : s + BLOCK, s : s + BLOCK]  # [B, B]

        def col_step(j, T):
            colmask = (bcol == j).astype(T.dtype)
            colc = jnp.sum(T * colmask, axis=1, keepdims=True)  # [B, 1]
            diag_val = jnp.sum(jnp.where(brow == j, colc, 0.0))
            rinv = jax.lax.rsqrt(diag_val)
            below = brow > j
            scaled = jnp.where(below, colc * rinv, 0.0)
            newcol = scaled + jnp.where(brow == j, diag_val * rinv, 0.0)
            w = jnp.where(bcol > j, scaled.T, 0.0)  # l_c over later columns
            T = T - scaled * w  # rank-1 update of the remaining block
            return jnp.where(bcol == j, newcol, T)

        L11 = jax.lax.fori_loop(0, BLOCK, col_step, D)
        L11 = jnp.where(bj <= bi, L11, 0.0)

        # -- 2. X = inv(L11) by block-doubling (log2(B) masked matmuls) ---
        d = jnp.sum(jnp.where(bi == bj, L11, 0.0), axis=1, keepdims=True)
        X = jnp.where(bi == bj, 1.0 / d, 0.0)  # m=1 inverse
        m = 1
        while m < BLOCK:
            # strictly-lower off-diagonal m-blocks within each 2m block
            off = ((bi // m) % 2 == 1) & ((bj // m) % 2 == 0) & (
                (bi // (2 * m)) == (bj // (2 * m))
            )
            Lo = jnp.where(off, L11, 0.0)
            X = X - dot(dot(X, Lo), X)
            m *= 2

        # -- 3. panel solve + write (one MXU matmul) -----------------------
        tile = out_ref[0, :, s : s + BLOCK]  # [N, B]
        below_panel = row_ids >= s + BLOCK
        E = jnp.where(below_panel, tile, 0.0)
        L21 = dotT(E, X)  # E @ inv(L11)^T
        in_panel = (row_ids >= s) & (row_ids < s + BLOCK)
        parts = []
        if s:
            parts.append(jnp.zeros((s, BLOCK), tile.dtype))
        parts.append(L11)
        if nmax - s - BLOCK:
            parts.append(jnp.zeros((nmax - s - BLOCK, BLOCK), tile.dtype))
        L11N = jnp.concatenate(parts, axis=0) if len(parts) > 1 else L11
        panel = jnp.where(in_panel, L11N, L21)
        out_ref[0, :, s : s + BLOCK] = panel

        # -- 4. rank-B trailing update (MXU) -------------------------------
        if kb + 1 < nb:
            # HIGHEST precision: the update cancels O(||K||) down to
            # O(noise); a single bf16 pass produces negative diagonals.
            out_ref[0] = out_ref[0] - dotT(
                jnp.where(below_panel, L21, 0.0),
                jnp.where(below_panel, L21, 0.0),
            )

    out_ref[0] = jnp.where(cidx <= ridx, out_ref[0], 0.0)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_gram_cholesky(x, n, logl, logsigma, noise, eps: float = 1e-8,
                        interpret: bool = False):
    """Batched fused IsoSE-gram + Cholesky.

    ``x [L, N, D]`` (N a multiple of 128, ≤ ~1024 for VMEM residency),
    ``n [L]`` valid sizes, ``logl/logsigma/noise [L]`` per-leaf scalars.
    Returns the lower factors ``[L, N, N]`` (identity on padding), float32.
    ``interpret=True`` runs the Pallas interpreter (CPU test suite).
    """
    L, nmax, d = x.shape
    if nmax % BLOCK != 0:
        raise ValueError(f"nmax must be a multiple of {BLOCK}, got {nmax}")
    kern = functools.partial(_fused_kernel, nmax=nmax, eps=eps)

    def col2(a):
        return a.reshape(L).astype(jnp.float32)

    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=[
            scalar_spec,
            scalar_spec,
            scalar_spec,
            scalar_spec,
            pl.BlockSpec((1, nmax, d), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nmax, nmax), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, nmax, nmax), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(L * (2 * nmax * nmax * d + nmax**3 / 3)),
            bytes_accessed=int(L * (nmax * d + nmax * nmax) * 4),
            transcendentals=int(L * nmax * nmax),
        ),
    )(
        n.reshape(L).astype(jnp.int32),
        col2(logl),
        col2(logsigma),
        col2(noise),
        x.astype(jnp.float32),
    )


def supported(batch_nmax: int, dtype, kinds) -> bool:
    """Whether the fused Pallas path applies: TPU platform, float32,
    single-IsoSE kernel mixture, VMEM-sized leaves."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        return False
    return (
        platform != "cpu"
        and jnp.dtype(dtype) == jnp.float32
        and tuple(kinds) == ("iso_se",)
        and batch_nmax % BLOCK == 0
        and batch_nmax <= MAX_VMEM_N
    )
