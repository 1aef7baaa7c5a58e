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

Validated against ``jnp.linalg.cholesky`` oracles in
``tests/test_pallas_chol.py``; the bucketed execution paths select it for
qualifying buckets on TPU (see ``fit.py``).
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
    # Mosaic forbids dynamic lane-dimension indexing, so the unblocked panel
    # sweep extracts/writes columns with masked full-tile ops (multiply +
    # reduce) instead of dynamic slices; the O(N^2 B) bulk stays on the MXU
    # in the trailing update.
    nb = nmax // BLOCK
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nmax, 1), 0)  # [N, 1]
    pcols0 = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)  # [1, B]

    for kb in range(nb):
        s = kb * BLOCK
        pcols = pcols0 + s  # global column ids of this panel
        # selector (s+m, m) pairs: row s+m of column m
        panel_rowsel = (row_ids - s) == pcols0  # [N, B]

        def col_step(j, tile):
            c = s + j
            colmask = (pcols == c).astype(tile.dtype)  # [1, B]
            colc = jnp.sum(tile * colmask, axis=1, keepdims=True)  # [N, 1]
            diag_val = jnp.sum(jnp.where(row_ids == c, colc, 0.0))
            rinv = jax.lax.rsqrt(diag_val)
            below = row_ids > c
            scaled = jnp.where(below, colc * rinv, 0.0)  # l_c below diag
            newcol = scaled + jnp.where(row_ids == c, diag_val * rinv, 0.0)
            # l_c at panel-row positions as a [1, B] row vector
            w = jnp.sum(panel_rowsel * scaled, axis=0, keepdims=True)
            w = jnp.where(pcols > c, w, 0.0)
            tile = tile - scaled * w  # rank-1 update of remaining columns
            tile = jnp.where(pcols == c, newcol, tile)  # write column c
            return tile

        tile = out_ref[0, :, s : s + BLOCK]  # [N, B]
        tile = jax.lax.fori_loop(0, BLOCK, col_step, tile)
        out_ref[0, :, s : s + BLOCK] = tile

        if kb + 1 < nb:
            panel = jnp.where(row_ids >= s + BLOCK, tile, 0.0)
            # HIGHEST precision (3-pass bf16 decomposition) is required: the
            # trailing update cancels O(||K||) terms down to O(noise), which
            # a single bf16 MXU pass cannot represent (negative diagonals →
            # NaN for ill-conditioned SE grams).
            upd = jax.lax.dot_general(
                panel, panel,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[0] = out_ref[0] - upd

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
