"""HBM-streaming blocked Cholesky (Mosaic/Pallas) for mid/large experts.

The reference's one hot op is LAPACK ``potrf!`` per leaf
(``/root/reference/src/gaussianprocess.jl:101``), which runs at machine
throughput at every leaf size. On this TPU (v5e), XLA's native Cholesky is
latency-bound below n≈16k (measured f32, d2h-fenced: 2.6 TF/s at
[4, 4096], 5.2 at [1, 8192], 10.1 at [1, 11664], 16.9 at [1, 16384] vs
the 17.1 TF/s f32-HIGHEST GEMM ceiling), and every XLA-level
recomposition measured WORSE (BASELINE.md "Cholesky throughput notes").
The 4-17k experts carry ~85% of the N=100k headline wall-clock, so this
kernel is the identified lever past the 1.64 s / 6.6%-MFU round-2 result.

Design — right-looking tiled factorization, one ``pallas_call``:

* the G-leaf batch is stacked INSIDE every op (``[G, B, B]`` tiles), so
  the factorization's sequential panel latency is amortized G ways — the
  same trick that made the VMEM-resident stacked kernel
  (``ops/pallas_chol.py``) beat XLA 1.26x at [64, 512];
* the matrices stay in HBM (``[G, n, n]`` at n = 4-17k is 64 MiB-1 GiB,
  far past the 16 MiB VMEM); tiles are streamed through VMEM scratch
  with double/triple-buffered async DMA so loads, MXU compute, and
  stores overlap;
* per panel step: the ``[G, B, B]`` diagonal block is factored with the
  proven two-stage scheme (batched 128-column sweep — the only
  sequential part — plus a block-doubling triangular inverse of masked
  batched matmuls), the sub-panel solve is one batched MXU matmul per
  row tile against ``inv(L11)``, and the rank-B trailing update streams
  ``A_ij -= L_ik L_jk^T`` tile by tile (lower triangle only);
* the result is written in place (``input_output_aliases``): the factor
  occupies the lower triangle; the strict upper triangle is left
  UNSPECIFIED (stale gram values). Every consumer in this package reads
  only the lower triangle (``solve_triangular(lower=True)`` ignores the
  other triangle under XLA; ``masked_logdet`` reads the diagonal);
  pass ``tril=True`` (an extra O(n²) pass) if a clean factor is needed.

float32 only, n a multiple of 256, G bounded by VMEM scratch (<= 4).
Validated against float64 Cholesky oracles in ``tests/test_pallas_potrf.py``
(interpreter on CPU, compiled + measured on TPU).

MEASURED OUTCOME (v5e, f32, d2h-fenced; the full optimization campaign —
fori vs unrolled sweeps, masked vs maskless column steps, static-slice
column access — is recorded in BASELINE.md "HBM-streaming potrf
campaign"): this kernel reaches PARITY with XLA's native batched
Cholesky at [4, 4096] (39.4 ms vs 41.8, logdet rel 9e-8) and loses at
[4, 5888] (60.3 vs 48.8). The per-COLUMN critical path (~4.5 µs per
column regardless of sweep width — tiny-op fixed costs, measured
identical for 32/128-wide sweeps) bounds any blocked formulation, and
the production streamed fit+predict bodies ALREADY overlap that latency
with solve/gram GEMMs through ``lax.map`` pipelining (measured 5.5-8.1
effective TF/s at nmax 4.5-6k — better than any isolated-Cholesky
rate). It is therefore NOT wired into the production paths: the
map-pipelined XLA body is faster than body-with-this-kernel could be.
Kept as a tested component for single-huge-factorization callers and as
the measured record of why (see ``supported``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256  # panel width: keeps the trailing update compute-bound
HALF = 128  # sweep block: the sequential critical path
MAX_G = 4  # VMEM scratch is 8 x [G, 256, 256] f32 = 2G MiB
MIN_N = 2048  # below this the VMEM-resident stacked kernel / XLA win

_HI = jax.lax.Precision.HIGHEST


def _bdot(a, b):
    """[G, m, k] @ [G, k, n] on the MXU, f32 accumulate."""
    return lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _bdotT(a, b):
    """[G, m, k] @ [G, n, k]^T. HIGHEST precision: the trailing update
    cancels O(||K||) down to O(noise); a bf16 pass yields negative
    diagonals (measured in the stacked kernel's development)."""
    return lax.dot_general(
        a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _sweep(D, h: int):
    """Unblocked lower Cholesky of [G, h, h] diagonal blocks: a batched
    h-step column sweep — the sequential critical path, amortized over
    the G stacked leaves.

    UNROLLED at trace time with the column index a Python constant
    (a ``fori_loop`` formulation costs ~4.4 µs of fixed Mosaic overhead
    per iteration, measured), and MASKLESS: the full symmetric rank-1
    reduction ``T -= s sᵀ`` with the UNSCALED-above-j column annihilates
    eliminated rows/columns exactly in exact arithmetic (column j after
    its own update becomes 0), so no below-mask or column write-back is
    needed — ``s_j`` IS the j-th column of L, collected and concatenated
    once at the end. f32 residues (~eps) land in the strict upper
    triangle, which the final tril mask removes."""
    bi = lax.broadcasted_iota(jnp.int32, (1, h, h), 1)
    bj = lax.broadcasted_iota(jnp.int32, (1, h, h), 2)

    T = D
    cols = []
    for j in range(h):
        colc = T[:, :, j : j + 1]  # [G, h, 1] static lane slice
        rinv = lax.rsqrt(colc[:, j : j + 1, :])  # [G, 1, 1]
        s = colc * rinv  # column j of L (rows < j hold ~eps residue)
        T = T - s * jnp.swapaxes(s, 1, 2)  # symmetric rank-1 reduction
        cols.append(s)
    L = jnp.concatenate(cols, axis=2)
    return jnp.where(bj <= bi, L, 0.0)


def _trinv(L, h: int):
    """inv(L) for lower-triangular [G, h, h] by block-doubling: log2(h)
    masked batched matmuls (X_{2m} = X_m - X_m (L ⊙ offdiag_m) X_m) —
    MXU work, no sequential loops."""
    bi = lax.broadcasted_iota(jnp.int32, (1, h, h), 1)
    bj = lax.broadcasted_iota(jnp.int32, (1, h, h), 2)
    d = jnp.sum(jnp.where(bi == bj, L, 0.0), axis=2, keepdims=True)
    X = jnp.where(bi == bj, 1.0 / d, 0.0)
    m = 1
    while m < h:
        off = ((bi // m) % 2 == 1) & ((bj // m) % 2 == 0) & (
            (bi // (2 * m)) == (bj // (2 * m))
        )
        Lo = jnp.where(off, L, 0.0)
        X = X - _bdot(_bdot(X, Lo), X)
        m *= 2
    return X


SWEEP_BASE = 32  # sweep-tile width: measured sweet spot (see below)


def _chol_trinv(A, h: int):
    """[G, h, h] SPD block -> (L, inv(L)) by 2x2 recursion down to
    ``SWEEP_BASE``-wide sweeps.

    The column sweep costs ~10 µs per column on [G, 128, 128] tiles
    (measured: 41 ms of a 55 ms n=4096 factorization was the diag+panel
    phase — the sweep alone ~1.3 ms per 128-block), because every
    column step issues ~10 full-tile VPU ops regardless of width. The
    recursion keeps the TOTAL column count identical but runs each step
    on [G, base, base] tiles (~8x fewer vregs per op), converting the
    bulk of the factorization into batched MXU matmuls."""
    if h <= SWEEP_BASE:
        L = _sweep(A, h)
        return L, _trinv(L, h)
    H = h // 2
    L11, X11 = _chol_trinv(A[:, :H, :H], H)
    L21 = _bdotT(A[:, H:, :H], X11)  # A21 @ inv(L11)^T
    S = A[:, H:, H:] - _bdotT(L21, L21)
    L22, X22 = _chol_trinv(S, H)
    X21 = -_bdot(X22, _bdot(L21, X11))
    zero = jnp.zeros_like(L21)
    L = jnp.concatenate(
        [jnp.concatenate([L11, zero], axis=2),
         jnp.concatenate([L21, L22], axis=2)], axis=1
    )
    X = jnp.concatenate(
        [jnp.concatenate([X11, zero], axis=2),
         jnp.concatenate([X21, X22], axis=2)], axis=1
    )
    return L, X


def _factor_block(D):
    """[G, 256, 256] SPD diagonal block -> (L, inv(L))."""
    return _chol_trinv(D, BLOCK)


def _potrf_kernel(a_any, out_any, dscr, xscr, ljs, libuf, tbuf,
                  sem_d, sem_li, sem_t, sem_ts, sem_pst, *, g: int, nb: int):
    """One grid step = one panel step k of the right-looking factorization.

    TPU grid steps run sequentially on the core; every DMA issued in a
    step is drained before the step ends, so step k+1 reads only
    completed writes.

    Read discipline: step k's trailing update rewrites the ENTIRE
    remaining [k+1:, k+1:] submatrix, so only step 0 ever reads pristine
    input — all later reads target regions the previous step stored.
    Step 0 therefore reads ``a_any`` and every later step reads
    ``out_any``, which is correct whether or not the runtime actually
    aliases the two buffers (Mosaic aliases them via
    ``input_output_aliases``; the interpreter copies).
    """
    B = BLOCK
    k = pl.program_id(0)
    s = k * B
    m = nb - 1 - k  # trailing block rows/cols
    first = k == 0

    def row_off(i):  # HBM row offset of trailing block i (0-based)
        return s + B + i * B

    def dual_start(dst, sem, r, c):
        """Start a [G, B, B] tile load from the input (step 0) or the
        in-progress output (later steps); wait via ``dual_wait``."""
        @pl.when(first)
        def _():
            pltpu.make_async_copy(
                a_any.at[:, pl.ds(r, B), pl.ds(c, B)], dst, sem).start()

        @pl.when(jnp.logical_not(first))
        def _():
            pltpu.make_async_copy(
                out_any.at[:, pl.ds(r, B), pl.ds(c, B)], dst, sem).start()

    def dual_wait(dst, sem, r, c):
        # both variants move the same byte count on the same semaphore,
        # so one descriptor serves the wait
        pltpu.make_async_copy(
            out_any.at[:, pl.ds(r, B), pl.ds(c, B)], dst, sem).wait()

    # ---- 1. diagonal block: load, factor, write back, keep inverse ----
    dual_start(dscr, sem_d, s, s)
    dual_wait(dscr, sem_d, s, s)
    L, X = _factor_block(dscr[:])
    dscr[:] = L
    xscr[:] = X
    st = pltpu.make_async_copy(
        dscr, out_any.at[:, pl.ds(s, B), pl.ds(s, B)], sem_d)
    st.start()
    st.wait()

    # ---- 2. panel solve: L21_i = E_i @ inv(L11)^T, double-buffered ----
    def e_start(slot, i):
        dual_start(libuf.at[slot], sem_li.at[slot], row_off(i), s)

    def e_wait(slot, i):
        dual_wait(libuf.at[slot], sem_li.at[slot], row_off(i), s)

    def p_store(slot, i):
        return pltpu.make_async_copy(
            tbuf.at[slot],
            out_any.at[:, pl.ds(row_off(i), B), pl.ds(s, B)],
            sem_pst.at[slot])

    @pl.when(m > 0)
    def _():
        e_start(0, 0)

    # UNROLLED over the static bound (m <= nb-1) with traced guards:
    # Mosaic's loop machinery costs ~4.4 µs per fori iteration (measured)
    # — predicated-off unrolled steps cost only a branch.
    for i in range(nb - 1):
        @pl.when(i < m)
        def _(i=i):
            slot = i % 2

            @pl.when(i + 1 < m)
            def _():
                e_start((i + 1) % 2, i + 1)

            e_wait(slot, i)

            if i >= 2:  # tbuf[slot]'s previous store must finish first
                p_store(slot, i - 2).wait()

            tbuf[slot] = _bdotT(libuf[slot], xscr[:])
            p_store(slot, i).start()

    @pl.when(m >= 2)
    def _():
        p_store((m - 2) % 2, m - 2).wait()

    @pl.when(m >= 1)
    def _():
        p_store((m - 1) % 2, m - 1).wait()

    # ---- 3. trailing update: A_ij -= L_ik L_jk^T, lower tiles only ----
    def li_load(slot, i):
        return pltpu.make_async_copy(
            out_any.at[:, pl.ds(row_off(i), B), pl.ds(s, B)],
            libuf.at[slot], sem_li.at[slot])

    def t_start(slot, i, j):
        dual_start(tbuf.at[slot], sem_t.at[slot], row_off(i), row_off(j))

    def t_wait(slot, i, j):
        dual_wait(tbuf.at[slot], sem_t.at[slot], row_off(i), row_off(j))

    def t_store(slot, i, j):
        return pltpu.make_async_copy(
            tbuf.at[slot],
            out_any.at[:, pl.ds(row_off(i), B), pl.ds(row_off(j), B)],
            sem_ts.at[slot])

    def outer(j, _):
        # L_jk resident for the whole column sweep
        ljl = pltpu.make_async_copy(
            out_any.at[:, pl.ds(row_off(j), B), pl.ds(s, B)], ljs, sem_d)
        ljl.start()
        ljl.wait()
        cnt = m - j  # inner tiles: i = j + t, t in [0, cnt)

        li_load(0, j).start()
        t_start(0, j, j)

        # unrolled with traced guards — see the panel-loop comment
        for t in range(nb - 1):
            @pl.when(t < cnt)
            def _(t=t):
                i = j + t
                slot = t % 3
                lslot = t % 2

                @pl.when(t + 1 < cnt)
                def _():  # prefetch tile t+1 (slot last stored at t-2)
                    if t >= 2:
                        t_store((t + 1) % 3, j + t - 2, j).wait()

                    li_load((t + 1) % 2, i + 1).start()
                    t_start((t + 1) % 3, i + 1, j)

                li_load(lslot, i).wait()
                t_wait(slot, i, j)
                tbuf[slot] = tbuf[slot] - _bdotT(libuf[lslot], ljs[:])
                t_store(slot, i, j).start()

        # drain this column's outstanding stores (slot cycle restarts
        # next column, so its waits cannot cover them)
        @pl.when(cnt >= 3)
        def _():
            t_store((cnt - 3) % 3, j + cnt - 3, j).wait()

        @pl.when(cnt >= 2)
        def _():
            t_store((cnt - 2) % 3, j + cnt - 2, j).wait()

        @pl.when(cnt >= 1)
        def _():
            t_store((cnt - 1) % 3, j + cnt - 1, j).wait()

        return 0

    lax.fori_loop(0, m, outer, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "tril"))
def hbm_blocked_cholesky(a, interpret: bool = False, tril: bool = False):
    """Batched lower Cholesky of SPD ``a [G, n, n]`` (float32, n a
    multiple of 256), computed in place in HBM with VMEM tile streaming.

    The strict upper triangle of the result is UNSPECIFIED unless
    ``tril=True`` (see module docstring). ``interpret=True`` runs the
    Pallas interpreter (CPU test suite).
    """
    g, n, n2 = a.shape
    if n != n2:
        raise ValueError(f"square matrices required, got {a.shape}")
    if n % BLOCK != 0:
        raise ValueError(f"n must be a multiple of {BLOCK}, got {n}")
    if g > MAX_G:
        raise ValueError(f"G={g} exceeds the VMEM scratch bound {MAX_G}")
    nb = n // BLOCK
    kern = functools.partial(_potrf_kernel, g=g, nb=nb)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((g, n, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g, BLOCK, BLOCK), jnp.float32),  # dscr: diag/L11
            pltpu.VMEM((g, BLOCK, BLOCK), jnp.float32),  # xscr: inv(L11)
            pltpu.VMEM((g, BLOCK, BLOCK), jnp.float32),  # ljs: L_jk
            pltpu.VMEM((2, g, BLOCK, BLOCK), jnp.float32),  # libuf
            pltpu.VMEM((3, g, BLOCK, BLOCK), jnp.float32),  # tbuf
            pltpu.SemaphoreType.DMA(()),  # sem_d (serial diag/Lj DMAs)
            pltpu.SemaphoreType.DMA((2,)),  # sem_li
            pltpu.SemaphoreType.DMA((3,)),  # sem_t
            pltpu.SemaphoreType.DMA((3,)),  # sem_ts
            pltpu.SemaphoreType.DMA((2,)),  # sem_pst
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=int(g * n**3 / 3),
            bytes_accessed=int(g * n * n * 4 * (1 + n // BLOCK / 2)),
            transcendentals=0,
        ),
    )(a.astype(jnp.float32))
    if tril:
        out = jnp.tril(out)
    return out


def supported(n: int, g: int, dtype) -> bool:
    """Whether the HBM-streaming kernel applies: TPU platform (incl. the
    'axon' single-chip tunnel), float32, 256-aligned mid/large sizes,
    VMEM-bounded stack depth."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        return False
    return (
        platform in ("tpu", "axon")
        and jnp.dtype(dtype) == jnp.float32
        and n % BLOCK == 0
        and n >= MIN_N
        and 1 <= g <= MAX_G
    )


def good_chunk(n: int, budget_bytes: int = 2 << 30) -> int:
    """Leaves per kernel call: as many as the HBM budget allows (the
    [G, n, n] gram is donated to the factor, so ~2 copies peak with the
    solve workspace), capped by the VMEM scratch bound."""
    per = 2 * n * n * 4
    return max(1, min(MAX_G, budget_bytes // per))
