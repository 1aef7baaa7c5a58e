"""Distributed blocked Cholesky over the device mesh.

The reference caps every expert at one host's memory: a leaf GP's covariance
is a dense [N, N] Julia array factored by one LAPACK ``potrf!``
(``gaussianprocess.jl:101``). This module removes that cap — the TPU-native
"scale the big dimension" mechanism called out in SURVEY §5: when a single
leaf's covariance exceeds one chip's HBM, the matrix is *row-sharded* across
the ICI mesh and factored by a right-looking blocked Cholesky in which

  1. the owner chip factors the B x B diagonal block locally,
  2. the factored panel is broadcast over ICI (``psum`` of a one-hot
     contribution — XLA lowers it to a broadcast),
  3. every chip updates its own rows: a triangular solve against the
     diagonal block followed by a rank-B MXU trailing update restricted to
     the not-yet-factored columns.

Communication is O(N^2) total (one [B, N] panel broadcast per step) against
O(N^3) compute — the classic ScaLAPACK pattern, expressed with
``shard_map`` + ``jax.lax`` collectives instead of MPI.

All shapes are static; the panel loop is a ``lax.fori_loop`` whose
per-step owner/row masks are computed from traced indices, so one compiled
program serves every N. HIGHEST matmul precision throughout (same
cancellation argument as ``ops/cholesky.py``).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import EXPERT_AXIS

HIGH = jax.lax.Precision.HIGHEST

# Program factories below are lru_cached on their static configuration
# (mesh, axis, blocking, sizes): repeated calls — e.g. a mesh-fitted
# GaussianProcess serving predict() — reuse one traced+compiled program
# instead of re-tracing the whole blocked fori_loop pipeline per call.


def _check_blocking(N: int, ndev: int, block: int):
    """Validate the (mesh, block) layout shared by every distributed op:
    rows per device and blocks must tile exactly, and each panel must lie
    within one shard. Raises instead of silently truncating the iteration
    (``N // block``) or letting ``dynamic_slice`` clamp out-of-range
    offsets into wrong rows."""
    if N % ndev != 0:
        raise ValueError(f"N={N} not divisible by mesh size {ndev}")
    rows = N // ndev
    if rows % block != 0:
        raise ValueError(
            f"per-device rows {rows} not divisible by block {block}; "
            f"use a block <= {rows} that divides it"
        )
    return rows, block


def _local_cholesky_step(A_loc, Ldone_loc, k, *, block, rows, axis):
    """One panel step of the right-looking factorization.

    ``A_loc [rows, N]``: this chip's rows of the trailing matrix;
    ``Ldone_loc [rows, N]``: this chip's rows of the factor built so far.
    """
    me = lax.axis_index(axis)
    N = A_loc.shape[1]
    s = k * block

    # --- global/local row coordinates ------------------------------------
    gri = me * rows + lax.broadcasted_iota(jnp.int32, (rows, 1), 0)  # [r,1]
    cj = lax.broadcasted_iota(jnp.int32, (1, N), 1)  # [1,N]

    # --- 1. diagonal block on its owner ----------------------------------
    owner = s // rows  # panel rows assumed within one shard (block | rows)
    lo = s - owner * rows  # local row offset on the owner
    # every chip slices [block, block] at its own guess; only the owner's is
    # real — zero elsewhere and broadcast by psum.
    lo_safe = jnp.where(me == owner, lo, 0)
    Dblk = lax.dynamic_slice(A_loc, (lo_safe, s), (block, block))
    Dblk = jnp.where(me == owner, Dblk, 0.0)
    Dblk = lax.psum(Dblk, axis)
    Lbb = jnp.linalg.cholesky(Dblk)  # [B, B] replicated

    # --- 2. panel solve on every chip -------------------------------------
    # E = A[:, s:s+B] for rows strictly below the panel: E = L21 Lbb^T
    # => L21 = E Lbb^{-T}  (triangular solve from the right).
    Eloc = lax.dynamic_slice(A_loc, (0, s), (rows, block))
    below = gri >= s + block  # [r, 1]
    Eloc = jnp.where(below, Eloc, 0.0)
    L21 = lax.linalg.triangular_solve(
        Lbb, Eloc, left_side=False, lower=True, transpose_a=True
    )  # [rows, B]

    # the owner's panel rows carry Lbb itself
    in_panel = (gri >= s) & (gri < s + block)  # [r, 1]
    lrow = jnp.clip(gri - s, 0, block - 1)[:, 0]  # local panel row ids
    Lbb_rows = Lbb[lrow]  # [rows, B]
    panel_loc = jnp.where(in_panel, Lbb_rows, L21)  # [rows, B]

    # --- 3. write the panel into the factor -------------------------------
    colmask = (cj >= s) & (cj < s + block)  # [1, N]
    panel_full = jnp.zeros_like(Ldone_loc)
    panel_full = lax.dynamic_update_slice(panel_full, panel_loc, (0, s))
    Ldone_loc = jnp.where(colmask, panel_full, Ldone_loc)

    # --- 4. trailing update over ICI ---------------------------------------
    # every chip needs the full [N, B] panel to update its rows against all
    # trailing columns: one all-gather per step.
    panel_all = lax.all_gather(
        jnp.where(below, L21, 0.0), axis, axis=0, tiled=True
    )  # [N, B] (zeros for rows <= s+B)
    upd = jnp.matmul(
        jnp.where(below, L21, 0.0), panel_all.T, precision=HIGH
    )  # [rows, N]
    trailing = (cj >= s + block)
    A_loc = jnp.where(below & trailing, A_loc - upd, A_loc)
    return A_loc, Ldone_loc


def sharded_cholesky(A, mesh: Mesh, axis: str = EXPERT_AXIS, block: int = 256):
    """Lower Cholesky factor of SPD ``A [N, N]``, row-sharded over ``mesh``.

    ``N`` must be divisible by ``num_devices * block`` (pad with identity
    rows via :func:`ops.cholesky.pad_identity` for ragged sizes, exactly as
    the leaf batches do). Returns ``L`` with the same row sharding.
    """
    N = A.shape[0]
    ndev = mesh.shape[axis]
    rows, block = _check_blocking(N, ndev, block)
    run = _cholesky_prog(mesh, axis, block, rows, N)
    A = jax.device_put(A, NamedSharding(mesh, P(axis, None)))
    return run(A)


@lru_cache(maxsize=64)
def _cholesky_prog(mesh: Mesh, axis: str, block: int, rows: int, N: int):
    nsteps = N // block
    spec = P(axis, None)

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )
    def run(A_loc):
        Ldone = jnp.zeros_like(A_loc)

        def body(k, carry):
            A_loc, Ldone = carry
            return _local_cholesky_step(
                A_loc, Ldone, k, block=block, rows=rows, axis=axis
            )

        _, Ldone = lax.fori_loop(0, nsteps, body, (A_loc, Ldone))
        # keep only the lower triangle
        me = lax.axis_index(axis)
        gri = me * rows + lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        cj = lax.broadcasted_iota(jnp.int32, (1, A_loc.shape[1]), 1)
        return jnp.where(cj <= gri, Ldone, 0.0)

    return run


def sharded_solve_lower(Lf, b, mesh: Mesh, axis: str = EXPERT_AXIS,
                        block: int = 256):
    """Forward substitution ``L X = B`` with ``Lf [N, N]`` row-sharded and
    ``b`` a vector ``[N]`` or matrix ``[N, T]`` (multi-RHS: the predictive
    cross-covariance solve, ≙ ``gp.cK.L \\ Knt``).

    Blocked: per step the owner solves its ``B``-block against the running
    residual, the solution block is broadcast, and every chip updates its
    residual rows with one MXU matmul — the distributed counterpart of the
    alpha solve (``gaussianprocess.jl:105``).
    """
    N = Lf.shape[0]
    ndev = mesh.shape[axis]
    rows, block = _check_blocking(N, ndev, block)
    vec = b.ndim == 1
    B2 = b[:, None] if vec else b
    T = B2.shape[1]
    run = _solve_lower_prog(mesh, axis, block, rows, N, T)
    Lf = jax.device_put(Lf, NamedSharding(mesh, P(axis, None)))
    B2 = jax.device_put(B2, NamedSharding(mesh, P(axis, None)))
    out = run(Lf, B2)
    return out[:, 0] if vec else out


@lru_cache(maxsize=64)
def _solve_lower_prog(mesh: Mesh, axis: str, block: int, rows: int,
                      N: int, T: int):
    nsteps = N // block
    spec = P(axis, None)

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def run(L_loc, b_loc):
        me = lax.axis_index(axis)
        gri = me * rows + lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

        def body(k, carry):
            b_loc, x_loc = carry
            s = k * block
            owner = s // rows
            lo = jnp.where(me == owner, s - owner * rows, 0)
            Dblk = lax.dynamic_slice(L_loc, (lo, s), (block, block))
            rblk = lax.dynamic_slice(b_loc, (lo, 0), (block, T))
            Dblk = jnp.where(me == owner, Dblk, 0.0)
            rblk = jnp.where(me == owner, rblk, 0.0)
            Dblk = lax.psum(Dblk, axis)
            rblk = lax.psum(rblk, axis)
            xblk = lax.linalg.triangular_solve(
                Dblk, rblk, left_side=True, lower=True
            )  # [B, T]
            # write the solved block into x
            in_blk = gri >= s
            in_blk &= gri < s + block
            xfull = jnp.zeros_like(x_loc)
            xfull = lax.dynamic_update_slice(
                xfull, xblk, (jnp.where(me == owner, s - owner * rows, 0), 0)
            )
            x_loc = jnp.where(me == owner, jnp.where(in_blk, xfull, x_loc), x_loc)
            # residual update for rows below the block
            Lcol = lax.dynamic_slice(L_loc, (0, s), (rows, block))
            below = gri >= s + block
            b_loc = jnp.where(
                below,
                b_loc - jnp.matmul(Lcol, xblk, precision=HIGH),
                b_loc,
            )
            return b_loc, x_loc

        _, x_loc = lax.fori_loop(
            0, nsteps, body, (b_loc, jnp.zeros_like(b_loc))
        )
        return x_loc

    return run


def sharded_solve_lower_t(Lf, z, mesh: Mesh, axis: str = EXPERT_AXIS,
                          block: int = 256):
    """Backward substitution ``L^T x = z`` on the row-sharded lower ``Lf``
    — the second half of the alpha solve, iterating blocks last-to-first
    directly on ``Lf`` (no flipped/transposed N x N copy; the cross-shard
    reduction ``sum_j L_jk^T x_j`` is one psum of a [B] vector per step).
    """
    N = Lf.shape[0]
    ndev = mesh.shape[axis]
    rows, block = _check_blocking(N, ndev, block)
    run = _solve_lower_t_prog(mesh, axis, block, rows, N)
    Lf = jax.device_put(Lf, NamedSharding(mesh, P(axis, None)))
    z = jax.device_put(z, NamedSharding(mesh, P(axis)))
    return run(Lf, z)


@lru_cache(maxsize=64)
def _solve_lower_t_prog(mesh: Mesh, axis: str, block: int, rows: int, N: int):
    nsteps = N // block
    spec = P(axis, None)
    vspec = P(axis)

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, vspec),
        out_specs=vspec,
        check_vma=False,
    )
    def run(L_loc, z_loc):
        me = lax.axis_index(axis)
        gri = me * rows + lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

        def body(t, x_loc):
            k = nsteps - 1 - t
            s = k * block
            owner = s // rows
            lo = jnp.where(me == owner, s - owner * rows, 0)
            # cross-shard reduction: sum_j>s+B  L[j, s:s+B]^T x[j]
            Lcol = lax.dynamic_slice(L_loc, (0, s), (rows, block))
            xa = jnp.where(gri[:, 0] >= s + block, x_loc, 0.0)
            partial_ = jnp.matmul(Lcol.T, xa, precision=HIGH)  # [B]
            tot = lax.psum(partial_, axis)
            # owner solves its transposed diagonal block
            Dblk = lax.dynamic_slice(L_loc, (lo, s), (block, block))
            zblk = lax.dynamic_slice(z_loc, (lo,), (block,))
            Dblk = jnp.where(me == owner, Dblk, 0.0)
            zblk = jnp.where(me == owner, zblk, 0.0)
            Dblk = lax.psum(Dblk, axis)
            zblk = lax.psum(zblk, axis) - tot
            xblk = lax.linalg.triangular_solve(
                Dblk, zblk[:, None], left_side=True, lower=True,
                transpose_a=True,
            )[:, 0]
            in_blk = (gri[:, 0] >= s) & (gri[:, 0] < s + block)
            xfull = jnp.zeros_like(x_loc)
            xfull = lax.dynamic_update_slice(
                xfull, xblk, (jnp.where(me == owner, s - owner * rows, 0),)
            )
            return jnp.where(me == owner, jnp.where(in_blk, xfull, x_loc),
                             x_loc)

        return lax.fori_loop(0, nsteps, body, jnp.zeros_like(z_loc))

    return run


@lru_cache(maxsize=64)
def _gram_rows_prog(mesh: Mesh, axis: str, kind: str, N: int, valid_n: int,
                    eps: float):
    """Row-sharded noisy gram with identity padding past ``valid_n``.
    Hypers are ARGUMENTS (replicated specs), not closure constants, so the
    cached program stays correct across ``set_params`` refits."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def run(x_rows, x_all, logl, logsigma, lognoise):
        # shard-local block of the gram — same kernel function as the
        # single-chip path (kernels.gram), so precision/jitter fixes there
        # automatically reach the distributed path.
        from ..kernels import gram

        K = gram(kind, logl, logsigma, x_rows, x_all)
        me = lax.axis_index(axis)
        rows = x_rows.shape[0]
        gri = me * rows + lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        cj = lax.broadcasted_iota(jnp.int32, (1, N), 1)
        noise = jnp.exp(2.0 * lognoise) + eps
        Kn = K + noise * (cj == gri)
        # identity-pad rows/cols past valid_n (exact no-ops downstream,
        # same convention as ops.cholesky.pad_identity)
        valid = (gri < valid_n) & (cj < valid_n)
        return jnp.where(valid, Kn, (cj == gri).astype(Kn.dtype))

    return run


def sharded_gp_fit(x, y, logl, logsigma, lognoise, mesh: Mesh,
                   axis: str = EXPERT_AXIS, block: int = 256,
                   eps: float = 1e-8, valid_n=None, kind: str = "iso_se",
                   return_factor: bool = False):
    """Exact-GP fit of ONE giant leaf whose covariance exceeds a single
    chip: builds the gram row-sharded (each chip computes only its rows),
    factors it with :func:`sharded_cholesky`, and returns ``(alpha [N],
    mll)`` via two distributed triangular solves.

    This is the multi-chip replacement for ``update_cholesky!`` + ``mll``
    (``gaussianprocess.jl:87-108,163``) on experts past one-chip HBM.

    ``valid_n``: true observation count when ``x``/``y`` were padded up to
    the ``num_devices * block`` tiling (pad with ANY rows; they are masked
    to identity here — padding ``x`` without this would insert real kernel
    rows and corrupt alpha/mll). ``kind``: any kernel kind from
    ``kernels.gram`` (``logl`` is then a per-dimension vector for ARD
    kinds).
    """
    N = x.shape[0]
    valid_n = N if valid_n is None else int(valid_n)
    gram_rows = _gram_rows_prog(mesh, axis, kind, N, valid_n, eps)
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    y = jnp.where(jnp.arange(N) < valid_n, y, 0.0)
    K = gram_rows(xs, x, jnp.atleast_1d(jnp.asarray(logl)),
                  jnp.asarray(logsigma), jnp.asarray(lognoise))
    Lf = sharded_cholesky(K, mesh, axis=axis, block=block)
    z = sharded_solve_lower(Lf, y, mesh, axis=axis, block=block)
    alpha = sharded_solve_lower_t(Lf, z, mesh, axis=axis, block=block)
    # identity padding rows contribute log(1) = 0 to the logdet and 0 to
    # the quadratic term (y is zeroed there), so only the 2π count needs
    # the true size.
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lf)))
    mll = -0.5 * (
        jnp.dot(y, alpha, precision=HIGH)
        + logdet
        + valid_n * jnp.log(2.0 * jnp.pi)
    )
    if return_factor:
        return alpha, mll, Lf
    return alpha, mll


@lru_cache(maxsize=64)
def _cross_rows_prog(mesh: Mesh, axis: str, kind: str, valid_n: int):
    """Row-sharded cross-covariance K_nt with padding rows zeroed; hypers
    as replicated arguments (cache-safe across refits)."""
    from ..kernels import gram

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def run(x_rows, xt_all, logl, logsigma):
        Knt = gram(kind, logl, logsigma, x_rows, xt_all)
        me = lax.axis_index(axis)
        rows = x_rows.shape[0]
        gri = me * rows + lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        return jnp.where(gri < valid_n, Knt, 0.0)  # padding rows inert

    return run


def sharded_gp_predict(Lf, x, alpha, logl, logsigma, lognoise, xt,
                       mesh: Mesh, axis: str = EXPERT_AXIS,
                       block: int = 256, mean: float = 0.0, valid_n=None,
                       kind: str = "iso_se"):
    """Posterior prediction of the giant sharded leaf: ``(mu [T], var [T])``
    with observation noise on the diagonal (≙ ``prediction``,
    ``gaussianprocess.jl:110-137``), the cross-covariance built row-sharded
    and solved by the distributed multi-RHS forward substitution.
    """
    from ..kernels import gram, gram_diag

    N = x.shape[0]
    valid_n = N if valid_n is None else int(valid_n)
    logl_v = jnp.atleast_1d(jnp.asarray(logl))
    cross_rows = _cross_rows_prog(mesh, axis, kind, valid_n)
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    Knt = cross_rows(xs, xt, logl_v, jnp.asarray(logsigma))  # [N, T] sharded
    mu = mean + jnp.matmul(Knt.T, alpha, precision=HIGH)
    V = sharded_solve_lower(Lf, Knt, mesh, axis=axis, block=block)  # [N, T]
    ktt = gram_diag(kind, logl_v, jnp.asarray(logsigma), xt)
    noise = jnp.exp(2.0 * jnp.asarray(lognoise))
    var = ktt - jnp.sum(V * V, axis=0) + noise
    return mu, var
