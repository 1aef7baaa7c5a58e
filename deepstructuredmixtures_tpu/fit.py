"""Posterior fitting: batched and shared-Cholesky paths.

TPU-native equivalent of the reference ``src/fit.jl``:

* ``fit_batched`` — factorize every leaf fresh in one batched program
  (≙ ``fit_naive!``, ``fit.jl:294-304``, but parallel over the MXU instead
  of a sequential CPU loop). This is the idiomatic TPU default: all leaf
  covariances live in one ``[L, Nmax, Nmax]`` batch and XLA runs the
  Choleskys concurrently.
* ``fit_shared`` — execute the precompiled factor-reuse schedule
  (≙ ``fit!``, ``fit.jl:67-292``): fully factorize main leaves, then derive
  the remaining factors by verbatim copy (identical observation sets,
  ``fit.jl:132-143``), batched Givens row-deletion (subset leaves,
  ``fit.jl:145-206``), or batched continue-Cholesky (prefix-extension
  leaves, ``fit.jl:208-292``), each group as one vmapped kernel. PSD
  fallbacks (``fit.jl:197-201,280-290``) are expressed as a masked fresh
  factorization over the derived groups (``safe=True``).

NOTE the reference calls ``update_cholesky!(jGP)`` unconditionally before
its case analysis (``fit.jl:105``), which nullifies the savings; per
SURVEY §7 we implement the *intended* sharing, not that defect.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .config import EPS
from .hyper import HyperLayout
from .leafgp import (
    LeafBatch,
    LeafPosterior,
    leaf_gram,
    leaf_noise,
    posterior_from_chol,
)
from .ops import cholesky as chol
from .plan import SharedSchedule


def _noisy_gram(layout, theta, batch):
    K = leaf_gram(layout, theta, batch)
    noise = leaf_noise(layout, theta, batch)
    return chol.masked_gram_noise(K, batch.mask, noise, EPS)


def _maybe_pallas_chol(layout, theta, batch: LeafBatch):
    """Factors via the fused Pallas gram+Cholesky kernel when it applies
    (TPU, float32, single-IsoSE layout, VMEM-sized leaves; measured 1.26x
    faster than the XLA gram+cholesky at [64, 512] — see
    ``ops/pallas_chol.py``), else ``None``. Handles both tied (``theta
    [P]``) and per-leaf untied (``theta [L, P]``, post-finetune) hypers —
    the kernel takes per-leaf scalars either way. Forward
    (non-differentiated) paths only: the kernel defines no VJP."""
    from .hyper import unpack
    from .ops import pallas_chol

    if jnp.ndim(theta) not in (1, 2) or len(layout.kinds) != 1:
        return None
    if not pallas_chol.supported(batch.nmax, batch.x.dtype, layout.kinds):
        return None
    logl, logsigma, lognoise = unpack(layout, theta, 0)
    L = batch.num_leaves
    if jnp.ndim(theta) == 1:
        ones = jnp.ones((L,), batch.x.dtype)
        logl_v = logl[0] * ones
        logsigma_v = logsigma * ones
        noise_v = jnp.exp(2.0 * lognoise) * ones
    else:  # per-leaf rows [L, P]
        if theta.shape[0] != L:
            return None
        logl_v = logl[:, 0]
        logsigma_v = logsigma
        noise_v = jnp.exp(2.0 * lognoise)
    return pallas_chol.fused_gram_cholesky(
        batch.x, batch.n, logl_v, logsigma_v, noise_v, eps=EPS,
    )


def fit_batched(layout: HyperLayout, theta, batch: LeafBatch,
                chunk: Optional[int] = None,
                use_pallas: Optional[bool] = None) -> LeafPosterior:
    """Fresh batched factorization of all leaves.

    ``chunk`` bounds peak memory: leaves are processed ``chunk`` at a time
    with ``lax.map`` (factors are still all materialized in the result; use
    the streaming helpers in ``train.py`` when factors must not persist).
    ``use_pallas``: route the gram+Cholesky through the fused Pallas
    kernel; ``None`` auto-enables whenever it applies.
    """
    if chunk is None or chunk >= batch.num_leaves:
        Lf = (
            _maybe_pallas_chol(layout, theta, batch)
            if use_pallas is not False
            else None
        )
        if Lf is None:
            if use_pallas:
                raise ValueError(
                    "use_pallas=True but the fused kernel does not apply "
                    "(needs TPU, float32, one IsoSE kernel, tied hypers, "
                    "nmax a multiple of 128 and <= 1024)"
                )
            Kn = _noisy_gram(layout, theta, batch)
            Lf = chol.cholesky_nosym(Kn)
        return posterior_from_chol(Lf, batch)

    if use_pallas:
        raise ValueError(
            "use_pallas=True requires the unchunked path (chunk=None or "
            ">= num_leaves); the fused kernel materializes all factors"
        )
    L = batch.num_leaves
    pad = (-L) % chunk

    def pad_leaf(a):
        return jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0) if pad else a

    bpad = LeafBatch(*[pad_leaf(a) for a in batch])
    nchunks = bpad.num_leaves // chunk

    def body(i):
        sl = lambda a: lax.dynamic_slice_in_dim(a, i * chunk, chunk, axis=0)
        b = LeafBatch(*[sl(a) for a in bpad])
        th = theta if theta.ndim == 1 else sl(theta)
        Kn = _noisy_gram(layout, th, b)
        Lf = chol.cholesky_nosym(Kn)
        return posterior_from_chol(Lf, b)

    out = lax.map(body, jnp.arange(nchunks))
    merged = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:])[:L], out
    )
    return LeafPosterior(*merged)


def fit_shared(
    layout: HyperLayout,
    theta,
    batch: LeafBatch,
    schedule: SharedSchedule,
    safe: bool = True,
    with_diagnostics: bool = False,
) -> LeafPosterior:
    """Factor-reuse fit following the precompiled schedule.

    ``with_diagnostics=True`` additionally returns ``(del_fallbacks,
    cont_fallbacks)`` — how many derived factors failed the PSD guard and
    were recomputed fresh (≙ the reference's ``@warn`` + refactorize
    fallbacks, ``fit.jl:197-201,280-290``).

    Requires TIED hypers (``theta`` 1-D): every derivation rule assumes the
    leaf and its main share one covariance function. With per-leaf hypers
    (post-``finetune``) those identities are false and derived factors
    would be silently wrong; the reference likewise refits each leaf fully
    under its own hypers after fine-tuning (``finetuning.jl:74-85``)."""
    if jnp.ndim(theta) != 1:
        raise ValueError(
            "fit_shared requires tied hypers (theta 1-D); per-leaf hypers "
            "invalidate factor reuse — use fit_batched"
        )
    L, n = batch.num_leaves, batch.nmax
    del_fb = jnp.zeros((), jnp.int32)
    cont_fb = jnp.zeros((), jnp.int32)
    Kn = _noisy_gram(layout, theta, batch)

    eye = jnp.broadcast_to(jnp.eye(n, dtype=Kn.dtype), (L, n, n))
    Lf = eye

    # Phase 1: full factorizations (mains + unshareable leaves).
    fidx = jnp.asarray(schedule.full_idx)
    if schedule.full_idx.size:
        Lf = Lf.at[fidx].set(chol.cholesky_nosym(Kn[fidx]))

    # Phase 2a: Givens row-deletion for strict-subset leaves.
    if schedule.del_j.size:
        src = Lf[jnp.asarray(schedule.del_i)]
        pos = jnp.asarray(schedule.del_pos)
        nd = jnp.asarray(schedule.del_ndel)
        upd = jax.vmap(chol.givens_delete_rows)(src, pos, nd)
        keep = jnp.asarray(schedule.del_keep)  # [Gd, Nmax]
        gathered = jax.vmap(lambda M, k: M[k][:, k])(upd, keep)
        jmask = batch.mask[jnp.asarray(schedule.del_j)]
        derived = chol.pad_identity(jnp.tril(gathered), jmask)
        if safe:
            ok = chol.factor_is_valid(derived, jmask)
            fresh = chol.cholesky_nosym(Kn[jnp.asarray(schedule.del_j)])
            derived = jnp.where(ok[:, None, None], derived, fresh)
            del_fb = jnp.sum(~ok).astype(jnp.int32)
        Lf = Lf.at[jnp.asarray(schedule.del_j)].set(derived)

    # Phase 2b: (delete-then-)continue-Cholesky. The main's factor is
    # row-deleted down to the factor of the leaf's leading observations
    # (no-op for pure prefix extensions), gathered into the leading block,
    # and the factorization continues from row P (≙ the intended superset
    # path of fit.jl:208-292; see plan._share_case).
    if schedule.cont_j.size:
        A = Kn[jnp.asarray(schedule.cont_j)]
        Ltop = Lf[jnp.asarray(schedule.cont_i)]
        if schedule.cont_del_ndel.max(initial=0) > 0:
            Ltop = jax.vmap(chol.givens_delete_rows)(
                Ltop,
                jnp.asarray(schedule.cont_del_pos),
                jnp.asarray(schedule.cont_del_ndel),
            )
            Ltop = jax.vmap(lambda M, k: M[k][:, k])(
                Ltop, jnp.asarray(schedule.cont_keep)
            )
        P = jnp.asarray(schedule.cont_p)
        derived = jax.vmap(chol.chol_continue)(A, Ltop, P)
        jmask = batch.mask[jnp.asarray(schedule.cont_j)]
        derived = chol.pad_identity(derived, jmask)
        if safe:
            ok = chol.factor_is_valid(derived, jmask)
            fresh = chol.cholesky_nosym(A)
            derived = jnp.where(ok[:, None, None], derived, fresh)
            cont_fb = jnp.sum(~ok).astype(jnp.int32)
        Lf = Lf.at[jnp.asarray(schedule.cont_j)].set(derived)

    # Phase 2c: verbatim copies last (identical observation sets →
    # identical covariance under tied hypers; fit.jl:132-143). Copy sources
    # may themselves be delete/continue-derived, hence the ordering.
    if schedule.copy_j.size:
        Lf = Lf.at[jnp.asarray(schedule.copy_j)].set(
            Lf[jnp.asarray(schedule.copy_i)]
        )

    post = posterior_from_chol(Lf, batch)
    if with_diagnostics:
        return post, (del_fb, cont_fb)
    return post


def _pad_batch(batch: LeafBatch, chunk: int):
    """Pad the leaf axis to a multiple of ``chunk`` with inert (fully
    masked) leaves."""
    L = batch.num_leaves
    pad = (-L) % chunk
    if pad == 0:
        return batch, 0

    def pad_arr(a):
        z = jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)
        return jnp.concatenate([a, z], axis=0)

    return LeafBatch(*[pad_arr(a) for a in batch]), pad


def default_chunk(nmax: int, dtype, budget_bytes: int = 2 << 30) -> int:
    """Leaf-chunk size bounding peak memory of one [chunk, Nmax, Nmax]
    covariance + factor + workspace at roughly ``budget_bytes``."""
    item = jnp.dtype(dtype).itemsize
    per_leaf = 4 * nmax * nmax * item  # K, L, and ~2x workspace
    return max(1, budget_bytes // per_leaf)


def fit_light(layout: HyperLayout, theta, batch: LeafBatch,
              chunk: Optional[int] = None) -> LeafPosterior:
    """Memory-bounded fit: computes leaf mlls in leaf chunks WITHOUT
    materializing the [L, Nmax, Nmax] factors or the alpha weights (both
    ``chol`` and ``alpha`` of the result are None — the forward solve
    alone yields the likelihood, and prediction re-derives everything
    chunk-wise via :func:`streamed_leaf_predict`). This is the required
    mode when ``L * Nmax^2`` exceeds HBM (e.g. the N=100k benchmark)."""
    from .leafgp import centered_y, leaf_mll_forward

    chunk = min(chunk or default_chunk(batch.nmax, batch.x.dtype),
                batch.num_leaves)
    bpad, _ = _pad_batch(batch, chunk)
    L = batch.num_leaves
    nchunks = bpad.num_leaves // chunk
    if theta.ndim == 2 and theta.shape[0] != bpad.num_leaves:
        theta = jnp.concatenate(
            [theta,
             jnp.zeros((bpad.num_leaves - L,) + theta.shape[1:], theta.dtype)]
        )

    def body(i):
        sl = lambda a: lax.dynamic_slice_in_dim(a, i * chunk, chunk, axis=0)
        b = LeafBatch(*[sl(a) for a in bpad])
        th = theta if theta.ndim == 1 else sl(theta)
        Lf = _maybe_pallas_chol(layout, th, b)  # fused path (small buckets)
        if Lf is None:
            Kn = _noisy_gram(layout, th, b)
            Lf = chol.cholesky_nosym(Kn)
        yc = centered_y(b)
        # mll needs only the FORWARD solve: y'alpha = ||L^{-1}y||^2. The
        # transposed solve (alpha itself) is skipped — a single-rhs
        # triangular solve is latency-bound (~7ms at n≈11k on v5e) and its
        # result is unused in the light/streamed paths.
        z = chol.solve_lower(Lf, yc[..., None])[..., 0]
        return leaf_mll_forward(Lf, z, b)

    mll = lax.map(body, jnp.arange(nchunks))
    mll = mll.reshape(-1)[:L]
    return LeafPosterior(None, None, mll)


def streamed_leaf_predict(
    layout: HyperLayout,
    theta,
    batch: LeafBatch,
    xt,
    tidx=None,
    tmask=None,
    chunk: Optional[int] = None,
    refine_steps: int = 0,
):
    """Fused fit+predict in leaf chunks: per chunk recompute the factor,
    solve, and emit per-leaf predictive moments; factors never persist.

    ``xt [T, D]`` shared test points; with ``tidx/tmask [L, tmax]`` each
    leaf predicts only its routed points (DSMGP), otherwise all T (PoE
    family). Returns ``(mu [L, T or tmax], var, mll [L])``.

    One triangular solve per chunk: the targets and the cross-covariance
    share a single forward solve ``Z = L^{-1} [y | K_nt]``, from which
    ``y'α = ||z_y||²`` (mll), ``μ = m + V'z_y`` and the predictive variance
    all follow — no alpha (transposed) solve, no separate y solve.

    ``refine_steps > 0`` (requires x64): iteratively refine the alpha
    AND test-column solves against true-K float64 residuals
    (``ops/refine.py``) — quad term, predictive mean, and predictive
    variance all leave the f32 floor (mean ~1e-6..1e-7, variance
    ~1e-5..1e-6 of the f64 oracle).
    """
    from .leafgp import (
        centered_y,
        leaf_gram,
        leaf_gram_diag,
        leaf_mll_forward,
        leaf_noise,
    )

    chunk = min(chunk or default_chunk(batch.nmax, batch.x.dtype),
                batch.num_leaves)
    bpad, _ = _pad_batch(batch, chunk)
    L = batch.num_leaves
    Lp = bpad.num_leaves
    nchunks = Lp // chunk

    routed = tidx is not None
    if routed:
        padrows = Lp - L

        def padr(a):
            z = jnp.zeros((padrows,) + a.shape[1:], dtype=a.dtype)
            return jnp.concatenate([a, z], axis=0)

        tidx_p = padr(tidx)
        tmask_p = padr(tmask)

    if theta.ndim == 2 and theta.shape[0] == L:
        theta = jnp.concatenate(
            [theta, jnp.zeros((Lp - L,) + theta.shape[1:], theta.dtype)]
        )

    def body(i):
        sl = lambda a: lax.dynamic_slice_in_dim(a, i * chunk, chunk, axis=0)
        b = LeafBatch(*[sl(a) for a in bpad])
        th = theta if theta.ndim == 1 else sl(theta)
        Lf = _maybe_pallas_chol(layout, th, b)  # fused path (small buckets)
        if Lf is None:
            Kn = _noisy_gram(layout, th, b)
            Lf = chol.cholesky_nosym(Kn)
        yc = centered_y(b)
        if routed:
            xt_leaf = xt[sl(tidx_p)]
        else:
            xt_leaf = xt
        Knt = leaf_gram(layout, th, b, xt_leaf)  # [C, Nmax, T]
        Knt = jnp.where(b.mask[:, :, None], Knt, 0.0)
        rhs = jnp.concatenate([yc[..., None], Knt], axis=-1)
        Z = chol.solve_lower(Lf, rhs)
        z = Z[..., 0]
        V = Z[..., 1:]
        ktt = leaf_gram_diag(layout, th, b, xt_leaf)
        noise = leaf_noise(layout, th, b)
        var = ktt - jnp.sum(V * V, axis=-2) + noise[:, None]
        if refine_steps:
            from .ops import refine

            # alpha and the test columns refine JOINTLY against one
            # true-K f64 residual pass (the f32 `var` above is
            # discarded): same per-column arithmetic as the separate
            # refine_alpha + refined_predict passes, half the emulated-
            # f64 gram recomputation (VERDICT r4 item 5)
            mu, var, mll = refine.refine_joint(
                layout, th, b, Lf, z, V, xt_leaf, refine_steps
            )
            return mu, var, mll
        mll = leaf_mll_forward(Lf, z, b)
        mu = b.mean[:, None] + jnp.einsum(
            "lnt,ln->lt", V, z, precision=jax.lax.Precision.HIGHEST
        )
        return mu, var, mll

    mu, var, mll = lax.map(body, jnp.arange(nchunks))
    mu = mu.reshape((-1,) + mu.shape[2:])[:L]
    var = var.reshape((-1,) + var.shape[2:])[:L]
    mll = mll.reshape(-1)[:L]
    return mu, var, mll


# ---------------------------------------------------------------------------
# Bucketed execution — per-size-class batches (plan.BucketSpec)
# ---------------------------------------------------------------------------


def _bucket_chunk(nmax: int, n_leaves: int, dtype,
                  budget: int = 2 << 30) -> int:
    """Leaves per ``lax.map`` step within a bucket. Measured on v5e
    (N=100k tree, per-bucket sweep over chunk ∈ {1,2,4,8}): for experts
    ≥ ~4k, single-leaf streaming is uniformly fastest — the native
    Cholesky's throughput is driven by n, batching the leading dim adds
    nothing, and the map pipeline overlaps successive leaves (e.g.
    nmax=4472: 64.6 ms at chunk=1 vs 72-85 ms at 2-8; nmax=5960: 143 vs
    158-167 ms). Below that, batching many small factorizations into one
    program wins (dispatch amortization)."""
    if nmax >= 4096:
        return 1
    return min(default_chunk(nmax, dtype, budget), n_leaves)


def bucketed_leaf_mlls(layout: HyperLayout, theta, batches, leaf_ids, L,
                       budget: int = 2 << 30, chunk: Optional[int] = None):
    """All leaf mlls [L] computed bucket-by-bucket. ``theta`` tied [P] or
    per-leaf [L, P]. ``chunk`` overrides the budget-derived per-bucket
    leaf-chunk (an explicit memory bound from the caller)."""
    from .train import leaf_mlls_fn  # chunked + rematerialized helper

    mll = jnp.zeros((L,), dtype=batches[0].x.dtype)
    for b, ids in zip(batches, leaf_ids):
        th = theta if theta.ndim == 1 else theta[jnp.asarray(ids)]
        c = chunk if chunk is not None else _bucket_chunk(
            b.nmax, b.num_leaves, b.x.dtype, budget
        )
        f = leaf_mlls_fn(layout, b, c if c < b.num_leaves else None)
        mll = mll.at[jnp.asarray(ids)].set(f(th))
    return mll


def streamed_leaf_alphas(layout: HyperLayout, theta, batch: LeafBatch,
                         chunk: Optional[int] = None):
    """``(mll [L], alpha [L, Nmax])`` in leaf chunks — the light fit plus
    the TRANSPOSED solve, caching the O(N)-sized weights the predictive
    mean needs (``gp.α``, ``gaussianprocess.jl:105``) while the O(N²)
    factors still never persist. Costs one extra single-rhs triangular
    solve per chunk over :func:`fit_light` (latency-bound, ~7 ms at
    n≈11k on v5e) and Σ n_l floats of storage — the basis of the exact
    O(n·t) serving mean path (:func:`bucketed_alpha_mean`)."""
    from .leafgp import centered_y, leaf_mll_forward

    chunk = min(chunk or default_chunk(batch.nmax, batch.x.dtype),
                batch.num_leaves)
    bpad, _ = _pad_batch(batch, chunk)
    L = batch.num_leaves
    nchunks = bpad.num_leaves // chunk
    if theta.ndim == 2 and theta.shape[0] != bpad.num_leaves:
        theta = jnp.concatenate(
            [theta,
             jnp.zeros((bpad.num_leaves - L,) + theta.shape[1:], theta.dtype)]
        )

    def body(i):
        sl = lambda a: lax.dynamic_slice_in_dim(a, i * chunk, chunk, axis=0)
        b = LeafBatch(*[sl(a) for a in bpad])
        th = theta if theta.ndim == 1 else sl(theta)
        Lf = _maybe_pallas_chol(layout, th, b)
        if Lf is None:
            Kn = _noisy_gram(layout, th, b)
            Lf = chol.cholesky_nosym(Kn)
        yc = centered_y(b)
        z = chol.solve_lower(Lf, yc[..., None])
        alpha = lax.linalg.triangular_solve(
            Lf, z, left_side=True, lower=True, transpose_a=True
        )[..., 0]
        return leaf_mll_forward(Lf, z[..., 0], b), alpha

    mll, alpha = lax.map(body, jnp.arange(nchunks))
    return (mll.reshape(-1)[:L],
            alpha.reshape((-1, alpha.shape[-1]))[:L])


def bucketed_leaf_alphas(layout: HyperLayout, theta, batches, leaf_ids, L,
                         budget: int = 2 << 30,
                         chunk: Optional[int] = None):
    """All leaf mlls [L] plus per-bucket alpha weights (tuple of
    ``[Lb, nmax_b]``, bucket order) — :func:`bucketed_leaf_mlls` with the
    alpha cache for the serving mean fast path."""
    mll = jnp.zeros((L,), dtype=batches[0].x.dtype)
    alphas = []
    for b, ids in zip(batches, leaf_ids):
        th = theta if theta.ndim == 1 else theta[jnp.asarray(ids)]
        c = chunk if chunk is not None else _bucket_chunk(
            b.nmax, b.num_leaves, b.x.dtype, budget
        )
        mll_b, a_b = streamed_leaf_alphas(layout, th, b, chunk=c)
        mll = mll.at[jnp.asarray(ids)].set(mll_b)
        alphas.append(a_b)
    return mll, tuple(alphas)


def bucketed_alpha_mean(layout: HyperLayout, theta, batches, leaf_ids, L,
                        alphas, xt, tidx, budget: int = 2 << 30):
    """Routed predictive MEAN [L, tmax] from cached alpha weights: one
    cross-gram contraction per leaf chunk — O(n·t) work per leaf, NO
    factorization. Exact (``μ = m + K_nt' α``, ``gaussianprocess.jl:118``):
    the serving fast path for models too large to cache factors. The
    variance is NOT computable from alpha alone (it needs triangular
    solves against the factor) — callers wanting variance use the
    streamed path."""
    T = tidx.shape[1]
    dt = batches[0].x.dtype
    mu = jnp.zeros((L, T), dtype=dt)
    item = jnp.dtype(dt).itemsize
    for b, ids, a_b in zip(batches, leaf_ids, alphas):
        idx = jnp.asarray(ids)
        th = theta if theta.ndim == 1 else theta[idx]
        # peak buffer is the [chunk, nmax, tmax] cross gram (+workspace)
        c = max(1, min(int(budget // (3 * b.nmax * max(T, 1) * item)),
                       b.num_leaves))
        bpad, pad = _pad_batch(b, c)
        Lb, Lp = b.num_leaves, b.num_leaves + pad

        def padr(a):
            z = jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)
            return jnp.concatenate([a, z], axis=0) if pad else a

        ti_p = padr(tidx[idx])
        a_p = padr(a_b)
        th_p = th if th.ndim == 1 else padr(th)

        def body(i, bpad=bpad, th_p=th_p, ti_p=ti_p, a_p=a_p, c=c):
            sl = lambda a: lax.dynamic_slice_in_dim(a, i * c, c, axis=0)
            bb = LeafBatch(*[sl(a) for a in bpad])
            tt = th_p if th_p.ndim == 1 else sl(th_p)
            Knt = leaf_gram(layout, tt, bb, xt[sl(ti_p)])  # [c, nmax, tmax]
            Knt = jnp.where(bb.mask[:, :, None], Knt, 0.0)
            return bb.mean[:, None] + jnp.einsum(
                "lnt,ln->lt", Knt, sl(a_p),
                precision=jax.lax.Precision.HIGHEST,
            )

        mu_b = lax.map(body, jnp.arange(Lp // c))
        mu = mu.at[idx].set(mu_b.reshape((-1, T))[:Lb])
    return mu


def streamed_leaf_factors(layout: HyperLayout, theta, batch: LeafBatch,
                          chunk: Optional[int] = None):
    """``(mll [L], alpha [L, Nmax], Lf [L, Nmax, Nmax])`` in leaf chunks —
    the light fit PLUS persisted factors: the per-bucket building block of
    the hybrid serving cache (factors of the CHOSEN buckets persist so
    repeated predictions skip their O(n³) refactorization; ≙ the
    reference's fit-once-predict-many ``gp.cK`` cache,
    ``gaussianprocess.jl:87-120``)."""
    from .leafgp import centered_y, leaf_mll_forward

    chunk = min(chunk or default_chunk(batch.nmax, batch.x.dtype),
                batch.num_leaves)
    bpad, _ = _pad_batch(batch, chunk)
    L = batch.num_leaves
    nchunks = bpad.num_leaves // chunk
    if theta.ndim == 2 and theta.shape[0] != bpad.num_leaves:
        theta = jnp.concatenate(
            [theta,
             jnp.zeros((bpad.num_leaves - L,) + theta.shape[1:], theta.dtype)]
        )

    def body(i):
        sl = lambda a: lax.dynamic_slice_in_dim(a, i * chunk, chunk, axis=0)
        b = LeafBatch(*[sl(a) for a in bpad])
        th = theta if theta.ndim == 1 else sl(theta)
        Lf = _maybe_pallas_chol(layout, th, b)
        if Lf is None:
            Kn = _noisy_gram(layout, th, b)
            Lf = chol.cholesky_nosym(Kn)
        yc = centered_y(b)
        z = chol.solve_lower(Lf, yc[..., None])
        alpha = lax.linalg.triangular_solve(
            Lf, z, left_side=True, lower=True, transpose_a=True
        )[..., 0]
        return leaf_mll_forward(Lf, z[..., 0], b), alpha, Lf

    mll, alpha, Lf = lax.map(body, jnp.arange(nchunks))
    return (mll.reshape(-1)[:L],
            alpha.reshape((-1, alpha.shape[-1]))[:L],
            Lf.reshape((-1,) + Lf.shape[2:])[:L])


def cached_leaf_predict(layout: HyperLayout, theta, batch: LeafBatch,
                        Lf, alpha, xt, tidx=None,
                        chunk: Optional[int] = None):
    """Per-leaf predictive moments from CACHED factors: cross-gram +
    triangular solve per leaf chunk — O(n²t) per leaf, no O(n³)
    refactorization (the serving path behind the hybrid factor cache).
    Shapes/semantics as :func:`streamed_leaf_predict` minus the mll."""
    from .leafgp import leaf_gram, leaf_gram_diag, leaf_noise

    chunk = min(chunk or default_chunk(batch.nmax, batch.x.dtype),
                batch.num_leaves)
    bpad, pad = _pad_batch(batch, chunk)
    L = batch.num_leaves
    Lp = bpad.num_leaves
    nchunks = Lp // chunk

    def padr(a, eye=False):
        if not pad:
            return a
        if eye:
            z = jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=a.dtype),
                                 (pad,) + a.shape[1:])
        else:
            z = jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)
        return jnp.concatenate([a, z], axis=0)

    Lf_p = padr(Lf, eye=True)
    a_p = padr(alpha)
    ti_p = padr(tidx) if tidx is not None else None
    if theta.ndim == 2 and theta.shape[0] == L:
        theta = jnp.concatenate(
            [theta, jnp.zeros((Lp - L,) + theta.shape[1:], theta.dtype)]
        )

    def body(i):
        sl = lambda a: lax.dynamic_slice_in_dim(a, i * chunk, chunk, axis=0)
        b = LeafBatch(*[sl(a) for a in bpad])
        th = theta if theta.ndim == 1 else sl(theta)
        xt_leaf = xt[sl(ti_p)] if ti_p is not None else xt
        Knt = leaf_gram(layout, th, b, xt_leaf)  # [C, Nmax, T]
        Knt = jnp.where(b.mask[:, :, None], Knt, 0.0)
        Lc = sl(Lf_p)
        mu = b.mean[:, None] + jnp.einsum(
            "lnt,ln->lt", Knt, sl(a_p), precision=jax.lax.Precision.HIGHEST
        )
        V = chol.solve_lower(Lc, Knt)
        ktt = leaf_gram_diag(layout, th, b, xt_leaf)
        noise = leaf_noise(layout, th, b)
        var = ktt - jnp.sum(V * V, axis=-2) + noise[:, None]
        return mu, var

    mu, var = lax.map(body, jnp.arange(nchunks))
    mu = mu.reshape((-1,) + mu.shape[2:])[:L]
    var = var.reshape((-1,) + var.shape[2:])[:L]
    return mu, var


def bucketed_hybrid_predict(
    layout: HyperLayout,
    theta,
    batches,
    leaf_ids,
    L,
    factors,
    xt,
    tidx=None,
    tmask=None,
    budget: int = 2 << 30,
):
    """Fused predict over size buckets with a PARTIAL factor cache:
    buckets whose entry in ``factors`` is non-None predict from their
    cached factor+alpha (:func:`cached_leaf_predict`, no refactorization);
    the rest stream fit+predict (:func:`streamed_leaf_predict`). Returns
    ``(mu [L, T|tmax], var)`` in global leaf order."""
    T = xt.shape[0] if tidx is None else tidx.shape[1]
    dt = batches[0].x.dtype
    mu = jnp.zeros((L, T), dtype=dt)
    var = jnp.ones((L, T), dtype=dt)
    for b, ids, Lf_a in zip(batches, leaf_ids, factors):
        idx = jnp.asarray(ids)
        th = theta if theta.ndim == 1 else theta[idx]
        chunk = _bucket_chunk(b.nmax, b.num_leaves, b.x.dtype, budget)
        ti = None if tidx is None else tidx[idx]
        if Lf_a is not None:
            mu_b, var_b = cached_leaf_predict(
                layout, th, b, Lf_a[0], Lf_a[1], xt, ti, chunk=chunk
            )
        else:
            tm = None if tmask is None else tmask[idx]
            mu_b, var_b, _ = streamed_leaf_predict(
                layout, th, b, xt, ti, tm, chunk=chunk
            )
        mu = mu.at[idx].set(mu_b)
        var = var.at[idx].set(var_b)
    return mu, var


def bucketed_streamed_predict(
    layout: HyperLayout,
    theta,
    batches,
    leaf_ids,
    L,
    xt,
    tidx=None,
    tmask=None,
    budget: int = 2 << 30,
    refine_steps: int = 0,
):
    """Fused fit+predict over size buckets. Returns per-leaf moments
    scattered back to global leaf order: ``(mu [L, T|tmax], var, mll [L])``.
    ``refine_steps``: see :func:`streamed_leaf_predict`."""
    T = xt.shape[0] if tidx is None else tidx.shape[1]
    # Under refinement the per-leaf moments/mlls come back in f64 and the
    # scatter buffers must keep them there: the caller's SPN combine
    # (weight update + log-space moment matching) then runs in f64, so
    # its exp/log cancellations don't re-floor the refined variance at
    # the f32 combine bound (~2.4e-3 measured).
    if refine_steps:
        from .ops.refine import _require_x64

        _require_x64()  # fail here, not after tracing f32-truncated buffers
    dt = jnp.float64 if refine_steps else batches[0].x.dtype
    mu = jnp.zeros((L, T), dtype=dt)
    var = jnp.ones((L, T), dtype=dt)
    mll = jnp.zeros((L,), dtype=dt)
    for b, ids in zip(batches, leaf_ids):
        idx = jnp.asarray(ids)
        th = theta if theta.ndim == 1 else theta[idx]
        chunk = _bucket_chunk(b.nmax, b.num_leaves, b.x.dtype, budget)
        ti = None if tidx is None else tidx[idx]
        tm = None if tmask is None else tmask[idx]
        mu_b, var_b, mll_b = streamed_leaf_predict(
            layout, th, b, xt, ti, tm, chunk=chunk,
            refine_steps=refine_steps,
        )
        mu = mu.at[idx].set(mu_b)
        var = var.at[idx].set(var_b)
        mll = mll.at[idx].set(mll_b)
    return mu, var, mll


def fit(
    layout: HyperLayout,
    theta,
    batch: LeafBatch,
    schedule: Optional[SharedSchedule] = None,
    method: str = "auto",
    chunk: Optional[int] = None,
    safe: bool = True,
    with_diagnostics: bool = False,
) -> LeafPosterior:
    """Posterior fit over all leaf experts.

    ``method``: ``'batched'`` (≙ ``fit_naive!``), ``'shared'``
    (≙ ``fit!``), or ``'auto'``.

    ``'auto'`` always resolves to BATCHED, on measured cost: on a TPU v5e
    (N=10k benchmark tree, 24% derived leaves) ``fit_shared`` runs 11.3x
    SLOWER than ``fit_batched`` (1.376s vs 0.122s), and on CPU f64
    (N=4k, 24% derived) 119.7x slower (90.1s vs 0.75s) —
    ``BASELINE_GENERATED.json: shared_vs_batched_*``. The Givens
    deletion sweeps are sequential and latency-bound, and the
    static-shape masked ``chol_continue`` does strictly more work than a
    fresh factorization (full-width solve + Schur update + trailing
    Cholesky vs one Cholesky). Factor reuse cannot beat one batched MXU
    pass under this execution model; ``method='shared'`` remains
    available for reference-semantics parity (≙ ``fit!``,
    ``fit.jl:67-292``) and is bit-gated against ``fit_batched`` in
    ``tests/test_fit.py``.

    ``with_diagnostics`` additionally returns ``(del_fallbacks,
    cont_fallbacks)`` PSD-fallback counts (always ``(0, 0)`` on the
    batched path).
    """
    if method == "auto":
        method = "batched"
    if method == "shared":
        if schedule is None:
            raise ValueError("method='shared' requires a schedule")
        return fit_shared(layout, theta, batch, schedule, safe=safe,
                          with_diagnostics=with_diagnostics)
    post = fit_batched(layout, theta, batch, chunk=chunk)
    if with_diagnostics:
        zero = jnp.zeros((), jnp.int32)
        return post, (zero, zero)
    return post
