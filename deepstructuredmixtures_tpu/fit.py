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

from functools import partial
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
from .plan import SharedSchedule, SPNPlan


def _noisy_gram(layout, theta, batch):
    K = leaf_gram(layout, theta, batch)
    noise = leaf_noise(layout, theta, batch)
    return chol.masked_gram_noise(K, batch.mask, noise, EPS)


def fit_batched(layout: HyperLayout, theta, batch: LeafBatch,
                chunk: Optional[int] = None) -> LeafPosterior:
    """Fresh batched factorization of all leaves.

    ``chunk`` bounds peak memory: leaves are processed ``chunk`` at a time
    with ``lax.map`` (factors are still all materialized in the result; use
    the streaming helpers in ``train.py`` when factors must not persist).
    """
    if chunk is None or chunk >= batch.num_leaves:
        Kn = _noisy_gram(layout, theta, batch)
        Lf = jnp.linalg.cholesky(Kn)
        return posterior_from_chol(Lf, batch)

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
        Lf = jnp.linalg.cholesky(Kn)
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
) -> LeafPosterior:
    """Factor-reuse fit following the precompiled schedule."""
    L, n = batch.num_leaves, batch.nmax
    Kn = _noisy_gram(layout, theta, batch)

    eye = jnp.broadcast_to(jnp.eye(n, dtype=Kn.dtype), (L, n, n))
    Lf = eye

    # Phase 1: full factorizations (mains + unshareable leaves).
    fidx = jnp.asarray(schedule.full_idx)
    if schedule.full_idx.size:
        Lf = Lf.at[fidx].set(jnp.linalg.cholesky(Kn[fidx]))

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
            fresh = jnp.linalg.cholesky(Kn[jnp.asarray(schedule.del_j)])
            derived = jnp.where(ok[:, None, None], derived, fresh)
        Lf = Lf.at[jnp.asarray(schedule.del_j)].set(derived)

    # Phase 2b: continue-Cholesky for prefix-extension leaves.
    if schedule.cont_j.size:
        A = Kn[jnp.asarray(schedule.cont_j)]
        Ltop = Lf[jnp.asarray(schedule.cont_i)]
        P = jnp.asarray(schedule.cont_p)
        derived = jax.vmap(chol.chol_continue)(A, Ltop, P)
        jmask = batch.mask[jnp.asarray(schedule.cont_j)]
        derived = chol.pad_identity(derived, jmask)
        if safe:
            ok = chol.factor_is_valid(derived, jmask)
            fresh = jnp.linalg.cholesky(A)
            derived = jnp.where(ok[:, None, None], derived, fresh)
        Lf = Lf.at[jnp.asarray(schedule.cont_j)].set(derived)

    # Phase 2c: verbatim copies last (identical observation sets →
    # identical covariance under tied hypers; fit.jl:132-143). Copy sources
    # may themselves be delete/continue-derived, hence the ordering.
    if schedule.copy_j.size:
        Lf = Lf.at[jnp.asarray(schedule.copy_j)].set(
            Lf[jnp.asarray(schedule.copy_i)]
        )

    return posterior_from_chol(Lf, batch)


def fit(
    layout: HyperLayout,
    theta,
    batch: LeafBatch,
    schedule: Optional[SharedSchedule] = None,
    method: str = "auto",
    chunk: Optional[int] = None,
    safe: bool = True,
) -> LeafPosterior:
    """Posterior fit over all leaf experts.

    ``method``: ``'batched'`` (≙ ``fit_naive!``), ``'shared'``
    (≙ ``fit!``), or ``'auto'`` — shared when a schedule with a meaningful
    derived fraction is available.
    """
    if method == "auto":
        use_shared = (
            schedule is not None
            and schedule.full_idx.size < 0.75 * batch.num_leaves
        )
        method = "shared" if use_shared else "batched"
    if method == "shared":
        if schedule is None:
            raise ValueError("method='shared' requires a schedule")
        return fit_shared(layout, theta, batch, schedule, safe=safe)
    return fit_batched(layout, theta, batch, chunk=chunk)
