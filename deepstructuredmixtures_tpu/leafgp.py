"""Batched leaf-GP engine over padded ``[L, Nmax, ...]`` blocks.

This is the TPU-native core replacing the reference's per-leaf
``GaussianProcess`` methods (``src/gaussianprocess.jl``): instead of L
independent heap objects each calling LAPACK sequentially, all leaf experts
live in one padded batch and every operation (covariance construction,
Cholesky, alpha solve, marginal log-likelihood, prediction) is a single
batched program on the MXU.

Padding contract: each leaf occupies rows ``< n[l]`` of ``Nmax``; padded rows
carry ``y = 0`` and identity covariance rows, making them exact no-ops in
factorization, solves, logdet, and predictions.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import hyper as hyperlib
from .config import EPS
from .kernels import gram, gram_diag
from .ops import cholesky as chol

LOG2PI = float(np.log(2.0 * np.pi))


class LeafBatch(NamedTuple):
    """Padded leaf-expert data (a pytree of arrays).

    ``x [L, Nmax, D]`` inputs, ``y [L, Nmax]`` raw (uncentered) targets,
    ``mask [L, Nmax]`` validity, ``n [L]`` valid counts, ``mean [L]``
    constant mean per leaf (≙ per-leaf ``ConstMean``), ``kernelid [L]``
    kernel-mixture component index (reference ``GPNode.kernelid``,
    ``DeepStructuredMixtures.jl:70``).
    """

    x: jnp.ndarray
    y: jnp.ndarray
    mask: jnp.ndarray
    n: jnp.ndarray
    mean: jnp.ndarray
    kernelid: jnp.ndarray

    @property
    def num_leaves(self) -> int:
        return self.x.shape[0]

    @property
    def nmax(self) -> int:
        return self.x.shape[1]


def centered_y(batch: LeafBatch):
    """Per-leaf centered targets (≙ ``apply_subtract!``, ``means.jl:11-14``)."""
    return jnp.where(batch.mask, batch.y - batch.mean[:, None], 0.0)


def _theta_for(layout, theta, k, num_leaves):
    logl, logsigma, lognoise = hyperlib.unpack(layout, theta, k)
    if theta.ndim == 1:
        logl = jnp.broadcast_to(logl, (num_leaves,) + logl.shape)
        logsigma = jnp.broadcast_to(logsigma, (num_leaves,))
        lognoise = jnp.broadcast_to(lognoise, (num_leaves,))
    return logl, logsigma, lognoise


def leaf_noise(layout: hyperlib.HyperLayout, theta, batch: LeafBatch):
    """Per-leaf observation-noise variance ``exp(2 logNoise)``."""
    L = batch.num_leaves
    out = jnp.zeros((L,), dtype=batch.x.dtype)
    for k in range(len(layout.kinds)):
        _, _, lognoise = _theta_for(layout, theta, k, L)
        sel = batch.kernelid == k
        out = jnp.where(sel, hyperlib.noise_from(lognoise), out)
    return out


def leaf_gram(layout: hyperlib.HyperLayout, theta, batch: LeafBatch, x2=None):
    """Batched kernel matrices ``[L, Nmax, M]``.

    ``x2`` defaults to the training inputs (square Gram); pass test inputs
    ``[M, D]`` (shared across leaves) for cross-covariances. Kernel-mixture
    models (multiple kernelids) compute one batched Gram per kernel kind and
    select per leaf — kinds are few (reference allows short kernel vectors,
    ``DeepStructuredMixtures.jl:93``).
    """
    L = batch.num_leaves
    x1 = batch.x
    if x2 is None:
        x2b = x1
    elif x2.ndim == 2:
        x2b = jnp.broadcast_to(x2[None], (L,) + x2.shape)
    else:
        x2b = x2
    out = None
    for k, kind in enumerate(layout.kinds):
        logl, logsigma, _ = _theta_for(layout, theta, k, L)
        Kk = jax.vmap(lambda a, b, ll, ls: gram(kind, ll, ls, a, b))(
            x1, x2b, logl, logsigma
        )
        if out is None:
            out = Kk if len(layout.kinds) == 1 else jnp.where(
                (batch.kernelid == k)[:, None, None], Kk, 0.0
            )
        else:
            out = jnp.where((batch.kernelid == k)[:, None, None], Kk, out)
    return out


def leaf_gram_diag(layout: hyperlib.HyperLayout, theta, batch: LeafBatch, xt):
    """Batched prior variances ``k(x_t, x_t)`` at test points, ``[L, T]``.

    ``xt`` is shared ``[T, D]`` or per-leaf ``[L, T, D]``."""
    L = batch.num_leaves
    if xt.ndim == 2:
        xtb = jnp.broadcast_to(xt[None], (L,) + xt.shape)
    else:
        xtb = xt
    out = None
    for k, kind in enumerate(layout.kinds):
        logl, logsigma, _ = _theta_for(layout, theta, k, L)
        dk = jax.vmap(lambda ll, ls, xx: gram_diag(kind, ll, ls, xx))(
            logl, logsigma, xtb
        )
        if out is None:
            out = dk if len(layout.kinds) == 1 else jnp.where(
                (batch.kernelid == k)[:, None], dk, 0.0
            )
        else:
            out = jnp.where((batch.kernelid == k)[:, None], dk, out)
    return out


class LeafPosterior(NamedTuple):
    """Fitted per-leaf posterior state.

    ``chol [L, Nmax, Nmax]`` lower factors (identity on padding), ``alpha
    [L, Nmax]`` weights, ``mll [L]`` marginal log-likelihoods — the batched
    equivalent of the reference's cached ``gp.cK`` / ``gp.α``
    (``gaussianprocess.jl:33-35``). Memory-bounded fits
    (:func:`fit.fit_light`) return ``chol=None`` and ``alpha=None``: only
    the mlls are kept and prediction recomputes factors chunk-wise.
    """

    chol: jnp.ndarray
    alpha: jnp.ndarray
    mll: jnp.ndarray


def factorize(layout, theta, batch: LeafBatch) -> LeafPosterior:
    """Batched ``update_cholesky!`` + mll over all leaves
    (≙ ``gaussianprocess.jl:87-108,163``)."""
    K = leaf_gram(layout, theta, batch)
    noise = leaf_noise(layout, theta, batch)
    Kn = chol.masked_gram_noise(K, batch.mask, noise, EPS)
    Lf = chol.cholesky_nosym(Kn)
    return posterior_from_chol(Lf, batch)


def posterior_from_chol(Lf, batch: LeafBatch) -> LeafPosterior:
    """Alpha weights and mll from existing factors (used by the shared-
    Cholesky fit paths where factors are derived, not recomputed)."""
    yc = centered_y(batch)
    alpha = chol.cho_solve_lower(Lf, yc)
    mll = leaf_mll(Lf, yc, alpha, batch)
    return LeafPosterior(Lf, alpha, mll)


def leaf_mll(Lf, yc, alpha, batch: LeafBatch):
    """``-(y'α + logdet + N log 2π) / 2`` per leaf
    (≙ ``gaussianprocess.jl:163``)."""
    quad = jnp.sum(yc * alpha, axis=-1)
    logdet = chol.masked_logdet(Lf, batch.mask)
    nn = batch.n.astype(Lf.dtype)
    return -0.5 * (quad + logdet + nn * LOG2PI)


def leaf_mll_forward(Lf, z, batch: LeafBatch):
    """mll from the forward solve only: ``y'α = ||L^{-1} y||^2``, so the
    transposed (alpha) solve is unnecessary when only the likelihood is
    consumed — saves one latency-bound single-rhs triangular solve per
    leaf on the streamed/light paths."""
    quad = jnp.sum(z * z, axis=-1)
    logdet = chol.masked_logdet(Lf, batch.mask)
    nn = batch.n.astype(Lf.dtype)
    return -0.5 * (quad + logdet + nn * LOG2PI)


def leaf_predict(layout, theta, batch: LeafBatch, post: LeafPosterior, xt):
    """Batched predictive mean/variance of every leaf at shared test points.

    Returns ``(mu [L, T], var [L, T])`` where ``var`` is the *diagonal*
    predictive variance including observation noise — matching the
    reference's ``prediction`` (``gaussianprocess.jl:110-137``) of which only
    the diagonal is consumed downstream (``common.jl:134-143``). Computing
    the diagonal directly avoids the reference's full T x T posterior
    covariance.
    """
    Knt = leaf_gram(layout, theta, batch, xt)  # [L, Nmax, T]
    Knt = jnp.where(batch.mask[:, :, None], Knt, 0.0)
    mu = batch.mean[:, None] + jnp.einsum(
        "lnt,ln->lt", Knt, post.alpha, precision=jax.lax.Precision.HIGHEST
    )
    V = chol.solve_lower(post.chol, Knt)  # [L, Nmax, T]
    ktt = leaf_gram_diag(layout, theta, batch, xt)  # [L, T]
    noise = leaf_noise(layout, theta, batch)
    var = ktt - jnp.sum(V * V, axis=-2) + noise[:, None]
    return mu, var
