"""Mixed-precision iterative refinement of the leaf-GP solve (opt-in).

The float32 headline's accuracy floor is the f32 rounding of the STORED
covariance entries amplified through the inverse (cond(K)*eps_f32 ~ 6e-3
on the benchmark leaves; BASELINE.md "Where the float32 error comes
from") — refinement against the stored matrix provably cannot help. This
module refines against the TRUE kernel matrix instead: each step
recomputes the residual ``r = y - K alpha`` with a float64 gram built on
the fly (O(n^2) emulated-f64 work per step — the O(n^3) factorization
stays f32), then applies the f32 factor as preconditioner. The error
contracts by ~cond*eps_f32 (~1e-2) per step; measured on the v5e at
n=8192 (benchmark hypers): quad-term relative error 3.8e-3 (f32) ->
5.2e-5 -> 5.4e-7 -> 6.5e-9 after 1/2/3 steps, at ~55 ms per step
(f32 gram+chol+solve of the same leaf: 39 ms).

This is the "double-word storage" middle path of the speed-accuracy
contract (BASELINE.md) realized TPU-natively: rather than storing the
gram in two words, the second word is recomputed on demand (bandwidth-
free, matching this package's recompute-over-cache design). After
refinement the quad term, predictive mean, AND predictive variance
(:func:`refine_joint`, round-4/5) reach ~1e-5..1e-7; the mll is then
floored by the f32 factorization's logdet (~8e-6 relative at n=8192) —
documented in BASELINE.md.

Requires ``jax_enable_x64`` (the residual genuinely runs in f64; without
x64 JAX silently truncates and the refinement would be a no-op).

Role in the reference: none — the reference is f64 throughout. This is
the TPU-native answer to its implicit "LAPACK-grade accuracy" contract
(``/root/reference/src/gaussianprocess.jl:87-108``) at f32 speed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import EPS


def _require_x64():
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "refine_steps > 0 requires jax_enable_x64 (the refinement "
            "residual runs in float64; without x64 JAX silently truncates "
            "f64 arrays to f32 and refinement would be a no-op). Call "
            "jax.config.update('jax_enable_x64', True) before first use."
        )


def _batch64(batch):
    """Exact f64 view of a (possibly f32) LeafBatch."""
    return batch._replace(
        x=batch.x.astype(jnp.float64),
        y=batch.y.astype(jnp.float64),
        mean=batch.mean.astype(jnp.float64),
    )


def _true_matmul64(layout, theta64, b64, noise64, B64, row_chunk: int):
    """``(K + (noise+eps) I) @ B`` against the TRUE (f64, recomputed)
    kernel matrix for multi-rhs ``B64 [C, Nmax, T]``, in row chunks of
    ``row_chunk`` so the f64 gram never materializes past
    ``[C, row_chunk, Nmax]``. Padded rows are NOT masked here — callers
    mask the residual. Padded COLUMNS need no mask: ``B``'s padded rows
    are zero by the padding contract (identity factor rows, zeroed rhs)."""
    from ..leafgp import leaf_gram

    C, nmax, T = B64.shape
    rc = min(row_chunk, nmax)
    pad = (-nmax) % rc
    xp = (
        jnp.pad(b64.x, ((0, 0), (0, pad), (0, 0)))
        if pad
        else b64.x
    )
    nblocks = (nmax + pad) // rc

    def body(i, acc):
        rows = lax.dynamic_slice_in_dim(xp, i * rc, rc, axis=1)
        bb = b64._replace(x=rows)  # leaf_gram reads x + kernelid
        Kb = leaf_gram(layout, theta64, bb, x2=b64.x)  # [C, rc, Nmax] f64
        out = jnp.einsum("crn,cnt->crt", Kb, B64)
        return lax.dynamic_update_slice_in_dim(acc, out, i * rc, axis=1)

    KB = lax.fori_loop(
        0, nblocks, body, jnp.zeros((C, nmax + pad, T), jnp.float64)
    )[:, :nmax]
    return KB + (noise64 + EPS)[:, None, None] * B64


def refined_mll(batch, Lf, alpha64):
    """mll with the refined quad term ``y' alpha`` (f64) and the f32
    factor's logdet (the remaining floor — see module docstring)."""
    from ..leafgp import LOG2PI, centered_y
    from . import cholesky as chol

    yc64 = centered_y(_batch64(batch))
    quad = jnp.sum(yc64 * alpha64, axis=-1)
    logdet = chol.masked_logdet(Lf, batch.mask).astype(jnp.float64)
    nn = batch.n.astype(jnp.float64)
    # stays f64: the refined mll feeds the SPN weight update, and the
    # downstream combine runs in f64 under refinement (see
    # fit.bucketed_streamed_predict) so the log-space moment matching's
    # exp/log cancellations don't re-floor the result at f32
    return -0.5 * (quad + logdet + nn * LOG2PI)


def refine_joint(layout, theta, batch, Lf, z32, V32, xt_leaf,
                 steps: int, row_chunk: int = 2048):
    """Joint refinement of the alpha solve AND the test-column solves in
    ONE true-K residual pass — the production refine path (round 5).

    The round-3/4 implementation ran the same iteration (true-K f64
    residual, f32-factor ``cho_solve`` preconditioner) on two
    right-hand sides — ``y_c`` (1 column) and
    ``K_nt`` (t columns) — in two separate passes, each recomputing the
    SAME f64 gram blocks on the fly. Column-wise the iteration is
    independent, so refining the stacked rhs ``[y_c | K_nt]`` jointly is
    bit-identical per column while paying the O(n²) emulated-f64 gram
    recomputation ONCE per step instead of twice, and halving the
    sequential ``fori_loop`` trips (measured decomposition: BASELINE.md
    round-5 refine section).

    Inputs are the f32 streamed-body intermediates: ``z32 = L⁻¹y_c``,
    ``V32 = L⁻¹K_nt``. Returns ``(mu, var, mll) [C, T] / [C]`` in f64
    (kept f64 through the SPN combine). Reference role: the exact f64
    prediction + mll (``gaussianprocess.jl:87-137``).
    """
    from ..leafgp import centered_y, leaf_gram, leaf_gram_diag, leaf_noise

    _require_x64()
    b64 = _batch64(batch)
    theta64 = theta.astype(jnp.float64)
    noise64 = leaf_noise(layout, theta64, b64)
    yc64 = centered_y(b64)
    xt64 = xt_leaf.astype(jnp.float64)
    mask3 = batch.mask[:, :, None]
    Knt64 = leaf_gram(layout, theta64, b64, xt64)  # [C, Nmax, T] f64
    Knt64 = jnp.where(mask3, Knt64, 0.0)
    rhs64 = jnp.concatenate([yc64[..., None], Knt64], axis=-1)

    # B0 = L⁻ᵀ [z | V]: one transposed solve seeds alpha and the test
    # columns together
    B0 = lax.linalg.triangular_solve(
        Lf, jnp.concatenate([z32[..., None], V32], axis=-1),
        left_side=True, lower=True, transpose_a=True,
    ).astype(jnp.float64)

    def step(_, B):
        R = rhs64 - _true_matmul64(layout, theta64, b64, noise64, B,
                                   row_chunk)
        R = jnp.where(mask3, R, 0.0)
        zz = lax.linalg.triangular_solve(
            Lf, R.astype(Lf.dtype), left_side=True, lower=True
        )
        d = lax.linalg.triangular_solve(
            Lf, zz, left_side=True, lower=True, transpose_a=True
        )
        return B + d.astype(jnp.float64)

    B = lax.fori_loop(0, steps, step, B0)
    alpha64 = B[..., 0]
    Bt = B[..., 1:]
    mll = refined_mll(batch, Lf, alpha64)
    mu = b64.mean[:, None] + jnp.einsum("cnt,cn->ct", Knt64, alpha64)
    q = jnp.einsum("cnt,cnt->ct", Knt64, Bt)
    ktt64 = leaf_gram_diag(layout, theta64, b64, xt64)
    var = ktt64 - q + noise64[:, None]
    # f64 on purpose: casting back to f32 here would be harmless for
    # the leaf moments themselves (~1e-7), but the SPN moment-matching
    # combine's E[mu^2] - mean^2 cancellation amplifies f32 input
    # rounding to ~1e-3 relative on the mixture variance (measured:
    # the combine cross-check floors at 2.4e-3 in f32) — keeping f64
    # through the combine is what lets the END-TO-END refined variance
    # reach ~1e-5 (and, round 5, the same f64 combine is now also the
    # DEFAULT for unrefined f32 moments; infer.combine_in_f64)
    return mu, var, mll


