"""SPN evaluation: marginal likelihood, weight updates, prediction.

Device-side, jit-friendly equivalents of the reference recursions in
``src/common.jl`` and ``src/optimize.jl``, operating on the flattened
``SPNPlan``:

* ``upward`` — level-wise gather + segment-reduce pass computing every
  node's value from the leaf values (≙ the ``mll``/``mll!`` recursions,
  ``optimize.jl:18-39``: sum of children at split nodes, logsumexp of
  ``-log K + child`` at sum nodes).
* ``update_weights`` — posterior sum-weight update returning the root log
  evidence (≙ ``update!``, ``common.jl:323-334``); ``infer_weights`` resets
  internal sums to uniform and keeps only leaf-level (kernel-mixture) sums
  posterior (≙ ``infer!``, ``common.jl:336-355``).
* ``leaf_membership`` / ``path_logweights`` — routing and mixture-weight
  primitives for prediction: a leaf is active for x iff x lies in its
  half-open box (equivalent to the recursive ``getchild`` routing,
  ``common.jl:101-122``) and its mixture weight is the product of the
  sum-node weights along its path. The moment-matching combination itself
  (≙ ``common.jl:134-143,275-302``) lives in ``models._routed_moment_match``
  on the routed (leaf, point) pairs.
* ``predict_poe`` / ``predict_gpoe`` / ``predict_rbcm`` — precision-weighted
  expert fusion (≙ ``common.jl:198-273``); gPoE uses ``β = 1/M`` with M the
  number of root children and rBCM the prior-corrected β of Deisenroth & Ng
  (2015), grouped per root child exactly as the reference recursion does.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .plan import SPNPlan


def combine_in_f64(x) -> bool:
    """True when the SPN combine epilogue should upcast f32 inputs to f64.

    The combine (posterior weight update + log-space moment matching,
    ≙ ``common.jl:275-302,323-334``) is O(L·T) exp/log work whose
    ``E[μ²] − mean²`` cancellation floors the END-TO-END predictive
    variance at ~2e-3 in f32 while the f32 leaves deliver ~1e-5 (measured,
    BASELINE.md round-4: N=500k leaf var 1.26e-5 vs combine floor 2.9e-3).
    The reference gets the f64 combine for free (Julia is f64 throughout);
    here it costs O(L·T) emulated-f64 flops — negligible against the
    O(Σn³) leaf work — so it is the DEFAULT. The heavy per-leaf programs
    stay f32: only the combine runs under a trace-time
    ``jax.enable_x64()`` scope, which does not flip the global x64 flag
    (f64-capable epilogue inside an otherwise-f32 jitted program).

    ``DSMGP_F32_COMBINE=1`` restores the all-f32 combine (A/B switch).
    """
    return (x.dtype == jnp.float32
            and os.environ.get("DSMGP_F32_COMBINE", "0") != "1")


def _segment_logsumexp(x, seg, num_segments):
    m = jax.ops.segment_max(x, seg, num_segments=num_segments,
                            indices_are_sorted=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(x - m_safe[seg])
    s = jax.ops.segment_sum(e, seg, num_segments=num_segments,
                            indices_are_sorted=True)
    return jnp.where(jnp.isfinite(m), m_safe + jnp.log(s), m)


def upward(plan: SPNPlan, leaf_vals, logweights=None):
    """All node values ``[num_slots]`` from leaf values ``[L]``.

    With ``logweights=None`` sum nodes combine children with uniform
    ``-log K`` (the mll semantics, ``optimize.jl:20-23``); otherwise with
    the given flat edge log-weights (the weighted evaluation used by
    prediction).
    """
    vals = leaf_vals
    for g in plan.groups:
        child = vals[g.child_slots]
        if g.kind == "split":
            new = jax.ops.segment_sum(
                child, g.seg, num_segments=g.n_parents, indices_are_sorted=True
            )
        else:
            if logweights is None:
                w = jnp.asarray(g.neg_logk, dtype=vals.dtype)
            else:
                w = logweights[g.edge_ids]
            new = _segment_logsumexp(child + w, g.seg, g.n_parents)
        vals = jnp.concatenate([vals, new])
    return vals


def root_mll(plan: SPNPlan, leaf_mlls):
    """Root marginal log-likelihood (≙ ``mll(model)``, ``optimize.jl:25``)."""
    return upward(plan, leaf_mlls)[plan.root_slot]


def update_weights(plan: SPNPlan, leaf_mlls):
    """Posterior sum-node weights + root log evidence
    (≙ ``update!``, ``common.jl:323-334``).

    Every sum node's edge weights become
    ``normalize(-log K + child mll)``; returns ``(logweights [E], z_root)``.

    f32 leaf mlls are combined in f64 by default (the logsumexp
    normalization feeds the predictive combine; see :func:`combine_in_f64`)
    — the returned logweights/evidence are then f64.
    """
    if combine_in_f64(leaf_mlls):
        with jax.enable_x64():
            return update_weights(plan, leaf_mlls.astype(jnp.float64))
    vals = upward(plan, leaf_mlls)
    lw = jnp.zeros((max(plan.n_sum_edges, 1),), dtype=leaf_mlls.dtype)
    for g in plan.groups:
        if g.kind != "sum":
            continue
        child = vals[g.child_slots]
        raw = child + jnp.asarray(g.neg_logk, dtype=vals.dtype)
        z = _segment_logsumexp(raw, g.seg, g.n_parents)
        lw = lw.at[g.edge_ids].set(raw - z[g.seg])
    return lw, vals[plan.root_slot]


def infer_weights(plan: SPNPlan, leaf_mlls):
    """≙ ``infer!`` (``common.jl:336-355``): like ``update_weights`` but
    internal sum nodes are reset to uniform; only leaf-level kernel-mixture
    sums keep their posterior weights."""
    if combine_in_f64(leaf_mlls):
        with jax.enable_x64():
            return infer_weights(plan, leaf_mlls.astype(jnp.float64))
    lw, z = update_weights(plan, leaf_mlls)
    is_leaf_sum = jnp.asarray(plan.edge_is_leaf_sum)
    uniform = jnp.asarray(plan.edge_neg_logk, dtype=lw.dtype)
    return jnp.where(is_leaf_sum, lw, uniform), z


def leaf_responsibilities(plan: SPNPlan, leaf_mlls):
    """Posterior responsibility of every leaf under uniform sum weights:
    ``w_l = exp(mll_l + path_prefix − root)`` — the quantity the reference's
    hand-rolled gradient propagation computes per leaf
    (``∇mll!``, ``optimize.jl:42-89``: ``w = exp(ℓ + ∇parent − logS)``) and
    its dict-returning soft-gradient variant exposes
    (``optimize.jl:153-183``). Here it is obtained in one line as the
    gradient of the root mll w.r.t. the leaf mll vector — the autodiff
    identity behind our entire training path. Returns ``[L]`` summing to 1.
    """
    return jax.grad(lambda lm: root_mll(plan, lm))(leaf_mlls)


def reset_weights(plan: SPNPlan):
    """Uniform ``-log K`` weights everywhere (≙ ``reset_weights!``,
    ``common.jl:357-363``)."""
    return jnp.asarray(plan.edge_neg_logk, dtype=jnp.asarray(plan.init_logweights).dtype)


def leaf_membership(plan: SPNPlan, xt, dtype=None):
    """Boolean activity mask ``[T, L]``: leaf active iff ``lb < x <= ub`` in
    every dimension — equivalent to recursive split routing (``getchild``,
    ``common.jl:101-122``) because split segments are half-open ``(lo, hi]``
    and sum children share the parent box."""
    lb = jnp.asarray(plan.leaf_lb, dtype=xt.dtype)  # [L, D]
    ub = jnp.asarray(plan.leaf_ub, dtype=xt.dtype)
    ok = (xt[:, None, :] > lb[None]) & (xt[:, None, :] <= ub[None])
    return jnp.all(ok, axis=-1)


def path_logweights(plan: SPNPlan, logweights):
    """Per-leaf mixture log-weight = sum of sum-edge log-weights on the
    root-to-leaf path ``[L]``.

    Uses the sparse ``[L, Pmax]`` path form (each path has only O(depth)
    sum edges): the dense ``[L, E]`` matmul would embed an O(L·E) constant
    in the jitted program — ~1 GB at scale-frontier leaf counts, enough to
    overflow the remote-compile request."""
    idx = jnp.asarray(plan.path_edges)
    msk = jnp.asarray(plan.path_mask)
    lw = jnp.concatenate([logweights, jnp.zeros((1,), logweights.dtype)])
    gathered = lw[jnp.where(msk, idx, logweights.shape[0])]
    return jnp.sum(gathered, axis=1)


def predict_poe(mu, var):
    """Product-of-experts fusion over ALL experts (≙ ``_predictPoE`` +
    ``predictPoE``, ``common.jl:145-149,198-208,256-260``).

    Like the DSMGP combine, f32 expert moments fuse in f64 by default
    (:func:`combine_in_f64`): O(L·T) epilogue, f64-for-free as in the
    reference."""
    if combine_in_f64(mu):
        with jax.enable_x64():
            return predict_poe(mu.astype(jnp.float64),
                               var.astype(jnp.float64))
    t = 1.0 / var  # [L, T]
    tsum = jnp.sum(t, axis=0)
    mean = jnp.sum(t * mu, axis=0) / tsum
    return mean, 1.0 / tsum


def _group_poe(mu, var, group_ids, n_groups):
    """Per-root-child PoE fusion: returns ``(mu_c [C, T], t_c [C, T])``."""
    t = 1.0 / var
    tw = jax.ops.segment_sum(t, group_ids, num_segments=n_groups)
    mw = jax.ops.segment_sum(t * mu, group_ids, num_segments=n_groups)
    return mw / tw, tw


def predict_gpoe(plan: SPNPlan, mu, var):
    """Generalized PoE with ``β = 1/M``, M = number of root children
    (≙ ``_predictgPoE``, ``common.jl:211-222,263-267``)."""
    if combine_in_f64(mu):
        with jax.enable_x64():
            return predict_gpoe(plan, mu.astype(jnp.float64),
                                var.astype(jnp.float64))
    gid = jnp.asarray(plan.root_child_id)
    n_groups = int(plan.root_child_id.max()) + 1
    mu_c, t_c = _group_poe(mu, var, gid, n_groups)
    beta = 1.0 / n_groups
    tsum = jnp.sum(beta * t_c, axis=0)
    mean = jnp.sum(beta * t_c * mu_c, axis=0) / tsum
    return mean, 1.0 / tsum


def predict_rbcm(plan: SPNPlan, mu, var, prior_var):
    """Robust Bayesian committee machine (≙ ``_predictrBCM``,
    ``common.jl:224-241,269-273``). ``prior_var [T]`` is the prior variance
    ``diag(k(x,x)) + noise`` of the first leaf GP (``common.jl:227-228``)."""
    if combine_in_f64(mu):
        with jax.enable_x64():
            return predict_rbcm(plan, mu.astype(jnp.float64),
                                var.astype(jnp.float64),
                                prior_var.astype(jnp.float64))
    gid = jnp.asarray(plan.root_child_id)
    n_groups = int(plan.root_child_id.max()) + 1
    mu_c, t_c = _group_poe(mu, var, gid, n_groups)
    s = prior_var[None, :]  # [1, T]
    s_c = 1.0 / t_c
    beta = 0.5 * (jnp.log(s) - jnp.log(s_c))  # [C, T]
    C = 1.0 / prior_var + jnp.sum(beta * t_c - beta / s, axis=0)
    mean = jnp.sum(mu_c * beta * t_c, axis=0) / C
    return mean, 1.0 / C
