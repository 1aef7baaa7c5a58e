"""Model introspection and visualization helpers.

Equivalents of the reference's miscellaneous tree queries:

* ``blockmatrix`` / ``bestblockmatrix`` / ``blockindecies`` — leaf
  co-occurrence structure visualizations (``common.jl:11-53``).
* ``observation_counts`` — pairwise observation co-occurrence counts
  (≙ ``getObservationCount!``, ``fit.jl:41-55``).
* ``get_log_noise`` — posterior-weighted log-noise per test point
  (≙ ``getLogNoise``, ``common.jl:84-98``).
* ``left_gp`` / ``right_gp`` — the first/last leaf expert as a standalone
  :class:`GaussianProcess` (≙ ``leftGP``/``rightGP``, ``common.jl:124-132``),
  used by the reference's warm-start workflow.
* ``rand_init`` — random hyper re-initialization + refit (the reference's
  ``rand_init!`` at ``optimize.jl:8-16`` is dead/broken — it calls a
  non-existent 2-arg ``fit!``; this is the working equivalent).
"""
from __future__ import annotations

import numpy as np

from .gp import GaussianProcess


def blockmatrix(model, best: bool = False) -> np.ndarray:
    """N x N weighted leaf co-occurrence matrix (≙ ``blockmatrix``,
    ``common.jl:11-32``; ``best=True`` ≙ ``bestblockmatrix``,
    ``common.jl:45-53``: follow only each sum node's argmax child)."""
    from .tree import LeafNode, SplitNode, SumNode

    N = model.X.shape[0]
    lw_flat = np.asarray(model.logweights)

    # map host sum nodes to their edge ids (DFS preorder, as in plan)
    edge_iter = iter(range(lw_flat.size))
    edges = {}

    def assign(node):
        if isinstance(node, LeafNode):
            return
        if isinstance(node, SumNode):
            edges[id(node)] = [next(edge_iter) for _ in node.children]
        for c in node.children:
            assign(c)

    assign(model.root)

    def rec(node) -> np.ndarray:
        if isinstance(node, LeafNode):
            M = np.zeros((N, N))
            M[np.ix_(node.obs, node.obs)] += 1.0
            return M
        if isinstance(node, SplitNode):
            return sum(rec(c) for c in node.children)
        ws = np.exp(lw_flat[edges[id(node)]])
        if best:
            k = int(np.argmax(ws))
            return rec(node.children[k])
        return sum(w * rec(c) for w, c in zip(ws, node.children))

    return rec(model.root)


def blockindecies(model):
    """Per-observation list of co-occurring observation indices
    (≙ ``blockindecies``, ``common.jl:35-43``)."""
    N = model.X.shape[0]
    out = [[] for _ in range(N)]
    for obs in model.plan.leaf_obs:
        lst = obs.tolist()
        for n in lst:
            out[n].extend(lst)
    return out


def observation_counts(model) -> np.ndarray:
    """Pairwise co-occurrence counts over leaves (≙ ``getObservationCount!``,
    ``fit.jl:41-55``; zero diagonal)."""
    N = model.X.shape[0]
    P = np.zeros((N, N), dtype=np.int64)
    for obs in model.plan.leaf_obs:
        P[np.ix_(obs, obs)] += 1
    np.fill_diagonal(P, 0)
    return P


def get_log_noise(model, xt) -> np.ndarray:
    """Posterior-weighted mixture of per-leaf logNoise at each test point
    (≙ ``getLogNoise``, ``common.jl:84-98``: logsumexp over active leaves
    of path-logweight + logNoise)."""
    import jax.numpy as jnp

    from . import infer as inferlib
    from .hyper import unpack

    xt = np.atleast_2d(np.asarray(xt, dtype=np.float64)).reshape(-1, model.plan.dim)
    member = np.asarray(
        inferlib.leaf_membership(model.plan, jnp.asarray(xt, model.dtype))
    )  # [T, L]
    pw = np.asarray(inferlib.path_logweights(model.plan, model.logweights))
    theta = np.asarray(model.theta)
    L = model.num_leaves
    lognoise = np.zeros(L)
    for l in range(L):
        t = theta if theta.ndim == 1 else theta[l]
        kid = int(model.plan.leaf_kernelid[l])
        _, _, ln = unpack(model.layout, t, kid)
        lognoise[l] = float(ln)
    T = xt.shape[0]
    out = np.zeros(T)
    for t in range(T):
        act = np.where(member[t])[0]
        a = pw[act] + lognoise[act]
        m = a.max()
        out[t] = m + np.log(np.exp(a - m).sum())
    return out


def _leaf_gp(model, leaf_index: int) -> GaussianProcess:
    from .hyper import unpack
    from .kernels import KernelSpec

    plan = model.plan
    obs = plan.leaf_obs[leaf_index]
    kid = int(plan.leaf_kernelid[leaf_index])
    theta = np.asarray(model.theta)
    t = theta if theta.ndim == 1 else theta[leaf_index]
    logl, logsigma, lognoise = unpack(model.layout, t, kid)
    spec = KernelSpec(model.layout.kinds[kid], tuple(np.atleast_1d(logl).tolist()),
                      float(logsigma))
    from .means import ConstMean

    gp = GaussianProcess(
        model.X[obs], model.y[obs], mean=ConstMean(float(plan.leaf_mean[leaf_index])),
        kernel=spec, log_noise=float(lognoise), dtype=model.dtype,
    )
    return gp


def left_gp(model) -> GaussianProcess:
    """First (leftmost) leaf expert as an exact GP (≙ ``leftGP``)."""
    return _leaf_gp(model, 0)


def right_gp(model) -> GaussianProcess:
    """Last (rightmost) leaf expert as an exact GP (≙ ``rightGP``)."""
    return _leaf_gp(model, model.num_leaves - 1)


def rand_init(model, seed=None):
    """Random hyper re-initialization + refit (working ``rand_init!``)."""
    rng = np.random.default_rng(seed)
    P = model.theta.shape[-1]
    model.set_params(rng.standard_normal(P))
    model.fit()
    return model
