"""Direct NumPy transcription of the reference recursions over the host tree.

This is the "Julia reference stand-in": sequential, pointer-walking
implementations of ``mll`` (``optimize.jl:18-25``), ``update!``
(``common.jl:323-334``), DSMGP prediction with log-space moment matching
(``common.jl:134-143,151-173,275-302``) and the PoE/gPoE/rBCM fusions
(``common.jl:198-273``), running on exact per-leaf OracleGPs. The batched
TPU implementation is gated against this engine to 1e-6 (BASELINE.md).
"""
from __future__ import annotations

import numpy as np

from deepstructuredmixtures_tpu.tree import LeafNode, SplitNode, SumNode

from .oracle import OracleGP

EPS = 1e-8


def logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    m_safe = np.where(np.isfinite(m), m, 0.0)
    out = np.log(np.sum(np.exp(a - m_safe), axis=axis, keepdims=True)) + m_safe
    return np.squeeze(out, axis=axis) if axis is not None else float(out.reshape(()))


class RefEngine:
    def __init__(self, root, X, y, kinds, theta_blocks):
        """``theta_blocks[k] = (logl, logsigma, lognoise)`` per kernelid."""
        self.root = root
        self.X = np.asarray(X, dtype=np.float64)
        self.y = np.asarray(y, dtype=np.float64)
        self.kinds = kinds
        self.theta_blocks = theta_blocks
        self.gps = {}
        self.logweights = {}  # id(sumnode) -> np.ndarray
        self._init(root)

    def _init(self, node):
        if isinstance(node, LeafNode):
            logl, logsigma, lognoise = self.theta_for(node.kernelid)
            self.gps[id(node)] = OracleGP(
                self.X[node.obs],
                self.y[node.obs],
                self.kinds[node.kernelid],
                logl,
                logsigma,
                lognoise,
                mean=node.mean,
            )
            return
        if isinstance(node, SumNode):
            self.logweights[id(node)] = np.asarray(node.logweights, dtype=np.float64)
        for c in node.children:
            self._init(c)

    def theta_for(self, kid):
        return self.theta_blocks[kid]

    # -- mll (uniform weights; optimize.jl:18-25) -------------------------
    def mll(self, node=None):
        node = node if node is not None else self.root
        if isinstance(node, LeafNode):
            return self.gps[id(node)].mll()
        if isinstance(node, SplitNode):
            return sum(self.mll(c) for c in node.children)
        k = len(node.children)
        return logsumexp(np.array([-np.log(k) + self.mll(c) for c in node.children]))

    # -- update! (common.jl:323-334) --------------------------------------
    def update(self, node=None):
        node = node if node is not None else self.root
        if isinstance(node, LeafNode):
            return self.gps[id(node)].mll()
        if isinstance(node, SplitNode):
            return sum(self.update(c) for c in node.children)
        k = len(node.children)
        lw = np.array([-np.log(k) + self.update(c) for c in node.children])
        z = logsumexp(lw)
        self.logweights[id(node)] = lw - z
        return z

    # -- routing (common.jl:101-122) --------------------------------------
    def getchild(self, node: SplitNode, xt):
        idx = np.zeros(xt.shape[0], dtype=np.int64)
        for n in range(xt.shape[0]):
            prev = -np.inf
            for k, s in enumerate(node.thresholds):
                v = xt[n, node.dim]
                if (v <= s) if k == 0 else (v <= s and v > node.thresholds[k - 1]):
                    idx[n] = k
                    break
        return idx

    # -- _minpredict (common.jl:151-173) -----------------------------------
    def minpredict(self, node, xt):
        if isinstance(node, LeafNode):
            mu, _ = self.gps[id(node)].predict(xt)
            return mu
        if isinstance(node, SplitNode):
            idx = self.getchild(node, xt)
            mu = np.zeros(xt.shape[0])
            for k, c in enumerate(node.children):
                j = np.where(idx == k)[0]
                if j.size:
                    mu[j] = self.minpredict(c, xt[j])
            return mu
        mu = np.full(xt.shape[0], np.inf)
        for c in node.children:
            mu = np.minimum(mu, self.minpredict(c, xt))
        return mu

    # -- _predict (common.jl:134-143,181-196,275-292) ----------------------
    def _predict(self, node, xt, mumin):
        if isinstance(node, LeafNode):
            mu, var = self.gps[id(node)].predict(xt)
            var = np.where(var <= 0, EPS, var)
            assert np.all(mu >= mumin)
            return (
                np.log(mu - mumin),
                np.log(mu**2),
                np.log(var),
                np.ones(xt.shape[0], dtype=np.int64),
            )
        if isinstance(node, SplitNode):
            idx = self.getchild(node, xt)
            lm = np.zeros(xt.shape[0])
            lm2 = np.zeros(xt.shape[0])
            lv = np.zeros(xt.shape[0])
            n = np.zeros(xt.shape[0], dtype=np.int64)
            for k, c in enumerate(node.children):
                j = np.where(idx == k)[0]
                if j.size:
                    a, b, cc, d = self._predict(c, xt[j], mumin[j])
                    lm[j], lm2[j], lv[j], n[j] = a, b, cc, d
            return lm, lm2, lv, n
        lw = self.logweights[id(node)]
        cols = [self._predict(c, xt, mumin) for c in node.children]
        lm = np.stack([c[0] + lw[k] for k, c in enumerate(cols)], axis=1)
        lm2 = np.stack([c[1] + lw[k] for k, c in enumerate(cols)], axis=1)
        lv = np.stack([c[2] + lw[k] for k, c in enumerate(cols)], axis=1)
        n = sum(c[3] for c in cols)
        return (
            logsumexp(lm, axis=1),
            logsumexp(lm2, axis=1),
            logsumexp(lv, axis=1),
            n,
        )

    def predict(self, xt):
        """≙ ``predict(::GPSumNode)`` / ``predict(::DSMGP)``
        (``common.jl:294-304``)."""
        xt = np.asarray(xt, dtype=np.float64)
        mumin = self.minpredict(self.root, xt)
        lm, lm2, lv, _ = self._predict(self.root, xt, mumin - 1.0)
        mu = np.exp(lm) + mumin - 1.0
        v = np.exp(lv) + (np.exp(lm2) - mu**2)
        return mu, v

    # -- PoE family (common.jl:145-149,198-273) -----------------------------
    def _leaves(self, node):
        if isinstance(node, LeafNode):
            return [node]
        return [l for c in node.children for l in self._leaves(c)]

    def _poe_sub(self, node, xt):
        mu = np.zeros(xt.shape[0])
        t = np.zeros(xt.shape[0])
        for leaf in self._leaves(node):
            m, v = self.gps[id(leaf)].predict(xt)
            t += 1.0 / v
            mu += m / v
        return mu / t, t

    def predict_poe(self, xt):
        mu, t = self._poe_sub(self.root, xt)
        return mu, 1.0 / t

    def predict_gpoe(self, xt):
        M = len(self.root.children)
        beta = 1.0 / M
        mu = np.zeros(xt.shape[0])
        t = np.zeros(xt.shape[0])
        for c in self.root.children:
            m_c, t_c = self._poe_sub(c, xt)
            t += beta * t_c
            mu += beta * t_c * m_c
        return mu / t, 1.0 / t

    def predict_rbcm(self, xt):
        first_leaf = self._leaves(self.root)[0]
        gp = self.gps[id(first_leaf)]
        from .oracle import gram_np

        s = np.diag(gram_np(gp.kind, gp.logl, gp.logsigma, xt, xt)) + gp.noise
        C = 1.0 / s
        mu = np.zeros(xt.shape[0])
        for c in self.root.children:
            m_c, t_c = self._poe_sub(c, xt)
            s_c = 1.0 / t_c
            beta = 0.5 * (np.log(s) - np.log(s_c))
            C += beta * t_c - beta / s
            mu += m_c * beta * t_c
        return mu / C, 1.0 / C


def make_engine(model):
    """Build a RefEngine mirroring a framework model's current (tied) state."""
    theta = np.asarray(model.theta)
    assert theta.ndim == 1, "reference engine only models tied hypers"
    blocks = []
    for k in range(len(model.layout.kinds)):
        off, nl = model.layout.blocks[k]
        blocks.append((theta[off : off + nl], theta[off + nl], theta[off + nl + 1]))
    return RefEngine(model.root, model.X, model.y, model.layout.kinds, blocks)
