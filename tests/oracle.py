"""Pure-NumPy oracle implementations used to gate the JAX framework.

These re-derive the reference semantics (exact GP posterior, mixture moment
matching, PoE fusions) independently with float64 NumPy/SciPy so that the
batched/padded/masked TPU code paths can be verified to 1e-6 or better —
the parity gate from BASELINE.md. They mirror the reference formulas at
``gaussianprocess.jl:87-137,163`` and ``common.jl:198-302`` directly.
"""
from __future__ import annotations

import numpy as np
import scipy.linalg as sla

LOG2PI = float(np.log(2.0 * np.pi))
EPS = 1e-8


def gram_np(kind, logl, logsigma, x1, x2):
    logl = np.atleast_1d(np.asarray(logl, dtype=np.float64))
    if kind == "iso_se":
        d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
        return np.exp(2 * logsigma) * np.exp(-0.5 * d2 * np.exp(-2 * logl[0]))
    if kind == "ard_se":
        d2 = (x1[:, None, :] - x2[None, :, :]) ** 2
        return np.exp(2 * logsigma) * np.exp(-0.5 * d2 * np.exp(-2 * logl)).sum(-1)
    if kind == "iso_linear":
        return (x1 @ x2.T) * np.exp(-2 * logl[0])
    if kind == "ard_linear":
        return (x1 * np.exp(-2 * logl)) @ x2.T
    raise ValueError(kind)


class OracleGP:
    """Exact GP (reference ``GaussianProcess`` semantics)."""

    def __init__(self, x, y, kind, logl, logsigma, lognoise, mean=None):
        self.x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.mean = float(y.mean()) if mean is None else float(mean)
        self.yc = y - self.mean
        self.kind, self.logl, self.logsigma, self.lognoise = (
            kind,
            np.atleast_1d(logl).astype(np.float64),
            float(logsigma),
            float(lognoise),
        )
        self.noise = np.exp(2 * self.lognoise)
        self.fit()

    def fit(self):
        K = gram_np(self.kind, self.logl, self.logsigma, self.x, self.x)
        Kn = K + (self.noise + EPS) * np.eye(len(self.x))
        self.L = np.linalg.cholesky(Kn)
        self.alpha = sla.cho_solve((self.L, True), self.yc)

    def mll(self):
        return -0.5 * (
            self.yc @ self.alpha
            + 2 * np.sum(np.log(np.diag(self.L)))
            + len(self.x) * LOG2PI
        )

    def predict(self, xt):
        Knt = gram_np(self.kind, self.logl, self.logsigma, self.x, xt)
        mu = self.mean + Knt.T @ self.alpha
        V = sla.solve_triangular(self.L, Knt, lower=True)
        ktt = np.diag(gram_np(self.kind, self.logl, self.logsigma, xt, xt))
        var = ktt - (V * V).sum(0) + self.noise
        return mu, var


def mixture_moments(mus, vars_, logws):
    """Brute-force mixture moment matching: the oracle for the reference's
    log-space μmin trick (``common.jl:294-302``)."""
    w = np.exp(np.asarray(logws))
    w = w / w.sum()
    mu = (w * mus).sum()
    v = (w * vars_).sum() + (w * mus**2).sum() - mu**2
    return mu, v
