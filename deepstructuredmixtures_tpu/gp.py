"""Standalone exact Gaussian process.

User-facing equivalent of the reference ``GaussianProcess``
(``src/gaussianprocess.jl``): exact posterior via Cholesky (R&W Alg. 2.1),
closed-form prediction with full posterior covariance, marginal
log-likelihood, and autodiff hyper-gradients (replacing the hand trace
formulas at ``gaussianprocess.jl:165-226``). Parameter vector layout is
``[log lengthscales..., log sigma, log noise]`` (``gaussianprocess.jl:147-161``),
noise is ``exp(2 logNoise)`` (``:39``).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import EPS, as_2d, default_dtype
from .kernels import KernelSpec, IsoSE, gram, gram_diag
from .means import ConstMean, resolve_mean

LOG2PI = float(np.log(2.0 * np.pi))


def _unpack(kind, nl, theta):
    logl = theta[:nl]
    logsigma = theta[nl]
    lognoise = theta[nl + 1]
    return logl, logsigma, lognoise


@partial(jax.jit, static_argnums=(0, 1))
def _fit(kind, nl, theta, x, yc):
    logl, logsigma, lognoise = _unpack(kind, nl, theta)
    K = gram(kind, logl, logsigma, x, x)
    noise = jnp.exp(2.0 * lognoise)
    Kn = K + (noise + EPS) * jnp.eye(x.shape[0], dtype=x.dtype)
    Lf = jnp.linalg.cholesky(Kn)
    z = jax.scipy.linalg.solve_triangular(Lf, yc, lower=True)
    alpha = jax.scipy.linalg.solve_triangular(Lf.T, z, lower=False)
    mll = -0.5 * (
        yc @ alpha
        + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lf)))
        + x.shape[0] * LOG2PI
    )
    return Lf, alpha, mll


@partial(jax.jit, static_argnums=(0, 1, 2))
def _predict(kind, nl, full_cov, theta, x, yc, mean, Lf, alpha, xt):
    logl, logsigma, lognoise = _unpack(kind, nl, theta)
    Knt = gram(kind, logl, logsigma, x, xt)  # [N, T]
    mu = mean + Knt.T @ alpha
    V = jax.scipy.linalg.solve_triangular(Lf, Knt, lower=True)
    noise = jnp.exp(2.0 * lognoise)
    if full_cov:
        Ktt = gram(kind, logl, logsigma, xt, xt)
        Sigma = Ktt - V.T @ V + noise * jnp.eye(xt.shape[0], dtype=x.dtype)
        return mu, Sigma
    ktt = gram_diag(kind, logl, logsigma, xt)
    var = ktt - jnp.sum(V * V, axis=0) + noise
    return mu, var


@partial(jax.jit, static_argnums=(0, 1))
def _mll(kind, nl, theta, x, yc):
    return _fit(kind, nl, theta, x, yc)[2]


_grad_mll = jax.jit(jax.grad(_mll, argnums=2), static_argnums=(0, 1))


class GaussianProcess:
    """Exact GP regression model (≙ ``GaussianProcess``,
    ``gaussianprocess.jl:14-80``)."""

    def __init__(
        self,
        x,
        y,
        mean: Optional[ConstMean] = None,
        kernel: KernelSpec = None,
        log_noise: float = float(np.log(7.0)),
        dtype=None,
        run_cholesky: bool = False,
    ):
        dtype = dtype or default_dtype()
        self.kernel = kernel if kernel is not None else IsoSE(0.0, 0.0)
        x = as_2d(x)
        y = np.asarray(y, dtype=np.float64)
        self.mean_value = resolve_mean(mean, y)
        self.x = jnp.asarray(x, dtype=dtype)
        self.yc = jnp.asarray(y - self.mean_value, dtype=dtype)
        self.n, self.d = x.shape
        # theta = [logl..., logsigma, lognoise]
        self.theta = jnp.asarray(
            list(self.kernel.logl) + [self.kernel.logsigma, log_noise], dtype=dtype
        )
        self._state = None
        if run_cholesky:
            self.fit()

    # -- parameters (≙ params/setparams!, gaussianprocess.jl:141-161) -----
    @property
    def nl(self) -> int:
        return self.kernel.n_lengthscales

    def params(self):
        """(log lengthscales, log sigma, log noise)."""
        t = np.asarray(self.theta)
        return t[: self.nl], float(t[self.nl]), float(t[self.nl + 1])

    def set_params(self, theta):
        """New hypers invalidate the cached posterior; the next fit reuses
        the last fit configuration (incl. a distributed mesh — forgetting
        it would rebuild the full [N, N] covariance on one device, the
        exact situation the mesh path exists to avoid)."""
        self.theta = jnp.asarray(theta, dtype=self.x.dtype)
        self._state = None

    # -- fitting / inference ----------------------------------------------
    def fit(self, mesh=None, block: int = 256, axis: Optional[str] = None):
        """≙ ``update_cholesky!`` (``gaussianprocess.jl:87-108``).

        ``mesh``: a ``jax.sharding.Mesh`` routes the fit through the
        distributed blocked Cholesky (``parallel.dist_chol``) with the
        covariance row-sharded across devices — the path for a single
        expert whose [N, N] covariance exceeds one chip's HBM (the
        reference caps experts at one host's memory; this removes the
        cap). Inputs are zero-padded up to the ``num_devices * block``
        tiling automatically; prediction then runs distributed too.

        ``axis``: the mesh axis to shard over. The blocked factorization
        parallelizes over exactly ONE axis; on a multi-axis mesh it must
        be named explicitly (sharding over one axis of several leaves the
        rest idle — prefer a 1-D mesh over all devices).
        """
        self._last_fit_cfg = (mesh, block, axis)
        if mesh is None:
            self._state = _fit(
                self.kernel.kind, self.nl, self.theta, self.x, self.yc
            )
            self._mesh = None
            return self
        from .parallel.dist_chol import sharded_gp_fit

        if axis is None:
            if len(mesh.shape) > 1:
                raise ValueError(
                    "fit(mesh=...) shards over a single mesh axis; this "
                    f"mesh has axes {tuple(mesh.shape)} — pass axis='name' "
                    "explicitly (the other axes stay UNUSED), or build a "
                    "1-D mesh over all devices"
                )
            axis = next(iter(mesh.shape))
        ndev = mesh.shape[axis]
        tile = ndev * block
        npad = ((self.n + tile - 1) // tile) * tile
        xp = jnp.zeros((npad, self.d), dtype=self.x.dtype).at[: self.n].set(self.x)
        yp = jnp.zeros((npad,), dtype=self.yc.dtype).at[: self.n].set(self.yc)
        logl, logsigma, lognoise = (
            self.theta[: self.nl], self.theta[self.nl], self.theta[self.nl + 1]
        )
        alpha, mll, Lf = sharded_gp_fit(
            xp, yp, logl, logsigma, lognoise, mesh, axis=axis, block=block,
            valid_n=self.n, kind=self.kernel.kind, return_factor=True,
        )
        self._state = (Lf, alpha, mll)
        self._mesh = (mesh, axis, block, xp)
        return self

    def _ensure(self):
        if self._state is None:
            mesh, block, axis = getattr(self, "_last_fit_cfg", (None, 256, None))
            self.fit(mesh=mesh, block=block, axis=axis)
        return self._state

    def mll(self) -> float:
        """Marginal log-likelihood (≙ ``gaussianprocess.jl:163``)."""
        return float(self._ensure()[2])

    def grad_mll(self):
        """Exact gradient of the mll w.r.t. the log-parameter vector
        (autodiff; replaces ``∇mll!``, ``gaussianprocess.jl:192-217``).

        Single-device only: raises on a mesh-fitted GP rather than
        silently rebuilding the full [N, N] covariance on one chip (the
        exact OOM ``fit(mesh=...)`` exists to avoid)."""
        if getattr(self, "_mesh", None) is not None:
            raise NotImplementedError(
                "hyper-gradients are single-device only; for a mesh-fitted "
                "GP, train hypers on a subsample (or a single-device-sized "
                "model) and refit distributed with fit(mesh=...)"
            )
        return _grad_mll(self.kernel.kind, self.nl, self.theta, self.x, self.yc)

    def predict(self, xt, full_cov: bool = False):
        """Posterior prediction (≙ ``prediction``,
        ``gaussianprocess.jl:110-137``). Returns ``(mu, var)`` or
        ``(mu, Sigma)`` with observation noise on the diagonal. After a
        ``fit(mesh=...)``, runs distributed on the sharded factor
        (``full_cov`` not supported there)."""
        Lf, alpha, _ = self._ensure()
        xt = jnp.asarray(as_2d(np.asarray(xt)), dtype=self.x.dtype)
        if getattr(self, "_mesh", None) is not None:
            if full_cov:
                raise NotImplementedError(
                    "full_cov prediction is single-device only; the "
                    "distributed path returns marginal variances"
                )
            from .parallel.dist_chol import sharded_gp_predict

            mesh, axis, block, xp = self._mesh
            return sharded_gp_predict(
                Lf, xp, alpha,
                self.theta[: self.nl], self.theta[self.nl],
                self.theta[self.nl + 1], xt, mesh, axis=axis, block=block,
                mean=self.mean_value, valid_n=self.n, kind=self.kernel.kind,
            )
        return _predict(
            self.kernel.kind, self.nl, full_cov, self.theta, self.x, self.yc,
            self.mean_value, Lf, alpha, xt,
        )
