#!/usr/bin/env python
"""Benchmark harness — DSMGP (V=3, K=4) fit + predict at N=100k (1-D).

The north-star metric from BASELINE.json: exact posterior fit
(``fit!``-equivalent: one Cholesky per leaf expert) plus mixture prediction
at 2000 test points, wall-clock on the TPU, versus a sequential CPU float64
baseline.

The reference publishes no numbers (SURVEY §6), so the baseline is
*generated*: a NumPy/LAPACK float64 loop doing exactly what the reference's
``fit!`` does compute-wise — a full ``potrf`` per leaf plus triangular
solves (the reference refactorizes every leaf unconditionally at
``fit.jl:105``) — on the same tree, then routed per-leaf predictions. The
result is cached in ``BASELINE_GENERATED.json`` and reused.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_CACHE = os.path.join(REPO, "BASELINE_GENERATED.json")


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 1.0, n)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 4 * np.pi) + rng.normal(0.0, 0.2, n)
    return x, y


def build_model(x, y, dtype, m_min):
    import deepstructuredmixtures_tpu as dsm

    return dsm.build_dsmgp(
        x, y, V=3, K=4, M=m_min, kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0,
        seed=0, dtype=dtype, do_fit=False,
    )


def run_tpu(model, xt, chunk):
    """Timed fused fit+predict on device (compile excluded via warmup)."""
    import jax
    import jax.numpy as jnp

    from deepstructuredmixtures_tpu import fit as fitlib
    from deepstructuredmixtures_tpu import infer as inferlib
    from deepstructuredmixtures_tpu.models import _routed_moment_match

    tidx, tmask = model._route(xt)
    T = xt.shape[0]
    layout, plan = model.layout, model.plan

    @jax.jit
    def program(theta, batch, lw, xtd, tidx_d, tmask_d):
        mu, var, mll = fitlib.streamed_leaf_predict(
            layout, theta, batch, xtd, tidx_d, tmask_d, chunk=chunk
        )
        lw_new, z = inferlib.update_weights(plan, mll)
        mean, v = _routed_moment_match(plan, mu, var, lw_new, tidx_d, tmask_d, T)
        return z, mean, v

    args = (
        model.theta,
        model.batch,
        model.logweights,
        jnp.asarray(xt, model.dtype),
        jnp.asarray(tidx),
        jnp.asarray(tmask),
    )
    out = program(*args)  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = program(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    z, mean, var = out
    return dt, float(z), np.asarray(mean), np.asarray(var)


def run_cpu_baseline(model, x, y, xt):
    """Sequential float64 NumPy/LAPACK stand-in for the Julia reference:
    full per-leaf Cholesky + alpha (≙ update_cholesky!, every leaf,
    fit.jl:105), posterior weight update, routed per-leaf prediction with
    log-space moment matching."""
    import scipy.linalg as sla

    plan = model.plan
    theta = np.asarray(model.theta, dtype=np.float64)
    logl, logsigma, lognoise = theta[0], theta[1], theta[2]
    noise = np.exp(2 * lognoise)
    eps = 1e-8
    tidx, tmask = model._route(xt)
    L = plan.num_leaves

    t0 = time.perf_counter()
    leaf_mll = np.zeros(L)
    mus = np.zeros(tidx.shape)
    vars_ = np.ones(tidx.shape)
    for l, obs in enumerate(plan.leaf_obs):
        xl = x[obs]
        yl = y[obs] - plan.leaf_mean[l]
        n = len(obs)
        d2 = (xl[:, None, 0] - xl[None, :, 0]) ** 2
        K = np.exp(2 * logsigma) * np.exp(-0.5 * d2 * np.exp(-2 * logl))
        K[np.diag_indices_from(K)] += noise + eps
        Lf = np.linalg.cholesky(K)
        alpha = sla.cho_solve((Lf, True), yl)
        leaf_mll[l] = -0.5 * (
            yl @ alpha + 2 * np.log(np.diag(Lf)).sum() + n * np.log(2 * np.pi)
        )
        pts = xt[tidx[l][tmask[l]]]
        if pts.size:
            d2t = (xl[:, None, 0] - pts[None, :, 0]) ** 2
            Knt = np.exp(2 * logsigma) * np.exp(-0.5 * d2t * np.exp(-2 * logl))
            mu = plan.leaf_mean[l] + Knt.T @ alpha
            V = sla.solve_triangular(Lf, Knt, lower=True)
            var = np.exp(2 * logsigma) - (V * V).sum(0) + noise
            mus[l, : len(mu)] = mu
            vars_[l, : len(mu)] = var

    # posterior weight update + flat log-space moment matching
    import jax.numpy as jnp

    from deepstructuredmixtures_tpu import infer as inferlib

    lw, z = inferlib.update_weights(plan, jnp.asarray(leaf_mll))
    pw = np.asarray(inferlib.path_logweights(plan, lw))
    T = xt.shape[0]
    mean = np.zeros(T)
    var = np.zeros(T)
    flat_t = tidx[tmask]
    flat_mu = mus[tmask]
    flat_var = np.maximum(vars_[tmask], eps)
    flat_w = np.repeat(pw, tmask.sum(1))
    for t in range(T):
        sel = flat_t == t
        w = np.exp(flat_w[sel])
        m = flat_mu[sel]
        v = flat_var[sel]
        mean[t] = (w * m).sum()
        var[t] = (w * v).sum() + (w * m * m).sum() - mean[t] ** 2
    dt = time.perf_counter() - t0
    return dt, float(z), mean, var


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--test", type=int, default=2000)
    ap.add_argument("--quick", action="store_true",
                    help="small sanity run (N=2000)")
    ap.add_argument("--regen-baseline", action="store_true")
    ap.add_argument("--m-min", type=int, default=30)
    args = ap.parse_args()

    if args.quick:
        args.n, args.test = 2000, 200

    import jax
    import jax.numpy as jnp

    dtype = jnp.float32 if jax.devices()[0].platform != "cpu" else jnp.float64

    x, y = make_data(args.n)
    xt = np.linspace(-0.05, 1.05, args.test).reshape(-1, 1)
    model = build_model(x, y, dtype, args.m_min)
    nmax = model.plan.nmax
    from deepstructuredmixtures_tpu.fit import default_chunk

    chunk = default_chunk(nmax, dtype, budget_bytes=6 << 30)

    dt_tpu, z_tpu, mean_tpu, var_tpu = run_tpu(model, xt, chunk)

    # -- baseline (cached) -------------------------------------------------
    cache_key = f"n{args.n}_t{args.test}_m{args.m_min}"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if args.regen_baseline or cache_key not in cache:
        dt_cpu, z_cpu, mean_cpu, var_cpu = run_cpu_baseline(model, x, y, xt)
        # numeric sanity: TPU result close to float64 CPU result
        err_z = abs(z_tpu - z_cpu) / max(1.0, abs(z_cpu))
        err_mu = float(np.max(np.abs(mean_tpu - mean_cpu)))
        cache[cache_key] = {
            "cpu_seconds": dt_cpu,
            "log_evidence_cpu": z_cpu,
            "rel_err_log_evidence": err_z,
            "max_abs_err_mean": err_mu,
            "platform": "numpy-f64-singlethread-standin",
        }
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    base = cache[cache_key]

    result = {
        "metric": f"dsmgp_v3k4_fit_update_predict_n{args.n}_t{args.test}_wallclock",
        "value": round(dt_tpu, 4),
        "unit": "s",
        "vs_baseline": round(base["cpu_seconds"] / dt_tpu, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
