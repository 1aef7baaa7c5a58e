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


def run_tpu(model, xt, iters=3, budget=2 << 30):
    """Timed fused fit+update+predict on device, size-bucketed.

    Timing notes: the axon/TPU dispatch is asynchronous and
    ``block_until_ready`` alone does not reliably fence the remote stream,
    so each timed iteration is closed with a device-to-host fetch of the
    scalar log-evidence (which cannot materialize before the whole program
    finishes). Compile + the one-time d2h path setup are excluded via a
    warmup call; the reported time is the minimum over ``iters`` runs.
    """
    import jax
    import jax.numpy as jnp

    from deepstructuredmixtures_tpu import fit as fitlib
    from deepstructuredmixtures_tpu import infer as inferlib
    from deepstructuredmixtures_tpu.models import _routed_moment_match

    tidx, tmask = model._route(xt)
    T = xt.shape[0]
    layout, plan = model.layout, model.plan
    ids, L = model.bucket_spec.leaf_ids, model.num_leaves

    @jax.jit
    def program(theta, batches, xtd, tidx_d, tmask_d):
        mu, var, mll = fitlib.bucketed_streamed_predict(
            layout, theta, batches, ids, L, xtd, tidx_d, tmask_d,
            budget=budget,
        )
        lw_new, z = inferlib.update_weights(plan, mll)
        mean, v = _routed_moment_match(plan, mu, var, lw_new, tidx_d, tmask_d, T)
        return z, mean, v, mll

    args = (
        model.theta,
        model.bucket_batches,
        jnp.asarray(xt, model.dtype),
        jnp.asarray(tidx),
        jnp.asarray(tmask),
    )
    out = program(*args)  # compile + warmup (incl. first d2h)
    _ = float(out[0])
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = program(*args)
        z = float(out[0])  # d2h fence: forces program completion
        times.append(time.perf_counter() - t0)
    dt = min(times)
    z, mean, var, mll = out
    return dt, float(z), np.asarray(mean), np.asarray(var), np.asarray(mll)


def _cpu_leaf_work(x, y, xt, plan, theta, l, tidx, tmask):
    """One leaf's fit+predict on CPU f64 — exactly what the reference does
    per leaf: gram + potrf (``update_cholesky!``) + alpha + mll + routed
    prediction (``prediction``). Returns (seconds, mll)."""
    import scipy.linalg as sla

    logl, logsigma, lognoise = theta[0], theta[1], theta[2]
    noise = np.exp(2 * lognoise)
    eps = 1e-8
    obs = plan.leaf_obs[l]
    xl = x[obs]
    yl = y[obs] - plan.leaf_mean[l]
    n = len(obs)
    t0 = time.perf_counter()
    d2 = ((xl[:, None, :] - xl[None, :, :]) ** 2).sum(-1)
    K = np.exp(2 * logsigma) * np.exp(-0.5 * d2 * np.exp(-2 * logl))
    K[np.diag_indices_from(K)] += noise + eps
    Lf = np.linalg.cholesky(K)
    alpha = sla.cho_solve((Lf, True), yl)
    mll = -0.5 * (
        yl @ alpha + 2 * np.log(np.diag(Lf)).sum() + n * np.log(2 * np.pi)
    )
    pts = xt[tidx[l][tmask[l]]]
    if pts.size:
        d2t = ((xl[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        Knt = np.exp(2 * logsigma) * np.exp(-0.5 * d2t * np.exp(-2 * logl))
        _mu = plan.leaf_mean[l] + Knt.T @ alpha
        V = sla.solve_triangular(Lf, Knt, lower=True)
        _var = np.exp(2 * logsigma) - (V * V).sum(0) + noise
    return time.perf_counter() - t0, float(mll)


def run_cpu_baseline(model, x, y, xt, max_per_bucket=3):
    """CPU float64 NumPy/LAPACK stand-in for the Julia reference's
    sequential per-leaf loop (one full ``potrf`` + solves per leaf,
    ``fit.jl:105,294-304``) with routed per-leaf prediction.

    Because the exact loop is O(sum n_l^3) on a single host core (~hours at
    N=100k), the wall-clock is estimated by *stratified sampling*: leaves
    are grouped by the model's size buckets, up to ``max_per_bucket``
    representative leaves per bucket are timed exactly, and each bucket
    contributes mean_sampled_time x leaf_count. Returns
    ``(seconds_estimate, n_sampled, {leaf: mll})`` — the sampled leaf mlls
    let the caller sanity-check TPU numerics against f64.
    """
    plan = model.plan
    theta = np.asarray(model.theta, dtype=np.float64)
    tidx, tmask = model._route(xt)

    total = 0.0
    sampled = 0
    mlls = {}
    for ids in model.bucket_spec.leaf_ids:
        ids = np.asarray(ids)
        if ids.size == 0:
            continue
        sizes = np.array([len(plan.leaf_obs[l]) for l in ids])
        order = ids[np.argsort(sizes)]
        k = min(max_per_bucket, len(order))
        picks = [order[int(round(i * (len(order) - 1) / max(k - 1, 1)))]
                 for i in range(k)]
        picks = list(dict.fromkeys(int(p) for p in picks))
        times = []
        for l in picks:
            dt, mll = _cpu_leaf_work(x, y, xt, plan, theta, l, tidx, tmask)
            times.append(dt)
            mlls[l] = mll
            sampled += 1
        total += float(np.mean(times)) * len(ids)
    return total, sampled, mlls


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

    dt_tpu, z_tpu, mean_tpu, var_tpu, mll_tpu = run_tpu(model, xt)

    # -- baseline (cached) -------------------------------------------------
    cache_key = f"n{args.n}_t{args.test}_m{args.m_min}"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if args.regen_baseline or cache_key not in cache:
        dt_cpu, n_sampled, mlls_cpu = run_cpu_baseline(model, x, y, xt)
        # numeric sanity: TPU leaf mlls close to float64 CPU oracles
        # (relative: leaf mlls are O(-n) large at these sizes).
        err_mll = max(
            abs(mll_tpu[l] - v) / max(1.0, abs(v)) for l, v in mlls_cpu.items()
        )
        cache[cache_key] = {
            "cpu_seconds": dt_cpu,
            "sampled_leaves": n_sampled,
            "max_rel_err_leaf_mll": float(err_mll),
            "platform": "numpy-f64-1core-stratified-standin",
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
