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
headline CPU figure is a *stratified-sampling extrapolation* (representative
leaves per size bucket timed exactly, scaled by bucket counts); its error is
bounded by a fully-measured anchor run at a feasible N (``--anchor``).
Results are cached in ``BASELINE_GENERATED.json`` and reused.

Besides wall-clock the JSON line reports **MFU**: analytic model FLOPs
(per leaf with true size n and t routed test points: gram ``2n²D``,
Cholesky ``n³/3``, forward solves ``2n²(t+1)``, cross-gram ``2ntD``,
moments ``4nt``) divided by wall-clock and the chip's peak (see
``_PEAK_FLOPS``).

End-to-end float64 accuracy of the TPU run is gated by a FULL per-leaf
f64 oracle (``--oracle-chunk`` builds it incrementally on the 1-core CPU
host; the final combine reports max relative errors of the predictive
mean/variance and every leaf mll; cached next to the baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu"}.
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

#: Peak FLOP/s used as the MFU denominator, by device_kind prefix. TPU v5e
#: publishes 197 TFLOP/s bf16 on the MXU; fp32 matmuls pass the MXU several
#: times, so measuring f32 runs against the full bf16 peak is conservative
#: (a dtype-aware denominator would only raise the reported MFU).
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def model_flops(plan, tidx, tmask) -> float:
    """Analytic model FLOPs of one fused fit+update+predict pass with TRUE
    leaf sizes (padding work excluded — this is model FLOPs utilisation,
    not hardware occupancy)."""
    D = plan.dim
    t_routed = np.asarray(tmask).sum(axis=1)
    total = 0.0
    for l, obs in enumerate(plan.leaf_obs):
        n = float(obs.size)
        t = float(t_routed[l])
        total += (
            2.0 * n * n * D          # training gram
            + n ** 3 / 3.0           # Cholesky
            + 2.0 * n * n * (t + 1)  # forward solve: y and K_nt columns
            + 2.0 * n * t * D        # cross gram
            + 4.0 * n * t            # predictive mean + variance reductions
        )
    return total


def peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "")
    for prefix, peak in _PEAK_FLOPS.items():
        if kind.startswith(prefix):
            return peak
    return None


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 1.0, n)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 4 * np.pi) + rng.normal(0.0, 0.2, n)
    return x, y


def build_model(x, y, dtype, m_min, depth=2, overlap=True):
    import deepstructuredmixtures_tpu as dsm

    return dsm.build_dsmgp(
        x, y, V=3, K=4, M=m_min, kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0,
        seed=0, dtype=dtype, do_fit=False, depth=depth, overlap=overlap,
    )


def run_tpu(model, xt, iters=3, budget=2 << 30, refine_steps=0,
            split=None):
    """Timed fused fit+update+predict on device, size-bucketed.

    Timing notes: the axon/TPU dispatch is asynchronous and
    ``block_until_ready`` alone does not reliably fence the remote stream,
    so each timed iteration is closed with a device-to-host fetch of the
    scalar log-evidence (which cannot materialize before the whole program
    finishes). Compile + the one-time d2h path setup are excluded via a
    warmup call; the reported time is the minimum over ``iters`` runs.

    ``split`` compiles ONE PROGRAM PER BUCKET plus a combine program
    instead of the single fused module. Defaults to ``refine_steps > 0``
    (the x64-enabled refined all-bucket module OOM-kills the remote
    compile helper — the same boundary as the f64 headline compile,
    BASELINE.md); also needed for scale-frontier trees whose 40+-bucket
    f32 module is itself too big to compile (N=1M). The timed loop
    dispatches every bucket program then the combine, so the reported
    wall-clock INCLUDES the extra per-bucket dispatch overhead — an
    honest end-to-end figure.
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
    tidx_d = jnp.asarray(tidx)
    tmask_d = jnp.asarray(tmask)
    xtd = jnp.asarray(xt, model.dtype)
    if split is None:
        split = refine_steps > 0

    if not split:

        @jax.jit
        def program(theta, batches, xtd, tidx_d, tmask_d):
            mu, var, mll = fitlib.bucketed_streamed_predict(
                layout, theta, batches, ids, L, xtd, tidx_d, tmask_d,
                budget=budget, refine_steps=refine_steps,
            )
            lw_new, z = inferlib.update_weights(plan, mll)
            mean, v = _routed_moment_match(
                plan, mu, var, lw_new, tidx_d, tmask_d, T
            )
            # per-leaf routed moments ride along for the --check-mlls
            # predictive gates (d2h only on demand — the timing fence
            # fetches the scalar z alone)
            return z, mean, v, mll, mu, var

        args = (model.theta, model.bucket_batches, xtd, tidx_d, tmask_d)

        def run_once():
            return program(*args)

    else:
        dt_model = model.dtype

        def bucket_program(b, bids):
            bids = jnp.asarray(bids)
            chunk = fitlib._bucket_chunk(b.nmax, b.num_leaves, b.x.dtype,
                                         budget)

            @jax.jit
            def prog(theta, batch, xtd, ti, tm):
                th = theta if theta.ndim == 1 else theta[bids]
                return fitlib.streamed_leaf_predict(
                    layout, th, batch, xtd, ti, tm, chunk=chunk,
                    refine_steps=refine_steps,
                )

            return prog, (model.theta, b, xtd, tidx_d[bids], tmask_d[bids])

        progs = [bucket_program(b, bids)
                 for b, bids in zip(model.bucket_batches, ids)]

        # tidx/tmask enter as ARGUMENTS: closing over device arrays embeds
        # them as mlir constants, which both duplicates them on HBM and
        # forces a d2h fetch at trace time (observed to fail with
        # RESOURCE_EXHAUSTED at N=1M right after the 43 bucket programs).
        # under refinement the bucket programs emit f64 moments/mlls and
        # the combine must stay f64 (the moment-matching cancellation
        # re-floors at ~2.4e-3 in f32 — see ops/refine.refine_joint)
        dt_comb = jnp.float64 if refine_steps else dt_model

        @jax.jit
        def combine(mus, vars_, mlls, ti, tm):
            tmax = ti.shape[1]
            mu = jnp.zeros((L, tmax), dtype=dt_comb)
            var = jnp.ones((L, tmax), dtype=dt_comb)
            mll = jnp.zeros((L,), dtype=dt_comb)
            for bids, m, v, ml in zip(ids, mus, vars_, mlls):
                idx = jnp.asarray(bids)
                mu = mu.at[idx].set(m)
                var = var.at[idx].set(v)
                mll = mll.at[idx].set(ml)
            lw_new, z = inferlib.update_weights(plan, mll)
            mean, vv = _routed_moment_match(
                plan, mu, var, lw_new, ti, tm, T
            )
            return z, mean, vv, mll, mu, var

        # When any bucket's covariance workspace is multi-GB, EVERY
        # program is fenced after dispatch: async enqueue lets the
        # runtime overlap queued programs' temp allocations, and at N=1M
        # (nmax up to ~33k -> ~4.4 GB per [n, n] buffer, ~13 GB peak per
        # giant program measured standalone-OK) any overlap exhausts the
        # 16 GB HBM. The fences add ~25 ms per bucket — ~1 s against the
        # multi-minute run, included in the reported wall-clock.
        fence_all = any(b.nmax * b.nmax * 12 > (1 << 30)
                        for b in model.bucket_batches)

        # Giants first: the multi-GB contiguous workspaces allocate while
        # the device heap is least fragmented (observed: the 30k-leaf
        # bucket OOMs after 40 smaller buckets ran, yet succeeds in
        # isolation — fragmentation, not capacity).
        dispatch_order = sorted(
            range(len(progs)),
            key=lambda k: -model.bucket_batches[k].nmax,
        )

        def run_once():
            outs_by = {}
            for bi in dispatch_order:
                p, a = progs[bi]
                o = p(*a)
                if fence_all:
                    # a d2h fetch, not just block_until_ready: on the
                    # remote backend execution errors surface only at
                    # transfer, so this both serializes workspaces and
                    # attributes any failure to its bucket
                    try:
                        np.asarray(o[2])
                    except Exception as e:
                        raise RuntimeError(
                            f"bucket {bi} (nmax="
                            f"{model.bucket_batches[bi].nmax}) failed"
                        ) from e
                outs_by[bi] = o
            outs = [outs_by[k] for k in range(len(progs))]
            return combine([o[0] for o in outs], [o[1] for o in outs],
                           [o[2] for o in outs], tidx_d, tmask_d)

    out = run_once()  # compile + warmup (incl. first d2h)
    _ = float(out[0])
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = run_once()
        z = float(out[0])  # d2h fence: forces program completion
        times.append(time.perf_counter() - t0)
    dt = min(times)
    z, mean, var, mll, mu_leaf, var_leaf = out
    return (dt, float(z), np.asarray(mean), np.asarray(var),
            np.asarray(mll), mu_leaf, var_leaf)


def _cpu_leaf_work(x, y, xt, plan, theta, l, tidx, tmask):
    """One leaf's fit+predict on CPU f64 — exactly what the reference does
    per leaf: gram + potrf (``update_cholesky!``) + alpha + mll + routed
    prediction (``prediction``). Returns (seconds, mll, mu, var) with the
    routed predictive moments padded to the tidx width (zeros past the
    routed count)."""
    import scipy.linalg as sla

    logl, logsigma, lognoise = theta[0], theta[1], theta[2]
    noise = np.exp(2 * lognoise)
    eps = 1e-8
    obs = plan.leaf_obs[l]
    xl = x[obs]
    yl = y[obs] - plan.leaf_mean[l]
    n = len(obs)
    tmax = tidx.shape[1]
    mu = np.zeros(tmax)
    var = np.zeros(tmax)
    t0 = time.perf_counter()
    d2 = ((xl[:, None, :] - xl[None, :, :]) ** 2).sum(-1)
    K = np.exp(2 * logsigma) * np.exp(-0.5 * d2 * np.exp(-2 * logl))
    K[np.diag_indices_from(K)] += noise + eps
    Lf = np.linalg.cholesky(K)
    alpha = sla.cho_solve((Lf, True), yl)
    mll = -0.5 * (
        yl @ alpha + 2 * np.log(np.diag(Lf)).sum() + n * np.log(2 * np.pi)
    )
    nt = int(tmask[l].sum())
    pts = xt[tidx[l][:nt]]
    if pts.size:
        d2t = ((xl[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        Knt = np.exp(2 * logsigma) * np.exp(-0.5 * d2t * np.exp(-2 * logl))
        mu[:nt] = plan.leaf_mean[l] + Knt.T @ alpha
        V = sla.solve_triangular(Lf, Knt, lower=True)
        var[:nt] = np.exp(2 * logsigma) - (V * V).sum(0) + noise
    return time.perf_counter() - t0, float(mll), mu, var


def run_cpu_baseline(model, x, y, xt, max_per_bucket=3):
    """CPU float64 NumPy/LAPACK stand-in for the Julia reference's
    sequential per-leaf loop (one full ``potrf`` + solves per leaf,
    ``fit.jl:105,294-304``) with routed per-leaf prediction.

    Because the exact loop is O(sum n_l^3) on a single host core (~hours at
    N=100k), the wall-clock is estimated by *stratified sampling*: leaves
    are grouped by the model's size buckets, up to ``max_per_bucket``
    representative leaves per bucket are timed exactly, and each bucket
    contributes mean_sampled_time x leaf_count. Returns
    ``(seconds_estimate, n_sampled, {leaf: mll}, {leaf: (mu, var, nt)})``
    — the sampled leaves' f64 mlls AND routed predictive moments let the
    caller gate TPU numerics at scales where a full oracle is infeasible.
    """
    plan = model.plan
    theta = np.asarray(model.theta, dtype=np.float64)
    tidx, tmask = model._route(xt)

    total = 0.0
    sampled = 0
    mlls = {}
    moments = {}
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
            dt, mll, mu, var = _cpu_leaf_work(x, y, xt, plan, theta, l, tidx, tmask)
            times.append(dt)
            mlls[l] = mll
            moments[l] = (mu, var, int(tmask[l].sum()))
            sampled += 1
        total += float(np.mean(times)) * len(ids)
    return total, sampled, mlls, moments


# ---------------------------------------------------------------------------
# Full float64 oracle — every leaf, built incrementally (1-core host)
# ---------------------------------------------------------------------------


def oracle_path(n: int) -> str:
    return os.path.join(REPO, f".oracle_n{n}.npz")


def run_oracle_chunk(model, x, y, xt, start: int, count: int, n: int):
    """Compute the f64 per-leaf oracle (mll + routed predictive moments)
    for leaves [start, start+count) and merge into the on-disk store.
    The store is resumable: re-invoke until ``done == num_leaves``."""
    plan = model.plan
    L = plan.num_leaves
    theta = np.asarray(model.theta, dtype=np.float64)
    tidx, tmask = model._route(np.asarray(xt))
    path = oracle_path(n)
    if os.path.exists(path):
        st = dict(np.load(path))
    else:
        st = {
            "mll": np.full(L, np.nan),
            "mu": np.zeros((L, tidx.shape[1])),
            "var": np.zeros((L, tidx.shape[1])),
            "done": np.zeros(L, dtype=bool),
        }
    end = min(start + count, L)
    t0 = time.perf_counter()
    for l in range(start, end):
        if st["done"][l]:
            continue
        _, mll, mu, var = _cpu_leaf_work(x, y, xt, plan, theta, l, tidx, tmask)
        st["mll"][l] = mll
        st["mu"][l] = mu
        st["var"][l] = var
        st["done"][l] = True
    # atomic write: a kill mid-savez must not corrupt hours of oracle work
    tmp = path + ".tmp.npz"
    np.savez(tmp, **st)
    os.replace(tmp, path)
    ndone = int(st["done"].sum())
    print(f"oracle: {ndone}/{L} leaves done "
          f"(+{end - start} in {time.perf_counter() - t0:.1f}s)")
    return ndone, L


def _np_update_weights(plan, leaf_mlls):
    """f64 NumPy replica of ``infer.update_weights`` (posterior sum-node
    weights + root log evidence) for the oracle combine."""
    vals = np.asarray(leaf_mlls, dtype=np.float64)
    lw = np.zeros(max(plan.n_sum_edges, 1))
    for g in plan.groups:
        child = vals[g.child_slots]
        if g.kind == "split":
            new = np.zeros(g.n_parents)
            np.add.at(new, g.seg, child)
        else:
            raw = child + g.neg_logk
            m = np.full(g.n_parents, -np.inf)
            np.maximum.at(m, g.seg, raw)
            e = np.zeros(g.n_parents)
            np.add.at(e, g.seg, np.exp(raw - m[g.seg]))
            z = m + np.log(e)
            lw[g.edge_ids] = raw - z[g.seg]
            new = z
        vals = np.concatenate([vals, new])
    return lw, vals[plan.root_slot]


def _np_moment_match(plan, mu, var, lw, tidx, tmask, T):
    """f64 NumPy replica of ``models._routed_moment_match``."""
    # sparse path gather (the dense [L, E] path_matrix is ~GB at frontier
    # leaf counts; each leaf's path crosses only O(depth) sum edges)
    pw = (lw[plan.path_edges] * plan.path_mask).sum(axis=1)  # [L]
    var = np.maximum(var, 1e-8)
    seg = tidx.reshape(-1)
    msk = tmask.reshape(-1)
    muf = mu.reshape(-1)
    varf = var.reshape(-1)
    wf = np.broadcast_to(pw[:, None], mu.shape).reshape(-1)

    mu_min = np.full(T, np.inf)
    np.minimum.at(mu_min, seg[msk], muf[msk])
    shift = mu_min - 1.0

    def seg_lse(xv):
        m = np.full(T, -np.inf)
        np.maximum.at(m, seg[msk], xv[msk])
        m_safe = np.where(np.isfinite(m), m, 0.0)
        e = np.zeros(T)
        np.add.at(e, seg[msk], np.exp(xv[msk] - m_safe[seg[msk]]))
        return m_safe + np.log(e)

    # masked-out entries never reach seg_lse; keep them out of the log
    # so padded leaf moments don't raise invalid-value warnings
    lmu = seg_lse(wf + np.log(np.where(msk, muf - shift[seg], 1.0)))
    lmu2 = seg_lse(wf + np.log(np.maximum(muf * muf, 1e-300)))
    lvar = seg_lse(wf + np.log(varf))
    mean = np.exp(lmu) + shift
    v = np.exp(lvar) + (np.exp(lmu2) - mean * mean)
    return mean, v


def oracle_errors(model, xt, n, z_tpu, mean_tpu, var_tpu, mll_tpu,
                  y_scale: float = 1.0):
    """End-to-end f64-vs-TPU errors from a COMPLETE oracle store, or None.

    Combines the per-leaf f64 moments through the f64 SPN (weight update +
    log-space moment matching) and reports errors over all test points and
    all leaves. Means are reported in ABSOLUTE terms (and relative to the
    target scale ``y_scale``): predictive means cross zero, so a pointwise
    relative error is dominated by near-zero denominators and misleading."""
    path = oracle_path(n)
    if not os.path.exists(path):
        return None
    st = dict(np.load(path))
    if not st["done"].all():
        return None
    plan = model.plan
    tidx, tmask = model._route(np.asarray(xt))
    lw, z64 = _np_update_weights(plan, st["mll"])
    mean64, var64 = _np_moment_match(
        plan, st["mu"], st["var"], lw, tidx, tmask, xt.shape[0]
    )
    rel = lambda a, b: float(
        np.max(np.abs(np.asarray(a, np.float64) - b)
               / np.maximum(1e-12, np.abs(b)))
    )
    abs_mean = float(np.max(np.abs(np.asarray(mean_tpu, np.float64) - mean64)))
    return {
        "max_abs_err_mean": abs_mean,
        "max_abs_err_mean_over_std_y": abs_mean / max(y_scale, 1e-12),
        "rms_err_mean": float(np.sqrt(np.mean(
            (np.asarray(mean_tpu, np.float64) - mean64) ** 2))),
        "max_rel_err_var": rel(var_tpu, var64),
        "max_rel_err_leaf_mll_full": rel(mll_tpu, st["mll"]),
        "rel_err_log_evidence": abs(float(z_tpu) - z64) / max(1.0, abs(z64)),
        "oracle_leaves": int(st["done"].sum()),
    }


def run_compare_shared(args, dtype):
    """Measure ``fit_shared`` (factor reuse: copy / Givens row-delete /
    delete-then-continue) against ``fit_batched`` (fresh factorization,
    one MXU batch) on THIS device, at the largest scale whose [L, Nmax²]
    factors fit in HBM. Records both wall-clocks + the derived fraction in
    ``BASELINE_GENERATED.json`` (key ``shared_vs_batched_n{N}``) — the data
    behind fit(method='auto')'s choice."""
    import jax
    import jax.numpy as jnp

    from deepstructuredmixtures_tpu import fit as fitlib

    x, y = make_data(args.n)
    model = build_model(x, y, dtype, args.m_min)
    layout, sched, batch = model.layout, model.schedule, model.batch
    L = model.num_leaves

    def timed(f):
        out = f(model.theta, batch)  # compile + warmup
        _ = float(out.mll[0])
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            out = f(model.theta, batch)
            _ = float(out.mll[0])  # d2h fence
            times.append(time.perf_counter() - t0)
        return min(times), out

    f_b = jax.jit(lambda th, b: fitlib.fit_batched(layout, th, b))
    f_s = jax.jit(lambda th, b: fitlib.fit_shared(layout, th, b, sched))
    dt_b, out_b = timed(f_b)
    dt_s, out_s = timed(f_s)
    err = float(
        np.max(np.abs(np.asarray(out_s.mll) - np.asarray(out_b.mll))
               / np.maximum(1.0, np.abs(np.asarray(out_b.mll))))
    )
    entry = {
        "n": args.n,
        "leaves": L,
        "nmax": int(model.plan.nmax),
        "derived_fraction": round(sched.num_derived / L, 4),
        "deletions_total": int(sched.del_ndel.sum() + sched.cont_del_ndel.sum()),
        "batched_s": round(dt_b, 4),
        "shared_s": round(dt_s, 4),
        "shared_over_batched": round(dt_s / dt_b, 3),
        "max_rel_mll_diff": err,
        "platform": jax.devices()[0].device_kind or jax.devices()[0].platform,
        "dtype": str(np.dtype(dtype)),
    }
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    plat = jax.devices()[0].platform
    cache[f"shared_vs_batched_n{args.n}_{plat}"] = entry
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    print(json.dumps(entry))


def run_anchor(args, dtype):
    """Fully-measured (every leaf, no sampling) CPU-f64 baseline at a
    feasible N, next to the stratified estimate on the same tree — bounds
    the stratified estimator's error (BASELINE.md)."""
    x, y = make_data(args.n)
    xt = np.linspace(-0.05, 1.05, args.test).reshape(-1, 1)
    model = build_model(x, y, dtype, args.m_min, depth=args.depth,
                        overlap=not args.no_overlap)
    plan = model.plan
    theta = np.asarray(model.theta, dtype=np.float64)
    tidx, tmask = model._route(xt)
    t_full = 0.0
    for l in range(plan.num_leaves):
        dt, _, _, _ = _cpu_leaf_work(x, y, xt, plan, theta, l, tidx, tmask)
        t_full += dt
    t_strat, n_sampled, _, _ = run_cpu_baseline(model, x, y, xt)
    entry = {
        "cpu_seconds_full_measured": t_full,
        "cpu_seconds_stratified": t_strat,
        "stratified_over_full": t_strat / t_full,
        "leaves": plan.num_leaves,
        "sampled_leaves": n_sampled,
    }
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    cache[f"anchor_n{args.n}_t{args.test}_m{args.m_min}"] = entry
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    print(json.dumps(entry))


def run_config5(args, dtype):
    """BASELINE config 5 at scale: full DSMGP V=3 K=4 with the ADDITIVE
    ArdSE kernel on multi-D data, hyper warm-start from a subsample-trained
    model (README.md:58-71 workflow), streamed fit, one bucketed finetune
    iteration (per-leaf untied hypers, D-row weighting), and routed
    prediction — all on the chip. Spot-checks a few leaf mlls against the
    float64 NumPy oracle."""
    import optax

    import deepstructuredmixtures_tpu as dsm

    n, d = args.n, 4
    rng = np.random.default_rng(1)
    x = rng.uniform(0.0, 1.0, (n, d))
    y = (
        np.sin(x[:, 0] * 6.0) * np.cos(x[:, 1] * 4.0)
        + 0.5 * x[:, 2]
        - 0.3 * x[:, 3] ** 2
        + 0.1 * rng.standard_normal(n)
    )
    kern = lambda: dsm.ArdSE([0.0] * d, 0.0)  # noqa: E731

    t0 = time.perf_counter()
    model = dsm.build_dsmgp(
        x, y, V=3, K=4, M=args.m_min, kernel=kern(), log_noise=-1.0,
        seed=0, dtype=dtype, do_fit=False,
    )
    t_build = time.perf_counter() - t0

    # warm start: train tied hypers on a subsample model, inject
    sub = np.sort(rng.choice(n, min(4000, n), replace=False))
    msub = dsm.build_dsmgp(
        x[sub], y[sub], V=2, K=3, M=args.m_min, kernel=kern(),
        log_noise=-1.0, seed=1, dtype=dtype, do_fit=False,
    )
    t0 = time.perf_counter()
    dsm.train(msub, optax.adam(5e-2), iterations=15, lam=1e-9,
              randinit=False, progress=False)
    t_warm = time.perf_counter() - t0
    model.set_params(msub.get_params())

    t_fit = model.fit(store="light")
    mll_tpu = np.asarray(model.leaf_mlls())
    z = model.update()

    # float64 oracle spot-check on the smallest leaves (1-core CPU):
    # additive ArdSE (kernels.jl:39-49 semantics), full NumPy f64 chain
    sizes = np.array([o.size for o in model.plan.leaf_obs])
    theta64 = np.asarray(model.theta, dtype=np.float64)
    logl, logsigma, lognoise = theta64[:d], theta64[d], theta64[d + 1]
    worst = 0.0
    for l in np.argsort(sizes)[:3]:
        obs = model.plan.leaf_obs[int(l)]
        xl = x[obs]
        yl = y[obs] - model.plan.leaf_mean[int(l)]
        K = np.zeros((len(obs), len(obs)))
        for k in range(d):
            dk = (xl[:, k, None] - xl[None, :, k]) ** 2
            K += np.exp(-0.5 * dk * np.exp(-2.0 * logl[k]))
        K *= np.exp(2.0 * logsigma)
        K[np.diag_indices_from(K)] += np.exp(2.0 * lognoise) + 1e-8
        Lf = np.linalg.cholesky(K)
        import scipy.linalg as sla

        alpha = sla.cho_solve((Lf, True), yl)
        mll_l = -0.5 * (
            yl @ alpha + 2 * np.log(np.diag(Lf)).sum()
            + len(obs) * np.log(2 * np.pi)
        )
        worst = max(worst, abs(mll_tpu[l] - mll_l) / max(1.0, abs(mll_l)))

    sparse = {"auto": None, "on": True, "off": False}[args.finetune_sparse]
    t0 = time.perf_counter()
    hist = dsm.finetune(model, optax.adam(1e-2),
                        iterations=args.config5_finetune_iters,
                        lam=1e-9, bucketed=True, progress=False,
                        sparse=sparse)
    t_ft = time.perf_counter() - t0

    xt = rng.uniform(0.0, 1.0, (args.test, d))
    t0 = time.perf_counter()
    mean, var = model.predict(xt)
    mean = np.asarray(mean)
    t_pred = time.perf_counter() - t0
    ok = bool(
        np.all(np.isfinite(mean)) and np.all(np.asarray(var) > 0)
        and np.all(np.isfinite(hist))
    )
    print(json.dumps({
        "metric": f"config5_ardse_d{d}_n{n}",
        "value": round(t_fit, 4),
        "unit": "s_fit",
        "build_s": round(t_build, 2),
        "warmstart_s": round(t_warm, 2),
        "finetune_iter_s": round(t_ft, 2),
        "finetune_iters": int(len(hist)),
        "finetune_sparse": args.finetune_sparse,
        "predict_s": round(t_pred, 3),
        "log_evidence": round(float(z), 3),
        "max_rel_err_small_leaf_mll_vs_f64": float(worst),
        "finite": ok,
        "leaves": int(model.num_leaves),
        "max_leaf": int(sizes.max()),
        "dtype": str(np.dtype(dtype)),
    }))


def run_giant_mesh(args, dtype):
    """Scale-frontier mode: fit+update+predict through the PUBLIC model
    API with oversized leaves routed to the distributed blocked Cholesky
    on a single-device mesh (``model.fit(mesh=, giant_leaf_bytes=)``).

    Rationale, measured at N=1M/depth=4 (max leaf 33,303): the streamed
    XLA body holds ~3 [n, n] covariance buffers (gram temp + Kn + factor,
    ~13.3 GB at n=33k) — standalone that fits the 16 GB HBM, but with the
    model's resident bucket data it exhausts HBM. The blocked dist_chol
    factorization keeps the factor as an in-place (donated) loop carry —
    ~1 buffer — so the giant leaves fit; normal buckets stream as usual.
    The reference cannot represent this scale at all (one CPU, one
    process, hours per potrf).
    """
    import jax
    import jax.numpy as jnp

    from jax.sharding import Mesh

    x, y = make_data(args.n)
    xt = np.linspace(-0.05, 1.05, args.test).reshape(-1, 1)
    t0 = time.perf_counter()
    model = build_model(x, y, dtype, args.m_min, depth=args.depth,
                        overlap=not args.no_overlap)
    t_build = time.perf_counter() - t0
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))

    def once():
        t_fit = model.fit(mesh=mesh, giant_leaf_bytes=args.giant_mesh)
        z = model.update()
        t0 = time.perf_counter()
        mean, var = model.predict(xt)
        mean = np.asarray(mean)
        var = np.asarray(var)
        t_pred = time.perf_counter() - t0
        return t_fit, float(z), mean, var, t_pred

    t_fit_cold, z, mean, var, t_pred_cold = once()   # includes compiles
    t_fit, z2, mean2, var2, t_pred = once()          # warm
    assert z == z2
    mll_tpu = np.asarray(model.leaf_mlls())

    # spot-check the smallest + the giant leaves against f64 NumPy
    plan = model.plan
    tidx, tmask = model._route(xt)
    sizes = np.array([o.size for o in plan.leaf_obs])
    theta64 = np.asarray(model.theta, dtype=np.float64)
    picks = list(np.argsort(sizes)[:2]) + list(np.argsort(sizes)[-2:])
    worst = 0.0
    for l in picks:
        _, mll_l, _, _ = _cpu_leaf_work(x, y, xt, plan, theta64, int(l),
                                        tidx, tmask)
        worst = max(worst, abs(mll_tpu[l] - mll_l) / max(1.0, abs(mll_l)))

    flops = model_flops(plan, tidx, tmask)
    peak = peak_flops(jax.devices()[0])
    t_total = t_fit + t_pred
    cache_key = (f"n{args.n}_t{args.test}_m{args.m_min}_d{args.depth}"
                 "_giantmesh")
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if args.regen_baseline or cache_key not in cache:
        dt_cpu, n_sampled, _, _ = run_cpu_baseline(model, x, y, xt)
        cache[cache_key] = {
            "cpu_seconds": dt_cpu,
            "sampled_leaves": n_sampled,
            "platform": "numpy-f64-1core-stratified-standin",
        }
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    base = cache[cache_key]
    print(json.dumps({
        "metric": (f"dsmgp_v3k4_fit_update_predict_n{args.n}_t{args.test}"
                   f"_depth{args.depth}_giantmesh"),
        "value": round(t_total, 4),
        "unit": "s",
        "vs_baseline": round(base["cpu_seconds"] / t_total, 2),
        "mfu": round(flops / t_total / peak, 4) if peak else None,
        "model_tflops": round(flops / 1e12, 3),
        "fit_s": round(t_fit, 4),
        "predict_s": round(t_pred, 4),
        "fit_cold_s": round(t_fit_cold, 1),
        "predict_cold_s": round(t_pred_cold, 1),
        "build_s": round(t_build, 1),
        "leaves": int(model.num_leaves),
        "max_leaf": int(sizes.max()),
        "distributed_leaves": int(
            model.last_fit_diagnostics["distributed_leaves"]),
        "log_evidence": round(float(z), 3),
        "max_rel_err_spot_leaf_mll_vs_f64": float(worst),
    }))


def run_train(args, dtype):
    """Tied FULL-DATA training at --n: K steady-state iterations of the
    bucketed exact value-and-grad (``train.make_value_and_grad_bucketed``,
    the same per-bucket chunked+rematerialized VJP the train(mesh=) twin
    shards) + optax adam ascent on the chip. Records cold (compile-
    inclusive) and warm s/iteration and the mll-ascent curve — the last
    reference workflow (``optimisers.jl:4-87``) without a headline-scale
    measured number (round-3 VERDICT weak #5)."""
    import jax
    import optax

    from deepstructuredmixtures_tpu.train import make_value_and_grad_bucketed

    x, y = make_data(args.n)
    t0 = time.perf_counter()
    model = build_model(x, y, dtype, args.m_min, depth=args.depth,
                        overlap=not args.no_overlap)
    t_build = time.perf_counter() - t0
    vg = make_value_and_grad_bucketed(
        model.layout, model.plan, model.bucket_batches,
        model.bucket_spec.leaf_ids,
    )
    opt = optax.adam(1e-2)
    theta = model.theta
    opt_state = opt.init(theta)

    @jax.jit
    def apply(theta, opt_state, g):
        updates, opt_state = opt.update(-g, opt_state, theta)  # ascent
        return optax.apply_updates(theta, updates), opt_state

    hist, times = [], []
    for it in range(args.train):
        t0 = time.perf_counter()
        val, g = vg(theta)
        theta, opt_state = apply(theta, opt_state, g)
        val = float(val)  # d2h fence: forces the whole iteration
        times.append(time.perf_counter() - t0)
        hist.append(val)
        print(f"train iter {it}: mll={val:.3f} ({times[-1]:.1f}s)",
              file=sys.stderr)
    if not np.all(np.isfinite(hist)):
        raise SystemExit(f"non-finite training mll: {hist}")
    warm = times[1:] or times
    entry = {
        "metric": f"train_tied_fulldata_n{args.n}"
                  + (f"_depth{args.depth}" if args.depth != 2 else ""),
        "value": round(float(np.median(warm)), 3),
        "unit": "s_per_iteration",
        "iterations": args.train,
        "cold_iter_s": round(times[0], 1),
        "build_s": round(t_build, 1),
        "mll_curve": [round(v, 3) for v in hist],
        "ascending": bool(hist[-1] > hist[0]) if len(hist) > 1 else None,
        "leaves": int(model.num_leaves),
        "buckets": len(model.bucket_batches),
        "dtype": str(np.dtype(dtype)),
    }
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    cache[f"train_n{args.n}_d{args.depth}_m{args.m_min}"] = entry
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    print(json.dumps(entry))


def _np_gram_general(kind, logl, logsigma, x1, x2):
    """f64 NumPy mirror of ``kernels.gram`` for the mixture oracle."""
    if kind == "iso_se":
        d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
        return np.exp(2 * logsigma) * np.exp(-0.5 * d2 * np.exp(-2 * logl[0]))
    if kind == "ard_se":
        acc = 0.0
        for k in range(x1.shape[1]):
            dk = (x1[:, k, None] - x2[None, :, k]) ** 2
            acc = acc + np.exp(-0.5 * dk * np.exp(-2.0 * logl[k]))
        return np.exp(2 * logsigma) * acc
    if kind == "iso_linear":
        return (x1 @ x2.T) * np.exp(-2 * logl[0])
    if kind == "ard_linear":
        return (x1 * np.exp(-2 * logl)) @ x2.T
    raise ValueError(kind)


def _cpu_leaf_mll_general(x, y, plan, layout, theta64, l):
    """f64 leaf mll for ANY kernel kind / mixture kernelid (the oracle
    behind the --kernels mix gate)."""
    from deepstructuredmixtures_tpu.hyper import unpack

    kid = int(plan.leaf_kernelid[l])
    kind = layout.kinds[kid]
    logl, logsigma, lognoise = unpack(layout, theta64, kid)
    obs = plan.leaf_obs[l]
    xl = x[obs]
    yl = y[obs] - plan.leaf_mean[l]
    K = _np_gram_general(kind, np.atleast_1d(logl), float(logsigma), xl, xl)
    K[np.diag_indices_from(K)] += np.exp(2 * float(lognoise)) + 1e-8
    Lf = np.linalg.cholesky(K)
    import scipy.linalg as sla

    alpha = sla.cho_solve((Lf, True), yl)
    return -0.5 * (
        yl @ alpha + 2 * np.log(np.diag(Lf)).sum()
        + len(obs) * np.log(2 * np.pi)
    )


def run_mixture(args, dtype):
    """Kernel-mixture mode at scale (round-3 VERDICT weak #6): a DSMGP
    whose leaves are kernel-mixture sums over [IsoSE, ArdSE, IsoLinear]
    (≙ Vector-of-kernels leaves, ``treeStructure.jl:245-307``) at --n on
    the chip — streamed fit + update + routed predict, with sampled leaf
    mlls of EVERY kernel kind gated against the f64 NumPy oracle (the
    per-kernel theta slicing and ``leaf_gram`` kernelid switching had no
    measured scale point before this mode)."""
    import jax

    import deepstructuredmixtures_tpu as dsm

    x, y = make_data(args.n)
    xt = np.linspace(-0.05, 1.05, args.test).reshape(-1, 1)
    kernels = [dsm.IsoSE(0.0, 0.0), dsm.ArdSE([0.0], 0.0),
               dsm.IsoLinear(0.0)]
    t0 = time.perf_counter()
    model = dsm.build_dsmgp(
        x, y, V=3, K=4, M=args.m_min, kernel=kernels, log_noise=-1.0,
        seed=0, dtype=dtype, do_fit=False, depth=args.depth,
        overlap=not args.no_overlap,
        # --train adds a finetune iteration: route its D-row weighting
        # through the sparse MixtureOverlap (its on-chip exercise)
        overlap_format="sparse" if args.train else "auto",
    )
    t_build = time.perf_counter() - t0

    def once():
        t_fit = model.fit(store="light")
        z = model.update()
        t0 = time.perf_counter()
        mean, var = model.predict(xt)
        np.asarray(mean), np.asarray(var)
        return t_fit, float(z), time.perf_counter() - t0

    t_fit_c, z, t_pred_c = once()  # cold (compiles)
    t_fit, z2, t_pred = once()
    assert z == z2
    mll_tpu = np.asarray(model.leaf_mlls())

    # oracle gate: a few leaves of EVERY kernel kind, smallest-first (the
    # f64 chol runs on the 1-core host), plus the largest affordable leaf
    plan, layout = model.plan, model.layout
    theta64 = np.asarray(model.theta, dtype=np.float64)
    sizes = np.array([o.size for o in plan.leaf_obs])
    kid = plan.leaf_kernelid
    picks = []
    for k in range(len(layout.kinds)):
        lk = np.nonzero(kid == k)[0]
        order = lk[np.argsort(sizes[lk])]
        picks += list(order[:3])  # smallest 3 of this kind
        afford = order[sizes[order] <= 6000]
        if afford.size:
            picks.append(int(afford[-1]))  # largest affordable
    worst = {}
    for l in dict.fromkeys(int(p) for p in picks):
        mll_l = _cpu_leaf_mll_general(x, y, plan, layout, theta64, l)
        k = layout.kinds[int(kid[l])]
        err = abs(mll_tpu[l] - mll_l) / max(1.0, abs(mll_l))
        worst[k] = max(worst.get(k, 0.0), float(err))

    entry = {
        "metric": f"mixture_iso_ard_lin_n{args.n}_t{args.test}",
        "value": round(t_fit + t_pred, 4),
        "unit": "s",
        "fit_s": round(t_fit, 4),
        "predict_s": round(t_pred, 4),
        "fit_cold_s": round(t_fit_c, 1),
        "predict_cold_s": round(t_pred_c, 1),
        "build_s": round(t_build, 1),
        "leaves": int(model.num_leaves),
        "leaves_per_kind": {k: int((kid == i).sum())
                            for i, k in enumerate(layout.kinds)},
        "log_evidence": round(float(z), 3),
        "max_rel_err_leaf_mll_vs_f64_per_kind": worst,
        "sampled_leaves": len(set(int(p) for p in picks)),
        "dtype": str(np.dtype(dtype)),
    }

    if args.train:
        # mixture TRAIN + FINETUNE scale point (round-4 VERDICT weak #5:
        # the N=20k mixture record was fit+predict only). One bucketed
        # tied-train iteration (per-kernel theta slices move jointly) and
        # one full-candidate finetune iteration through the sparse
        # MixtureOverlap D (its first on-chip exercise).
        import optax

        from deepstructuredmixtures_tpu.plan import MixtureOverlap
        from deepstructuredmixtures_tpu.train import (
            make_value_and_grad_bucketed,
        )

        assert isinstance(model.plan.overlap, MixtureOverlap) or \
            model.num_leaves <= 2048, "expected sparse mixture overlap"
        vg = make_value_and_grad_bucketed(
            model.layout, model.plan, model.bucket_batches,
            model.bucket_spec.leaf_ids,
        )
        opt = optax.adam(1e-2)
        theta = model.theta
        opt_state = opt.init(theta)

        def titer(theta, opt_state):
            v, g = vg(theta)
            updates, opt_state = opt.update(-g, opt_state, theta)
            return float(v), optax.apply_updates(theta, updates), opt_state

        t0 = time.perf_counter()
        v0, theta, opt_state = titer(theta, opt_state)
        t_train_cold = time.perf_counter() - t0
        curve = [v0]
        ts = []
        for _ in range(max(args.train - 1, 2)):
            t0 = time.perf_counter()
            v, theta, opt_state = titer(theta, opt_state)
            ts.append(time.perf_counter() - t0)
            curve.append(v)
        entry["train_iter_warm_s"] = round(float(np.median(ts)), 3)
        entry["train_iter_cold_s"] = round(t_train_cold, 1)
        entry["train_mll_curve"] = [round(c, 2) for c in curve]
        assert curve[-1] > curve[0], "mll must ascend"

        import deepstructuredmixtures_tpu as dsm2

        t0 = time.perf_counter()
        hist = dsm2.finetune(model, optax.adam(1e-2), iterations=1,
                             lam=1e-9, progress=False)
        t_ft_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        hist = dsm2.finetune(model, optax.adam(1e-2), iterations=1,
                             lam=1e-9, progress=False)
        t_ft_warm = time.perf_counter() - t0
        assert np.all(np.isfinite(np.asarray(hist)))
        entry["finetune_iter_cold_s"] = round(t_ft_cold, 1)
        entry["finetune_iter_warm_s"] = round(t_ft_warm, 1)
        entry["finetune_candidates"] = int(model.num_leaves)

    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    cache[entry["metric"]] = {k: v for k, v in entry.items()
                              if k != "metric"}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    print(json.dumps(entry))


def _cpu_leaf_moments_f64(x, y, plan, theta64, l, xt):
    """f64 leaf predictive moments at ALL test points (no routing — the
    PoE family predicts every leaf everywhere, ``common.jl:198-273``)."""
    import scipy.linalg as sla

    logl, logsigma, lognoise = theta64[0], theta64[1], theta64[2]
    obs = plan.leaf_obs[l]
    xl = x[obs]
    yl = y[obs] - plan.leaf_mean[l]
    K = _np_gram_general("iso_se", np.atleast_1d(logl), float(logsigma),
                         xl, xl)
    noise = np.exp(2 * float(lognoise))
    K[np.diag_indices_from(K)] += noise + 1e-8
    Lf = np.linalg.cholesky(K)
    alpha = sla.cho_solve((Lf, True), yl)
    mll = -0.5 * (yl @ alpha + 2 * np.log(np.diag(Lf)).sum()
                  + len(obs) * np.log(2 * np.pi))
    Knt = _np_gram_general("iso_se", np.atleast_1d(logl), float(logsigma),
                           xl, xt)
    mu = plan.leaf_mean[l] + Knt.T @ alpha
    V = sla.solve_triangular(Lf, Knt, lower=True)
    ktt = np.exp(2 * float(logsigma)) * np.ones(xt.shape[0])
    var = ktt - (V * V).sum(0) + noise
    return mll, mu, var


def run_poe(args, dtype):
    """PoE / gPoE / rBCM at scale (round-4 VERDICT weak #6): the three
    non-Bayesian fusion baselines (``common.jl:198-273``) had no measured
    scale point. For each model: build (split-only tree, ``buildPoE`` /
    ``buildBCM`` semantics), timed warm ``fit_naive`` + fusion predict on
    the chip, sampled-leaf mll/moment gates vs the f64 oracle, and a
    fusion cross-check — the f64 host replica of the precision-weighted
    fusion applied to the TPU's OWN per-leaf moments must reproduce the
    TPU's fused mean/variance (gates the fusion wiring independent of
    leaf numerics; the fusion itself runs in f64 by default on f32
    moments, ``infer.combine_in_f64``)."""
    import deepstructuredmixtures_tpu as dsm
    from deepstructuredmixtures_tpu import infer as inferlib  # noqa: F401

    x, y = make_data(args.n)
    xt = np.linspace(-0.05, 1.05, args.test).reshape(-1, 1)
    out = {"metric": f"poe_family_n{args.n}_t{args.test}", "unit": "s",
           "dtype": str(np.dtype(dtype))}
    total = 0.0

    for name, build in (
        ("poe", lambda: dsm.build_poe(
            x, y, K=4, M=args.m_min, kernel=dsm.IsoSE(0.0, 0.0),
            log_noise=-1.0, seed=0, dtype=dtype, do_fit=False,
            depth=args.depth)),
        ("gpoe", lambda: dsm.build_poe(
            x, y, K=4, generalized=True, M=args.m_min,
            kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0, seed=0,
            dtype=dtype, do_fit=False, depth=args.depth)),
        ("rbcm", lambda: dsm.build_bcm(
            x, y, K=4, M=args.m_min, kernel=dsm.IsoSE(0.0, 0.0),
            log_noise=-1.0, seed=0, dtype=dtype, do_fit=False,
            depth=args.depth)),
    ):
        t0 = time.perf_counter()
        model = build()
        t_build = time.perf_counter() - t0

        def once(model=model):
            t_fit = model.fit_naive()
            t0 = time.perf_counter()
            mean, var = model.predict(xt)
            mean, var = np.asarray(mean), np.asarray(var)
            return t_fit, time.perf_counter() - t0, mean, var

        t_fit_c, t_pred_c, _, _ = once()  # cold (compiles)
        t_fit, t_pred, mean, var = once()
        assert np.all(np.isfinite(mean)) and np.all(var > 0)
        mll_tpu = np.asarray(model.leaf_mlls())
        mu_l, var_l = (np.asarray(a, np.float64)
                       for a in model._leaf_predict_all(
                           model._as_test(xt)))

        # (a) sampled-leaf oracle gates (f64 on the 1-core host)
        plan = model.plan
        theta64 = np.asarray(model.theta, dtype=np.float64)
        sizes = np.array([o.size for o in plan.leaf_obs])
        order = np.argsort(sizes)
        picks = list(order[:2]) + [int(order[len(order) // 2]),
                                   int(order[-1])]
        e_mll = e_mean = e_var = 0.0
        for l in dict.fromkeys(int(p) for p in picks):
            mll_o, mu_o, var_o = _cpu_leaf_moments_f64(
                x, y, plan, theta64, l, xt)
            e_mll = max(e_mll, abs(mll_tpu[l] - mll_o) / max(1.0, abs(mll_o)))
            e_mean = max(e_mean, float(np.max(np.abs(mu_l[l] - mu_o))))
            e_var = max(e_var, float(np.max(
                np.abs(var_l[l] - var_o) / np.abs(var_o))))

        # (b) fusion cross-check: f64 host replica on the TPU's own leaf
        # moments
        t_leaf = 1.0 / var_l
        if name == "poe":
            tsum = t_leaf.sum(0)
            mean64 = (t_leaf * mu_l).sum(0) / tsum
            var64 = 1.0 / tsum
        else:
            gid = np.asarray(plan.root_child_id)
            n_g = int(gid.max()) + 1
            tw = np.zeros((n_g, xt.shape[0]))
            mw = np.zeros((n_g, xt.shape[0]))
            np.add.at(tw, gid, t_leaf)
            np.add.at(mw, gid, t_leaf * mu_l)
            mu_c, t_c = mw / tw, tw
            if name == "gpoe":
                beta = 1.0 / n_g
                tsum = (beta * t_c).sum(0)
                mean64 = (beta * t_c * mu_c).sum(0) / tsum
                var64 = 1.0 / tsum
            else:
                from deepstructuredmixtures_tpu.hyper import (
                    noise_from, unpack)

                kid0 = int(plan.leaf_kernelid[0])
                logl, logsigma, lognoise = unpack(
                    model.layout, model.theta, kid0)
                prior = (np.exp(2 * float(logsigma)) * np.ones(xt.shape[0])
                         + float(noise_from(lognoise)))
                s_c = 1.0 / t_c
                beta = 0.5 * (np.log(prior)[None] - np.log(s_c))
                Cc = 1.0 / prior + (beta * t_c - beta / prior[None]).sum(0)
                mean64 = (mu_c * beta * t_c).sum(0) / Cc
                var64 = 1.0 / Cc
        c_mean = float(np.max(np.abs(np.asarray(mean, np.float64) - mean64)))
        c_var = float(np.max(np.abs(np.asarray(var, np.float64) - var64)
                             / np.abs(var64)))

        total += t_fit + t_pred
        out[name] = {
            "fit_naive_s": round(t_fit, 4),
            "predict_s": round(t_pred, 4),
            "cold_s": round(t_fit_c + t_pred_c, 1),
            "build_s": round(t_build, 1),
            "leaves": int(model.num_leaves),
            "max_rel_err_leaf_mll": float(e_mll),
            "max_abs_err_leaf_mean": float(e_mean),
            "max_rel_err_leaf_var": float(e_var),
            "fusion_max_abs_err_mean": c_mean,
            "fusion_max_rel_err_var": c_var,
            "sampled_leaves": len(set(int(p) for p in picks)),
        }

    out["value"] = round(total, 4)
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    cache[out["metric"]] = {k: v for k, v in out.items() if k != "metric"}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    print(json.dumps(out))


def run_serve_bench(args, dtype):
    """Serving mode: warm repeated FULL mean+variance prediction at --n,
    streamed (light store — every request re-pays the O(Σn³) stream)
    versus the budgeted hybrid per-bucket factor cache
    (``fit(store='hybrid')`` — cached buckets solve O(n²t) against their
    persisted factors). Also p50/p99 of small (64-point) requests through
    ``serve.Predictor`` on the hybrid model. Round-3 VERDICT missing #2 /
    weak #2: the 1.57 s/request wall at N=100k."""
    import jax

    from deepstructuredmixtures_tpu.serve import Predictor

    x, y = make_data(args.n)
    xt = np.linspace(-0.05, 1.05, args.test).reshape(-1, 1)
    model = build_model(x, y, dtype, args.m_min, depth=args.depth,
                        overlap=not args.no_overlap)
    R = args.serve_bench

    def timed_predict(r):
        ts = []
        for _ in range(r):
            t0 = time.perf_counter()
            mean, var = model.predict(xt)
            np.asarray(mean), np.asarray(var)  # d2h fence
            ts.append(time.perf_counter() - t0)
        return ts

    model.fit(store="light")
    model.predict(xt)  # compile + d2h warmup
    t_streamed = timed_predict(R)

    t_hfit = model.fit(store="hybrid", factor_budget=args.factor_budget)
    diag = dict(model.last_fit_diagnostics)
    # warm refit: the recurring cost of re-fitting into the factor cache
    # (e.g. after a hyper update in production) once the programs are
    # compiled — reported separately from the compile-inclusive first fit
    # (round-4 VERDICT weak #7: a deployer could not tell recurring from
    # one-time cost)
    t_hfit_warm = model.fit(store="hybrid", factor_budget=args.factor_budget)
    model.predict(xt)  # compile + d2h warmup
    t_hybrid = timed_predict(R)

    # parity of the two paths on this very model (beyond the unit tests)
    model.fit(store="light")
    m_s, v_s = model.predict(xt)
    model.fit(store="hybrid", factor_budget=args.factor_budget)
    m_h, v_h = model.predict(xt)
    par_mean = float(np.max(np.abs(np.asarray(m_s) - np.asarray(m_h))))
    par_var = float(np.max(np.abs(np.asarray(v_s) - np.asarray(v_h))
                           / np.maximum(1e-12, np.abs(np.asarray(v_s)))))

    # small-request latency through the Predictor (hybrid model, already
    # fitted — store='light' leaves it untouched)
    p = Predictor(model, warm_sizes=(64,), warm=True, store="light")
    rng = np.random.default_rng(1)
    lat = []
    for _ in range(max(R, 20)):
        xq = rng.uniform(-0.05, 1.05, (64, 1))
        _, _, dt = p.predict(xq)
        lat.append(dt)
    entry = {
        "metric": f"serve_full_predict_n{args.n}_t{args.test}",
        "value": round(float(np.median(t_hybrid)), 4),
        "unit": "s_per_warm_request",
        "streamed_s": round(float(np.median(t_streamed)), 4),
        "hybrid_over_streamed": round(
            float(np.median(t_hybrid)) / float(np.median(t_streamed)), 3),
        "hybrid_fit_s": round(t_hfit, 3),
        "hybrid_refit_warm_s": round(t_hfit_warm, 3),
        "cached_buckets": diag.get("cached_buckets"),
        "cached_gib": round(diag.get("cached_bytes", 0) / (1 << 30), 2),
        "factor_budget_gib": round(args.factor_budget / (1 << 30), 2),
        "parity_mean_abs": par_mean,
        "parity_var_rel": par_var,
        "predictor_64pt_p50_s": round(float(np.percentile(lat, 50)), 4),
        "predictor_64pt_p99_s": round(float(np.percentile(lat, 99)), 4),
        "requests": R,
        "dtype": str(np.dtype(dtype)),
    }

    # Concurrent throughput: C clients issuing 64-point full predicts.
    # Locked = requests serialize behind the predictor lock, each paying
    # the request-independent O(Σn³) stream of the uncached buckets;
    # batched = MicroBatcher coalesces the concurrent arrivals into one
    # routed predict (exact — per-point predictions are independent).
    C = args.serve_concurrency
    if C > 1:
        import threading as _th

        from deepstructuredmixtures_tpu.serve import MicroBatcher

        # warm the classes coalescing can produce (full batch, half
        # batch, single) so a first-encounter pad-class compile never
        # lands inside the timed window; request count is a multiple of
        # C so full batches dominate. The batched section runs twice and
        # reports the SECOND pass (steady state) — stragglers in pass 1
        # may still form an unwarmed partial class.
        warm = tuple(sorted({64, 64 * max(C // 2, 1), 64 * C}))
        pc = Predictor(model, warm_sizes=warm, warm=True, store="light")
        total = ((max(R, 2 * C) + C - 1) // C) * C
        reqs = [rng.uniform(-0.05, 1.05, (64, 1)) for _ in range(total)]

        def run_clients(fn):
            barrier = _th.Barrier(C + 1)

            def client(tid):
                barrier.wait()
                for k in range(tid, total, C):
                    fn(reqs[k])

            ths = [_th.Thread(target=client, args=(i,)) for i in range(C)]
            for t in ths:
                t.start()
            barrier.wait()
            t0 = time.perf_counter()
            for t in ths:
                t.join()
            return time.perf_counter() - t0

        run_clients(lambda xq: pc.predict(xq))  # steady-state warmup
        wall_lock = run_clients(lambda xq: pc.predict(xq))
        mb = MicroBatcher(pc, max_batch_points=64 * C, max_wait_ms=25.0)
        run_clients(lambda xq: mb.predict(xq))  # pass 1: classes settle
        mb.stats.update(requests=0, batches=0, batched_points=0)
        wall_mb = run_clients(lambda xq: mb.predict(xq))
        stats = dict(mb.stats)
        mb.close()
        entry.update({
            f"concurrent_c{C}_req_s_locked": round(total / wall_lock, 3),
            f"concurrent_c{C}_req_s_batched": round(total / wall_mb, 3),
            f"concurrent_c{C}_batched_speedup": round(wall_lock / wall_mb, 2),
            f"concurrent_c{C}_batches_for_requests": [
                stats["batches"], stats["requests"]],
        })
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    # non-default budgets record under their own key (the --factor-budget
    # sweep must not overwrite the production 8 GiB record)
    key = f"serve_n{args.n}_t{args.test}"
    if args.factor_budget != (8 << 30):
        key += f"_b{args.factor_budget >> 30}gib"
    # merge: successive runs (different --serve-concurrency) accumulate
    cache[key] = {**cache.get(key, {}), **entry}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    print(json.dumps(entry))


def _load_check_mlls(args):
    """Load and validate a ``--check-mlls`` seed npz BEFORE the long run:
    a wrong seed file must fail in milliseconds at startup, not after the
    full TPU benchmark (and possibly a multi-hour CPU baseline) completed.
    The leaf-count check against the built model happens separately in
    ``main`` (the tree does not exist yet here)."""
    with np.load(args.check_mlls) as f:
        leaves = np.asarray(f["leaves"])
        mlls_f64 = np.asarray(f["mlls"])
        stamp = {k: int(f[k]) for k in ("n", "depth", "m") if k in f}
    if leaves.size == 0 or leaves.shape != mlls_f64.shape:
        raise SystemExit(
            f"--check-mlls: npz has {leaves.size} sampled leaves and "
            f"{mlls_f64.size} mlls — malformed/truncated seed file"
        )
    # Refuse a mismatched seed file: indexing another tree's leaf ids
    # would either IndexError at the end of a long run or — worse —
    # silently persist a meaningless error figure into the cache.
    want = {"n": args.n, "depth": args.depth, "m": args.m_min}
    bad = {k: (v, want[k]) for k, v in stamp.items() if v != want[k]}
    if bad:
        raise SystemExit(
            f"--check-mlls: npz stamped {stamp} does not match this "
            f"run {want} — wrong seed file"
        )
    if int(leaves.min()) < 0:
        raise SystemExit("--check-mlls: npz contains negative leaf ids")
    # optional predictive-moment arrays (round-4 seed format): sampled
    # leaves' routed f64 means/variances + routed counts
    moments = None
    with np.load(args.check_mlls) as f:
        if "mu" in f:
            mu, var, tcnt = (np.asarray(f["mu"]), np.asarray(f["var"]),
                             np.asarray(f["tcount"]))
            if mu.shape[0] != leaves.size or var.shape != mu.shape or \
                    tcnt.shape != leaves.shape:
                raise SystemExit(
                    "--check-mlls: predictive-moment arrays do not match "
                    "the sampled leaf list — malformed seed file"
                )
            moments = (mu, var, tcnt)
    return leaves, mlls_f64, moments


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--test", type=int, default=2000)
    ap.add_argument("--quick", action="store_true",
                    help="small sanity run (N=2000)")
    ap.add_argument("--regen-baseline", action="store_true")
    ap.add_argument("--m-min", type=int, default=30)
    ap.add_argument("--giant-mesh", type=int, default=0, metavar="BYTES",
                    help="scale-frontier mode: route leaves whose [n, n] "
                         "covariance exceeds BYTES through the blocked "
                         "distributed Cholesky on a single-device mesh "
                         "(model.fit(mesh=, giant_leaf_bytes=)); times the "
                         "public-API fit+update+predict instead of the "
                         "fused program")
    ap.add_argument("--split-buckets", action="store_true",
                    help="compile one program per size bucket instead of "
                         "the monolithic fused module (required when the "
                         "module exceeds the remote compile helper's "
                         "memory, e.g. --n 1000000; implied by --refine)")
    ap.add_argument("--no-overlap", action="store_true",
                    help="skip the O(L^2 N) overlap/schedule host analysis "
                         "(shared-fit semantics and finetune unavailable); "
                         "use for very-large-L scale runs")
    ap.add_argument("--depth", type=int, default=2,
                    help="max sum depth of the benchmark tree (default 2 = "
                         "the 144-leaf headline tree; deeper trees keep leaf "
                         "sizes bounded at larger N, e.g. --n 1000000 "
                         "--depth 3)")
    ap.add_argument("--anchor", action="store_true",
                    help="fully-measured CPU baseline at --n (every leaf "
                         "timed); bounds the stratified estimator")
    ap.add_argument("--oracle-chunk", type=int, nargs=2, metavar=("START", "COUNT"),
                    help="build the full f64 oracle for leaves "
                         "[START, START+COUNT) and exit (resumable)")
    ap.add_argument("--compare-shared", action="store_true",
                    help="time fit_shared vs fit_batched at --n on this "
                         "device (factors must fit in memory)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — must be set "
                         "before first backend use")
    ap.add_argument("--refine", type=int, default=0, metavar="K",
                    help="K mixed-precision refinement steps on the "
                         "streamed solves (true-K f64 residuals, "
                         "ops/refine.py): quad term + predictive mean to "
                         "~1e-6..1e-9 of the f64 oracle at near-f32 "
                         "speed; implies x64 mode (f32 model dtype)")
    ap.add_argument("--train", type=int, default=0, metavar="K",
                    help="tied full-data training mode: K iterations of "
                         "the bucketed exact value-and-grad + adam ascent "
                         "at --n; records cold/warm s/iteration and the "
                         "mll curve (BASELINE_GENERATED.json)")
    ap.add_argument("--serve-bench", type=int, default=0, metavar="R",
                    help="serving mode: R warm full mean+variance requests "
                         "at --n, streamed vs hybrid factor cache, plus "
                         "Predictor p50/p99 on 64-point requests")
    ap.add_argument("--factor-budget", type=int, default=8 << 30,
                    metavar="BYTES",
                    help="hybrid factor-cache budget for --serve-bench")
    ap.add_argument("--serve-concurrency", type=int, default=4,
                    help="concurrent clients for the --serve-bench "
                         "micro-batching throughput section (1 disables)")
    ap.add_argument("--poe-bench", action="store_true",
                    help="PoE/gPoE/rBCM mode at --n: timed fit_naive + "
                         "fusion predict per model class, sampled-leaf "
                         "mll/moment gates vs the f64 oracle and a host "
                         "f64 fusion cross-check "
                         "(BASELINE_GENERATED.json: poe_family_*)")
    ap.add_argument("--mixture", action="store_true",
                    help="kernel-mixture mode: [IsoSE, ArdSE, IsoLinear] "
                         "leaves at --n, sampled per-kind leaf mlls gated "
                         "vs the f64 oracle")
    ap.add_argument("--config5", action="store_true",
                    help="BASELINE config 5 at --n: ArdSE D=4, warm-start, "
                         "streamed fit, bucketed finetune, routed predict")
    ap.add_argument("--config5-finetune-iters", type=int, default=1)
    ap.add_argument("--finetune-sparse", default="auto",
                    choices=["auto", "on", "off"],
                    help="config5 finetune backward: sparse pair-list vs "
                         "dense all-pairs VJP (auto: sparse below 25%% "
                         "overlap density; the config5 tree is 34.6%%)")
    ap.add_argument("--dtype", default=None, choices=["f32", "f64"],
                    help="override the compute dtype (f64 on TPU is the "
                         "opt-in accuracy mode, ~42x slower — the second "
                         "point of the speed-accuracy contract)")
    ap.add_argument("--check-mlls", default=None, metavar="NPZ",
                    help="npz with arrays (leaves, mlls) of f64 CPU leaf "
                         "mlls (saved by the baseline seeding pass) — "
                         "compare the TPU run's leaf mlls against them and "
                         "report max_rel_err_leaf_mll even when the CPU "
                         "baseline itself is already cached")
    args = ap.parse_args()

    if args.quick:
        args.n, args.test = 2000, 200

    check_seed = None
    if args.check_mlls:
        # The gate only runs on the standard benchmark flow; refuse modes
        # that return before it — a "gated" run must never exit 0 with the
        # gate silently skipped.
        incompatible = [name for name, on in (
            ("--anchor", args.anchor),
            ("--compare-shared", args.compare_shared),
            ("--config5", args.config5),
            ("--giant-mesh", bool(args.giant_mesh)),
            ("--oracle-chunk", args.oracle_chunk is not None),
            ("--train", bool(args.train)),
            ("--serve-bench", bool(args.serve_bench)),
            ("--mixture", args.mixture),
            ("--poe-bench", args.poe_bench),
        ) if on]
        if incompatible:
            raise SystemExit(
                f"--check-mlls does not run under {' '.join(incompatible)} "
                "(those modes exit before the leaf-mll gate) — drop one"
            )
        check_seed = _load_check_mlls(args)  # fail fast on a wrong file

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "f64" or args.refine:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    if args.dtype is not None:
        dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    else:
        dtype = jnp.float32 if jax.devices()[0].platform != "cpu" else jnp.float64

    if args.anchor:
        run_anchor(args, dtype)
        return
    if args.compare_shared:
        run_compare_shared(args, dtype)
        return
    if args.config5:
        run_config5(args, dtype)
        return
    if args.mixture:  # before --train: mixture mode consumes args.train
        run_mixture(args, dtype)
        return
    if args.train:
        run_train(args, dtype)
        return
    if args.poe_bench:
        run_poe(args, dtype)
        return
    if args.serve_bench:
        run_serve_bench(args, dtype)
        return
    if args.giant_mesh:
        run_giant_mesh(args, dtype)
        return

    x, y = make_data(args.n)
    xt = np.linspace(-0.05, 1.05, args.test).reshape(-1, 1)
    model = build_model(x, y, dtype, args.m_min, depth=args.depth,
                        overlap=not args.no_overlap)
    if check_seed is not None and int(check_seed[0].max()) >= model.num_leaves:
        raise SystemExit(
            f"--check-mlls: npz leaf ids up to {int(check_seed[0].max())} "
            f"exceed this model's {model.num_leaves} leaves — the npz was "
            "seeded for a different tree"
        )

    if args.oracle_chunk is not None:
        start, count = args.oracle_chunk
        run_oracle_chunk(model, x, y, xt, start, count, args.n)
        return

    # Which size buckets route their gram+Cholesky through the fused
    # Pallas kernel (ops/pallas_chol.supported) vs native XLA — in-situ
    # record for the headline run (VERDICT r2 item 4).
    from deepstructuredmixtures_tpu.ops import pallas_chol as _pc

    fused = [
        (b.nmax, b.num_leaves)
        for b in model.bucket_batches
        if _pc.supported(b.nmax, b.x.dtype, model.layout.kinds)
    ]
    print(
        f"fused-chol buckets (nmax, leaves): {fused or 'none'} "
        f"of {len(model.bucket_batches)} buckets",
        file=sys.stderr,
    )

    dt_tpu, z_tpu, mean_tpu, var_tpu, mll_tpu, mu_leaf, var_leaf = run_tpu(
        model, xt, refine_steps=args.refine,
        split=True if args.split_buckets else None,
    )

    # -- MFU ---------------------------------------------------------------
    tidx, tmask = model._route(xt)
    flops = model_flops(model.plan, tidx, tmask)
    peak = peak_flops(jax.devices()[0])
    mfu = round(flops / dt_tpu / peak, 4) if peak else None

    # -- baseline (cached) -------------------------------------------------
    cache_key = f"n{args.n}_t{args.test}_m{args.m_min}"
    if args.depth != 2:
        cache_key += f"_d{args.depth}"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if args.regen_baseline or cache_key not in cache:
        dt_cpu, n_sampled, mlls_cpu, _ = run_cpu_baseline(model, x, y, xt)
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

    # -- end-to-end f64 accuracy (when the full oracle store exists) --------
    errs = oracle_errors(model, xt, args.n, z_tpu, mean_tpu, var_tpu, mll_tpu,
                         y_scale=float(np.std(y)))
    if errs is not None and (
        args.regen_baseline or "max_abs_err_mean" not in base
    ):
        base.update(errs)
        base["tpu_dtype"] = str(np.dtype(dtype))
        cache[cache_key] = base
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)

    result = {
        "metric": (
            f"dsmgp_v3k4_fit_update_predict_n{args.n}_t{args.test}_wallclock"
            + (f"_depth{args.depth}" if args.depth != 2 else "")
        ),
        "value": round(dt_tpu, 4),
        "unit": "s",
        "vs_baseline": round(base["cpu_seconds"] / dt_tpu, 2),
        "mfu": mfu,
        "model_tflops": round(flops / 1e12, 3),
    }
    if check_seed is not None:
        leaves, mlls_f64, moments = check_seed  # validated before the run
        err_mll = max(
            abs(float(mll_tpu[l]) - v) / max(1.0, abs(v))
            for l, v in zip(leaves, mlls_f64)
        )
        result["max_rel_err_leaf_mll"] = float(err_mll)
        base["max_rel_err_leaf_mll"] = float(err_mll)
        if moments is not None:
            # predictive gates at frontier scale (round-3 VERDICT weak #4):
            # (a) sampled leaves' routed mean/variance vs the seeded f64
            # oracle — the leaf predict path at this tree's depth/sizes
            mu_l = np.asarray(mu_leaf, np.float64)
            var_l = np.asarray(var_leaf, np.float64)
            mu_o, var_o, tcnt = moments
            e_mean = 0.0
            e_var = 0.0
            for i, l in enumerate(leaves):
                nt = int(tcnt[i])
                if nt == 0:
                    continue
                e_mean = max(e_mean, float(np.max(
                    np.abs(mu_l[l][:nt] - mu_o[i][:nt]))))
                e_var = max(e_var, float(np.max(
                    np.abs(var_l[l][:nt] - var_o[i][:nt])
                    / np.maximum(1e-12, np.abs(var_o[i][:nt])))))
            result["max_abs_err_leaf_mean"] = e_mean
            result["max_rel_err_leaf_var"] = e_var
            base["max_abs_err_leaf_mean"] = e_mean
            base["max_rel_err_leaf_var"] = e_var
            # (b) SPN combine cross-check: the f64 host replica of the
            # weight update + log-space moment matching on the TPU's OWN
            # per-leaf f32 moments must reproduce the TPU's combined
            # mean/variance — gates routing + moment matching wiring at
            # full (frontier) leaf count, independent of leaf numerics
            lw64, z64c = _np_update_weights(model.plan,
                                            np.asarray(mll_tpu, np.float64))
            mean64c, var64c = _np_moment_match(
                model.plan, mu_l, var_l, lw64, tidx, tmask, args.test
            )
            c_mean = float(np.max(np.abs(
                np.asarray(mean_tpu, np.float64) - mean64c)))
            c_var = float(np.max(np.abs(
                np.asarray(var_tpu, np.float64) - var64c)
                / np.maximum(1e-12, np.abs(var64c))))
            result["combine_max_abs_err_mean"] = c_mean
            result["combine_max_rel_err_var"] = c_var
            base["combine_max_abs_err_mean"] = c_mean
            base["combine_max_rel_err_var"] = c_var
        cache[cache_key] = base
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    if args.refine:
        result["refine_steps"] = args.refine
        if errs is not None:
            result["oracle_errors"] = {k: float(v) for k, v in errs.items()}
    if args.dtype is not None:  # explicit-dtype runs report their errors
        result["dtype"] = args.dtype
        if errs is not None:
            result["oracle_errors"] = {k: float(v) for k, v in errs.items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
