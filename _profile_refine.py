"""Per-bucket decomposition of the refine-1 wall (round-4 VERDICT weak
#4): the 34.8 s round-4 figure was never re-profiled after the variance
residual widened to t columns. This driver times, per size bucket of the
headline tree, (a) the plain f32 streamed fit+predict body and (b) the
refine-1 body (joint true-K f64 residual pass, ``ops/refine.refine_joint``),
each standalone and d2h-fenced — so the end-to-end ``bench.py --refine 1``
wall decomposes into per-bucket intrinsic cost + dispatch overhead, and the
f64-emulation cost is separated from the f32 base.

Usage: python _profile_refine.py [N] (default 100000)
"""
import sys
import time

import numpy as np

argv, sys.argv = sys.argv[1:], [""]

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import bench
from deepstructuredmixtures_tpu import fit as fitlib

N = int(argv[0]) if argv else 100_000

x, y = bench.make_data(N)
xt = np.linspace(-0.05, 1.05, 2000).reshape(-1, 1)
model = bench.build_model(x, y, jnp.float32, 30)
tidx, tmask = model._route(xt)
layout = model.layout
ids = model.bucket_spec.leaf_ids
tidx_d, tmask_d = jnp.asarray(tidx), jnp.asarray(tmask)
xtd = jnp.asarray(xt, model.dtype)

rows = []
for b, bids in zip(model.bucket_batches, ids):
    bids_d = jnp.asarray(np.asarray(bids))
    chunk = fitlib._bucket_chunk(b.nmax, b.num_leaves, b.x.dtype, 2 << 30)

    # signature mirrors bench.run_tpu's bucket_program exactly (xt and
    # routing as ARGUMENTS) so the persistent XLA cache is shared with
    # `bench.py --refine 1`
    def make(steps):
        @jax.jit
        def prog(theta, batch, xtd, ti, tm):
            th = theta if theta.ndim == 1 else theta[bids_d]
            return fitlib.streamed_leaf_predict(
                layout, th, batch, xtd, ti, tm, chunk=chunk,
                refine_steps=steps,
            )
        return prog

    p0, p1 = make(0), make(1)
    args = (model.theta, b, xtd, tidx_d[bids_d], tmask_d[bids_d])

    def timed(p):
        out = p(*args)
        np.asarray(out[2])  # warm + fence
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = p(*args)
            np.asarray(out[2])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t0s, t1s = timed(p0), timed(p1)
    # intrinsic f64 residual work of this bucket: one joint pass over
    # [y | K_nt] = 2*n^2*(T+1) flops per leaf (T = routed tmax) plus the
    # on-the-fly f64 gram (2*n^2*D per row block)
    n_true = np.asarray(b.n, dtype=np.float64)
    tm_b = np.asarray(tmask)[np.asarray(bids)]
    tcols = tm_b.shape[1]
    f64_flops = float((2.0 * n_true**2 * (tcols + 1)).sum())
    rows.append((int(b.nmax), int(b.num_leaves), tcols, t0s, t1s,
                 t1s - t0s, f64_flops))
    print(f"nmax={b.nmax:6d} leaves={b.num_leaves:3d} tmax={tcols:5d} "
          f"f32={t0s:7.3f}s refine1={t1s:7.3f}s delta={t1s - t0s:7.3f}s "
          f"f64resid={f64_flops/1e12:6.2f}TF "
          f"rate={f64_flops / max(t1s - t0s, 1e-9) / 1e12:5.2f}TF/s",
          flush=True)

sum_f32 = sum(r[3] for r in rows)
sum_r1 = sum(r[4] for r in rows)
sum_delta = sum(r[5] for r in rows)
sum_tf = sum(r[6] for r in rows) / 1e12
print(f"\nTOTALS: f32 buckets {sum_f32:.2f}s | refine-1 buckets "
      f"{sum_r1:.2f}s | f64-residual delta {sum_delta:.2f}s for "
      f"{sum_tf:.1f} TF -> {sum_tf / max(sum_delta, 1e-9):.2f} TF/s "
      f"emulated-f64 effective", flush=True)
print("compare: end-to-end `bench.py --refine 1` wall minus "
      f"{sum_r1:.2f}s = dispatch/combine overhead", flush=True)
