"""Frontier D-weighted finetune smoke (round-3 VERDICT next #4, closing
criterion): build the N=500k / depth-4 / 20,736-leaf tree WITH the overlap
analysis (sparse CSR D — previously infeasible), then run finetune on a
small leaf subset (`leaves=`) so the D-row weighting, sparse pair-list
backward, and per-leaf hyper update all execute at frontier scale.

Usage: python _frontier_finetune_smoke.py [N] [DEPTH] [N_LEAVES]
"""
import sys
import time

import numpy as np

argv, sys.argv = sys.argv[1:], [""]
import optax

import bench
import deepstructuredmixtures_tpu as dsm

N = int(argv[0]) if len(argv) > 0 else 500_000
DEPTH = int(argv[1]) if len(argv) > 1 else 4
NTUNE = int(argv[2]) if len(argv) > 2 else 8

import jax.numpy as jnp

x, y = bench.make_data(N)
t0 = time.perf_counter()
model = bench.build_model(x, y, jnp.float32, 30, depth=DEPTH, overlap=True)
t_build = time.perf_counter() - t0
import scipy.sparse as sp

D = model.plan.overlap
print(f"build: {t_build:.1f}s, L={model.num_leaves}, sparse D={sp.issparse(D)}"
      f" nnz={D.nnz if sp.issparse(D) else int((D != 0).sum())}", flush=True)

t0 = time.perf_counter()
model.fit(store="light")
mll0 = np.asarray(model.leaf_mlls())
print(f"light fit: {time.perf_counter() - t0:.1f}s", flush=True)

# tune the worst-mll leaves (per-observation, so size doesn't dominate)
sizes = np.array([o.size for o in model.plan.leaf_obs])
worst = np.argsort(mll0 / sizes)[:NTUNE]
print("tuning leaves:", worst.tolist(), flush=True)
t0 = time.perf_counter()
hist = dsm.finetune(model, optax.adam(1e-2), iterations=2, lam=1e-9,
                    leaves=worst, progress=False)
t_ft = time.perf_counter() - t0
mll1 = np.asarray(model.leaf_mlls())
d_own = float(mll1[worst].sum() - mll0[worst].sum())
print(f"finetune(leaves={NTUNE}) 2 iters: {t_ft:.1f}s, "
      f"own-mll history={np.round(hist, 3).tolist()}, "
      f"sum own-mll delta after refit={d_own:.3f}", flush=True)
assert np.all(np.isfinite(hist)) and np.all(np.isfinite(mll1))
assert model.theta.ndim == 2  # untied
print("FRONTIER FINETUNE SMOKE OK", flush=True)
