"""Pre-seed the N=1M stratified CPU baseline (BASELINE_GENERATED.json).

Runs `bench.run_cpu_baseline` for the N=1M / depth-4 / no-overlap tree on
the (single) host core ALONE, so the subsequent TPU bench run finds the
cache key and skips the ~40-min baseline pass inside its own timeout.
Saves the sampled per-leaf f64 mlls alongside, so the TPU run's numerics
can still be spot-checked offline (`_check_n1m_oracle.py` pattern).
"""
import json
import sys

import numpy as np

sys.argv = [""]
import jax

jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402

N, T, M, DEPTH = 1_000_000, 2000, 30, 4
x, y = bench.make_data(N)
xt = np.linspace(-0.05, 1.05, T).reshape(-1, 1)
model = bench.build_model(x, y, np.float64, M, depth=DEPTH, overlap=False)
print(f"model: L={model.num_leaves}, "
      f"max leaf={max(o.size for o in model.plan.leaf_obs)}", flush=True)
dt_cpu, n_sampled, mlls = bench.run_cpu_baseline(model, x, y, xt)
print(f"cpu baseline estimate: {dt_cpu:.1f}s over {n_sampled} sampled "
      "leaves", flush=True)

key = f"n{N}_t{T}_m{M}_d{DEPTH}"
with open(bench.BASELINE_CACHE) as f:
    cache = json.load(f)
cache[key] = {
    "cpu_seconds": dt_cpu,
    "sampled_leaves": n_sampled,
    "platform": "numpy-f64-1core-stratified-standin",
}
with open(bench.BASELINE_CACHE, "w") as f:
    json.dump(cache, f, indent=1)
np.savez("/tmp/n1m_sampled_mlls.npz",
         leaves=np.array(sorted(mlls)),
         mlls=np.array([mlls[k] for k in sorted(mlls)]),
         # tree-identity stamp: bench --check-mlls refuses a seed file
         # whose (n, depth, m) do not match the run it is gating
         n=np.int64(N), depth=np.int64(DEPTH), m=np.int64(M))
print("cache written:", key, flush=True)
