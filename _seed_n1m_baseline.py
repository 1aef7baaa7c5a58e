"""Pre-seed the scale-frontier stratified CPU baseline
(BASELINE_GENERATED.json) and the --check-mlls gating npz.

Runs `bench.run_cpu_baseline` for an N/depth/no-overlap tree on the
(single) host core ALONE, so the subsequent TPU bench run finds the cache
key and skips the ~40-min baseline pass inside its own timeout. Saves the
sampled per-leaf f64 mlls AND routed predictive moments alongside, so the
TPU run's numerics — leaf mlls, leaf predictive mean/variance, and (via
the combine cross-check inside bench) the full-leaf-count SPN moment
matching — are all gated at scales where a complete oracle is infeasible.

Usage: python _seed_n1m_baseline.py [N] [DEPTH] [OUT.npz]
  defaults: 1000000 4 /tmp/n1m_sampled_mlls.npz
"""
import json
import sys

import numpy as np

argv, sys.argv = sys.argv[1:], [""]
import jax

jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402

N = int(argv[0]) if len(argv) > 0 else 1_000_000
DEPTH = int(argv[1]) if len(argv) > 1 else 4
OUT = argv[2] if len(argv) > 2 else "/tmp/n1m_sampled_mlls.npz"
T, M = 2000, 30
x, y = bench.make_data(N)
xt = np.linspace(-0.05, 1.05, T).reshape(-1, 1)
model = bench.build_model(x, y, np.float64, M, depth=DEPTH, overlap=False)
print(f"model: L={model.num_leaves}, "
      f"max leaf={max(o.size for o in model.plan.leaf_obs)}", flush=True)
dt_cpu, n_sampled, mlls, moments = bench.run_cpu_baseline(model, x, y, xt)
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
order = sorted(mlls)
np.savez(OUT,
         leaves=np.array(order),
         mlls=np.array([mlls[k] for k in order]),
         # round-4 predictive-moment arrays (bench gates leaf mean/var
         # and the SPN combine when these are present)
         mu=np.stack([moments[k][0] for k in order]),
         var=np.stack([moments[k][1] for k in order]),
         tcount=np.array([moments[k][2] for k in order]),
         # tree-identity stamp: bench --check-mlls refuses a seed file
         # whose (n, depth, m) do not match the run it is gating
         n=np.int64(N), depth=np.int64(DEPTH), m=np.int64(M))
print("cache + seed npz written:", key, OUT, flush=True)
