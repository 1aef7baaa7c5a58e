"""A/B: latency-aware bucketization (round-3 VERDICT weak #8, next #8).

The DP bucketizer minimizes padded Cholesky FLOPs only; the headline's
residual gap to the f32 floor is small-bucket latency + dispatch. This
experiment re-times the N=100k headline under per-bucket fixed-cost
values C (same nmax³ units; C ≈ overhead_s × effective-flops/s × 3),
trading the ~3.9% padding against fewer buckets. Result goes to
BASELINE.md; keep or retire.

Usage: python _ab_bucket_cost.py [N]
"""
import json
import sys

import numpy as np

argv, sys.argv = sys.argv[1:], [""]
import jax.numpy as jnp

import bench
from deepstructuredmixtures_tpu.plan import bucket_batches, bucketize

N = int(argv[0]) if argv else 100_000
x, y = bench.make_data(N)
xt = np.linspace(-0.05, 1.05, 2000).reshape(-1, 1)
model = bench.build_model(x, y, jnp.float32, 30)

out = {}
for C in (0.0, 1.5e11, 4.5e11, 1.5e12):
    spec = bucketize(model.plan, fixed_cost=C)
    model.bucket_spec = spec
    model.bucket_batches = bucket_batches(
        model.plan, spec, model.X, model.y, model.dtype
    )
    model._jit_cache = {}
    sizes = np.array([o.size for o in model.plan.leaf_obs])
    pad = sum(
        len(ids) * nm**3
        for nm, ids in zip(spec.nmaxs, spec.leaf_ids)
    ) / float((sizes.astype(np.float64) ** 3).sum())
    dt, z, *_ = bench.run_tpu(model, xt)
    out[str(C)] = {"buckets": len(spec.nmaxs), "padded_over_true_cube": round(pad, 4),
                   "wallclock_s": round(dt, 4), "log_evidence": round(z, 3)}
    print(json.dumps({C: out[str(C)]}), flush=True)
print(json.dumps(out))
