"""Phase-timed N=500k/depth-4 host build (scale-frontier tree, no profiler).

Measures the phases behind ``build_dsmgp(..., overlap=False, do_fit=False)``
exactly as `bench.py --n 500000 --depth 4 --no-overlap` constructs them.
Used to record the before/after of the round-3 host-build optimization
campaign (BASELINE.md).
"""
import time
import numpy as np
import sys

sys.argv = [""]
import bench  # noqa: E402

x, y = bench.make_data(500_000)

import deepstructuredmixtures_tpu as dsm  # noqa: E402
from deepstructuredmixtures_tpu.config import DSMGPConfig  # noqa: E402
from deepstructuredmixtures_tpu import tree as treelib, plan as planlib  # noqa: E402
from deepstructuredmixtures_tpu.models import _resolve_pad_multiple  # noqa: E402

kernel = dsm.IsoSE(0.0, 0.0)
cfg = DSMGPConfig(None, kernel, -1.0, 30, 4, 3, 4, 0.5, True)
pad = _resolve_pad_multiple(None, np.float32, kernel)

t0 = time.perf_counter()
root = treelib.build_tree(x, y, cfg, np.random.default_rng(0))
t1 = time.perf_counter()
print(f"build_tree: {t1-t0:.1f}s", flush=True)
plan = planlib.compile_tree(root, x, pad_multiple=pad, overlap=False)
t2 = time.perf_counter()
print(f"compile_tree: {t2-t1:.1f}s  (L={plan.num_leaves}, nmax={plan.nmax}, "
      f"edges={plan.n_sum_edges})", flush=True)
spec = planlib.bucketize(plan)
t3 = time.perf_counter()
print(f"bucketize: {t3-t2:.1f}s  ({len(spec.nmaxs)} buckets)", flush=True)
import jax  # noqa: E402

bb = planlib.bucket_batches(plan, spec, x, y, np.float32)
jax.block_until_ready([b.x for b in bb])
t4 = time.perf_counter()
print(f"bucket_batches+transfer: {t4-t3:.1f}s", flush=True)
print(f"TOTAL (streamed-path build): {t4-t0:.1f}s", flush=True)
mono = plan.leaf_batch(x, y, np.float32)
jax.block_until_ready(mono.x)
t5 = time.perf_counter()
print(f"monolithic leaf_batch+transfer (now lazy in models): {t5-t4:.1f}s",
      flush=True)
