import time, numpy as np
import bench
import jax, jax.numpy as jnp
from deepstructuredmixtures_tpu import fit as fitlib

x, y = bench.make_data(100_000)
model = bench.build_model(x, y, jnp.float32, 30)
layout = model.layout

def timed(f, *a, iters=2):
    o = f(*a); _ = float(jnp.sum(o))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter(); o = f(*a); _ = float(jnp.sum(o)); ts.append(time.perf_counter()-t0)
    return min(ts)

for bi, want in [(5, [2, 6]), (3, [5, 15]), (6, [1, 2, 3])]:
    b = model.bucket_batches[bi]
    for chunk in want:
        if chunk > b.num_leaves: continue
        f = jax.jit(lambda th, bb, c=chunk: fitlib.fit_light(layout, th, bb, chunk=c).mll)
        dt = timed(f, model.theta, b)
        print(f"bucket nmax={b.nmax} L={b.num_leaves} chunk={chunk}: {dt*1e3:8.1f} ms", flush=True)
