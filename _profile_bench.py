import time, numpy as np, sys
import bench
import jax, jax.numpy as jnp
from deepstructuredmixtures_tpu import fit as fitlib
from deepstructuredmixtures_tpu.fit import _noisy_gram, _bucket_chunk
from deepstructuredmixtures_tpu.leafgp import centered_y, leaf_mll, leaf_predict, LeafPosterior as LP
from deepstructuredmixtures_tpu.ops import cholesky as chol

x, y = bench.make_data(100_000)
model = bench.build_model(x, y, jnp.float32, 30)
xt = np.linspace(-0.05, 1.05, 2000).reshape(-1, 1)
tidx, tmask = model._route(xt)
print("tmax =", tidx.shape[1])
layout = model.layout
xtd = jnp.asarray(xt, model.dtype)

def timed(f, *a, iters=2):
    o = f(*a); _ = float(jnp.sum(o[0]) if isinstance(o, tuple) else jnp.sum(o))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        o = f(*a)
        _ = float(jnp.sum(o[0]) if isinstance(o, tuple) else jnp.sum(o))
        ts.append(time.perf_counter() - t0)
    return min(ts)

total_f = total_p = 0.0
for b, ids in zip(model.bucket_batches, model.bucket_spec.leaf_ids):
    ids = np.asarray(ids)
    chunk = _bucket_chunk(b.nmax, b.num_leaves, b.x.dtype, 2 << 30)
    ti = jnp.asarray(tidx[ids]); tm = jnp.asarray(tmask[ids])

    # fit only (gram+chol+alpha+mll)
    def fit_only(th, bb):
        return fitlib.fit_light(layout, th, bb, chunk=chunk).mll
    f1 = jax.jit(fit_only)
    dt_f = timed(f1, model.theta, b)

    # fused fit+predict
    def fp(th, bb, xtd, ti, tm):
        return fitlib.streamed_leaf_predict(layout, th, bb, xtd, ti, tm, chunk=chunk)
    f2 = jax.jit(fp)
    dt_fp = timed(f2, model.theta, b, xtd, ti, tm)

    total_f += dt_f; total_p += dt_fp - dt_f
    print(f"bucket nmax={b.nmax:6d} L={b.num_leaves:3d} chunk={chunk:3d}: fit {dt_f*1e3:8.1f} ms  fit+pred {dt_fp*1e3:8.1f} ms")
print(f"TOTAL fit {total_f:.3f}s  extra-predict {total_p:.3f}s")
