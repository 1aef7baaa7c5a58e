"""Verify driver: sparse finetune backward + device_put batching on the
real TPU chip (ambient JAX_PLATFORMS=axon)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.train import make_finetune_vg_bucketed

print("devices:", jax.devices())

rng = np.random.default_rng(1)
N = 20_000
X = rng.uniform(size=(N, 1))
y = np.sin(X[:, 0] * 12) + 0.1 * rng.normal(size=N)

t0 = time.perf_counter()
model = dsm.build_dsmgp(X, y, V=2, K=4, depth=3, M=256,
                        kernel=dsm.IsoSE(0.0, 0.0), seed=0)
print("build %.2fs  leaves=%d buckets=%s" % (
    time.perf_counter() - t0, model.num_leaves,
    [b.nmax for b in model.bucket_batches]))
assert model.batch.x.dtype == jnp.float32  # device_put path kept f32

model.fit()
mu, var = model.predict(X[:256])
assert np.all(np.isfinite(mu)) and np.all(var > 0)
print("CHECK T1 PASSED: build (device_put batching) + fit + predict on TPU")

L = model.num_leaves
H = np.tile(np.asarray(model.theta), (L, 1)).astype(np.float32)
H[:, 0] += np.linspace(-0.2, 0.2, L, dtype=np.float32)
Dd = model.plan.overlap.copy()
np.fill_diagonal(Dd, 1.0)
print("overlap density: %.3f" % (Dd != 0).mean())

args = (model.layout, model.plan, model.bucket_batches,
        model.bucket_spec.leaf_ids)
vg_d = make_finetune_vg_bucketed(*args, sparse=False)
vg_s = make_finetune_vg_bucketed(*args, sparse=True)
Hj, Dj = jnp.asarray(H), jnp.asarray(Dd, dtype=jnp.float32)

md, gd = vg_d(Hj, Dj)  # compile
t0 = time.perf_counter(); md, gd = vg_d(Hj, Dj); td = time.perf_counter() - t0
ms, gs = vg_s(Hj, Dj)  # compile
t0 = time.perf_counter(); ms, gs = vg_s(Hj, Dj); ts = time.perf_counter() - t0

np.testing.assert_allclose(np.asarray(md), np.asarray(ms), atol=1e-5,
                           rtol=1e-5)
scale = np.abs(np.asarray(gd)).max()
err = np.abs(np.asarray(gd) - np.asarray(gs)).max() / scale
print("grad rel-err (f32 TPU): %.2e" % err)
assert err < 3e-3, err
print("CHECK T2 PASSED: sparse == dense on TPU (f32 tolerance)")
print("dense iter %.2fs   sparse iter %.2fs   speedup %.2fx" % (td, ts, td / ts))

print("ALL SPARSE-FT TPU CHECKS PASSED")
