"""Round-2 verify driver: public API end-to-end on the TPU chip."""
import numpy as np
import deepstructuredmixtures_tpu as dsm

rng = np.random.default_rng(0)

# 1. README workflow (BASELINE config 1/5)
x = np.linspace(0, 1, 100); y = np.sin(x * 4 * np.pi)
m = dsm.build_dsmgp(x.reshape(-1, 1), y, V=3, K=4, M=10,
                    kernel=dsm.IsoSE(1.0, 1.0), seed=0)
dsm.train(m, iterations=30, lam=1e-4, progress=False, seed=0)
z = m.update()
mu, var = m.predict(np.linspace(0.5, 1.5, 100).reshape(-1, 1))
assert np.isfinite(z) and np.all(np.isfinite(np.asarray(mu)))
assert np.all(np.asarray(var) > 0)
print("1. README workflow OK  z=%.4f" % z)

# 2. shared vs batched parity (incl. generalized delete-then-continue)
m.fit(method="batched"); mll_b = m.mll()
m.fit(method="shared"); mll_s = m.mll()
assert abs(mll_b - mll_s) < 1e-4 * max(1, abs(mll_b)), (mll_b, mll_s)
print("2. shared/batched mll parity OK  (%.6f vs %.6f)" % (mll_b, mll_s))

# 3. finetune (unties) then fit stays batched-correct
h = dsm.finetune(m, iterations=3, lam=1e-9, progress=False)
assert m.theta.ndim == 2
m.fit(method="auto")
assert np.all(np.isfinite(np.asarray(m.leaf_mlls())))
print("3. finetune + auto refit OK")

# 4. PoE / gPoE / BCM
for builder, kw in ((dsm.build_poe, {}), (dsm.build_poe, {"generalized": True}),
                    (dsm.build_bcm, {})):
    p = builder(x.reshape(-1, 1), y, K=3, M=10, kernel=dsm.IsoSE(0.0, 0.0),
                log_noise=-1.0, seed=1, **kw)
    mu_p, var_p = p.predict(np.linspace(0, 1, 50).reshape(-1, 1))
    assert np.all(np.isfinite(np.asarray(mu_p))) and np.all(np.asarray(var_p) > 0)
print("4. PoE/gPoE/rBCM OK")

# 5. standalone GP + 1-D x no reshape
gp = dsm.GaussianProcess(x, y, kernel=dsm.IsoSE(-1.0, 0.0), log_noise=-1.5).fit()
mu_g, var_g = gp.predict(np.linspace(0, 1, 20))
assert np.all(np.isfinite(np.asarray(mu_g)))
print("5. standalone GP OK  mll=%.3f" % gp.mll())

# 6. error probes
try:
    dsm.build_dsmgp(x.reshape(-1, 1), y[:-5], V=2, K=2, M=10, seed=0)
    raise SystemExit("FAIL: length mismatch accepted")
except (ValueError, AssertionError):
    pass
try:
    bad = y.copy(); bad[3] = np.nan
    dsm.build_dsmgp(x.reshape(-1, 1), bad, V=2, K=2, M=10, seed=0)
    raise SystemExit("FAIL: NaN accepted")
except (ValueError, AssertionError):
    pass
print("6. error probes OK")

# 7. kernel mixture on 2-D data
x2 = rng.uniform(0, 1, (160, 2)); y2 = np.sin(3 * x2[:, 0]) + x2[:, 1]
km = dsm.build_dsmgp(x2, y2, V=2, K=2, M=20,
                     kernel=[dsm.ArdSE([0.0, 0.0], 0.0), dsm.ArdLinear([0.0, 0.0])],
                     log_noise=-1.0, seed=3)
mu2, var2 = km.predict(rng.uniform(0, 1, (30, 2)))
assert np.all(np.isfinite(np.asarray(mu2))) and np.all(np.asarray(var2) > 0)
print("7. kernel mixture 2-D OK")

# 8. Pallas-eligible model (pad_multiple=128, f32 IsoSE on TPU)
import jax.numpy as jnp
xp = np.sort(rng.uniform(0, 1, 600)).reshape(-1, 1)
yp = np.sin(xp[:, 0] * 5) + 0.1 * rng.standard_normal(600)
mp = dsm.build_dsmgp(xp, yp, V=2, K=3, M=30, kernel=dsm.IsoSE(0.0, 0.0),
                     log_noise=-1.0, seed=2, dtype=jnp.float32,
                     do_fit=False, pad_multiple=128)
from deepstructuredmixtures_tpu import fit as fitlib
pa = fitlib.fit_batched(mp.layout, mp.theta, mp.batch, use_pallas=True)
pb = fitlib.fit_batched(mp.layout, mp.theta, mp.batch, use_pallas=False)
rel = np.max(np.abs(np.asarray(pa.mll) - np.asarray(pb.mll))
             / np.maximum(1, np.abs(np.asarray(pb.mll))))
assert rel < 1e-4, rel
print("8. Pallas fused path OK  rel mll diff %.2e" % rel)

# 9. refit idempotence + extrapolation variance
m2 = dsm.build_dsmgp(x.reshape(-1, 1), y, V=2, K=2, M=10,
                     kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0, seed=5)
a = float(m2.mll()); m2.fit(); b = float(m2.mll())
assert abs(a - b) < 1e-6
mu_e, var_e = m2.predict(np.array([[25.0]]))
assert np.isfinite(float(mu_e[0])) and float(var_e[0]) > 0
print("9. refit idempotence + extrapolation OK")

print("ALL TPU VERIFY CHECKS PASSED")

# 10. streamed bodies route through the fused Pallas kernel (round-3
# wiring: default pad_multiple=128 on TPU/f32/IsoSE, 128-quantum small
# buckets, untied-hypers support) — streamed mlls must match plain XLA
mp2 = dsm.build_dsmgp(xp, yp, V=2, K=3, M=30, kernel=dsm.IsoSE(0.0, 0.0),
                      log_noise=-1.0, seed=2, dtype=jnp.float32, do_fit=False)
assert all(b.nmax % 128 == 0 for b in mp2.bucket_batches), \
    [b.nmax for b in mp2.bucket_batches]
ref = fitlib.fit_batched(mp2.layout, mp2.theta, mp2.batch, use_pallas=False)
lite = fitlib.bucketed_leaf_mlls(
    mp2.layout, mp2.theta, mp2.bucket_batches, mp2.bucket_spec.leaf_ids,
    mp2.num_leaves,
)
rel = np.max(np.abs(np.asarray(lite) - np.asarray(ref.mll))
             / np.maximum(1, np.abs(np.asarray(ref.mll))))
assert rel < 1e-4, rel
# untied per-leaf hypers through the same streamed/fused path
Lh = mp2.num_leaves
Hh = np.tile(np.asarray(mp2.theta), (Lh, 1)).astype(np.float32)
Hh[:, 0] += np.linspace(-0.2, 0.2, Lh)
ref_u = fitlib.fit_batched(mp2.layout, jnp.asarray(Hh), mp2.batch,
                           use_pallas=False)
lite_u = fitlib.bucketed_leaf_mlls(
    mp2.layout, jnp.asarray(Hh), mp2.bucket_batches,
    mp2.bucket_spec.leaf_ids, mp2.num_leaves,
)
rel_u = np.max(np.abs(np.asarray(lite_u) - np.asarray(ref_u.mll))
               / np.maximum(1, np.abs(np.asarray(ref_u.mll))))
assert rel_u < 1e-4, rel_u
print("10. streamed fused-kernel path OK  rel %.2e (untied %.2e)" % (rel, rel_u))

print("ALL TPU VERIFY CHECKS PASSED (incl. 10)")
