"""End-to-end verify drive on the ambient (TPU) platform."""
import numpy as np
import deepstructuredmixtures_tpu as dsm

ok = []

# --- happy path: README workflow -----------------------------------------
x = np.linspace(0, 1, 100)
y = np.sin(x * 4 * np.pi)
model = dsm.build_dsmgp(x.reshape(-1, 1), y, V=3, K=4, M=10,
                        kernel=dsm.IsoSE(1.0, 1.0), seed=0)
hist = dsm.train(model, iterations=30, lam=1e-4)
z = model.update()
mu, var = model.predict(np.linspace(0.5, 1.5, 100).reshape(-1, 1))
assert np.all(np.isfinite(np.asarray(mu))) and np.all(np.asarray(var) > 0)
assert np.isfinite(z)
ok.append(f"dsmgp train/update/predict z={z:.3f} mll_last={hist[-1]:.3f}")

# --- shared vs batched fit parity ----------------------------------------
t1 = model.fit(method="batched")
mll_b = np.asarray(model.leaf_mlls())
t2 = model.fit(method="shared")
mll_s = np.asarray(model.leaf_mlls())
err = np.max(np.abs(mll_b - mll_s) / np.maximum(1.0, np.abs(mll_b)))
assert err < 1e-4, f"shared vs batched mll mismatch {err}"  # f32 on TPU
ok.append(f"shared-vs-batched fit rel err {err:.2e} (batched {t1:.3f}s shared {t2:.3f}s)")

# --- PoE / gPoE / BCM -----------------------------------------------------
for name, m in [
    ("poe", dsm.build_poe(x.reshape(-1, 1), y, K=4, M=10, kernel=dsm.IsoSE(0.0, 0.0), seed=0)),
    ("gpoe", dsm.build_poe(x.reshape(-1, 1), y, K=4, M=10, generalized=True, kernel=dsm.IsoSE(0.0, 0.0), seed=0)),
    ("rbcm", dsm.build_bcm(x.reshape(-1, 1), y, K=4, M=10, kernel=dsm.IsoSE(0.0, 0.0), seed=0)),
]:
    mu, var = m.predict(np.linspace(-0.1, 1.1, 50).reshape(-1, 1))
    assert np.all(np.isfinite(np.asarray(mu))) and np.all(np.asarray(var) > 0), name
    ok.append(f"{name} predict finite")

# --- standalone GP --------------------------------------------------------
gp = dsm.GaussianProcess(x.reshape(-1, 1), y, kernel=dsm.IsoSE(0.0, 0.0))
gp.fit()
mu, var = gp.predict(np.linspace(0, 1, 20).reshape(-1, 1))
assert np.all(np.isfinite(np.asarray(mu)))
ok.append(f"standalone GP mll={gp.mll():.3f}")

# --- finetune -------------------------------------------------------------
h = dsm.finetune(model, iterations=3)
ok.append(f"finetune 3 iters, last={h[-1]:.3f}")

# --- kernel mixtures on multi-D -------------------------------------------
rng = np.random.default_rng(0)
X2 = rng.uniform(0, 1, (200, 2))
y2 = np.sin(X2[:, 0] * 3) + X2[:, 1]
m2 = dsm.build_dsmgp(X2, y2, V=2, K=2, M=20,
                     kernel=[dsm.ArdSE([0.0, 0.0], 0.0), dsm.ArdLinear([0.0, 0.0])],
                     seed=1)
mu, var = m2.predict(rng.uniform(0, 1, (30, 2)))
assert np.all(np.isfinite(np.asarray(mu))) and np.all(np.asarray(var) > 0)
ok.append("kernel-mixture multi-D dsmgp predict finite")

# --- error probes ---------------------------------------------------------
try:
    dsm.build_dsmgp(x.reshape(-1, 1), y[:-5], V=2, K=2, seed=0)
    raise SystemExit("FAIL: length mismatch not raised")
except (ValueError, AssertionError):
    ok.append("mismatched x/y raises")
try:
    bad = y.copy(); bad[3] = np.nan
    dsm.build_dsmgp(x.reshape(-1, 1), bad, V=2, K=2, seed=0)
    raise SystemExit("FAIL: NaN input not raised")
except (ValueError, AssertionError):
    ok.append("NaN input raises")

# --- 1-D x without reshape ------------------------------------------------
m1 = dsm.build_dsmgp(x, y, V=2, K=2, M=10, kernel=dsm.IsoSE(0.0, 0.0), seed=0)
mu, _ = m1.predict(np.linspace(0, 1, 10))
ok.append("1-D x accepted")

# --- refit idempotence ----------------------------------------------------
model.fit(); a = np.asarray(model.leaf_mlls())
model.fit(); b = np.asarray(model.leaf_mlls())
assert np.array_equal(a, b)
ok.append("refit idempotent")

# --- Pallas fused gram+Cholesky, COMPILED on the TPU (the test suite only
# exercises the interpreter; this is the Mosaic-lowering gate) -------------
import jax

if jax.devices()[0].platform != "cpu":
    import jax.numpy as jnp

    from deepstructuredmixtures_tpu.kernels import gram as _gram
    from deepstructuredmixtures_tpu.ops.pallas_chol import fused_gram_cholesky

    Lk, Nk = 8, 384
    prng = np.random.default_rng(11)
    xk = np.zeros((Lk, Nk, 1), np.float32)
    nk = prng.integers(int(0.6 * Nk), Nk + 1, Lk).astype(np.int32)
    for l in range(Lk):
        xk[l, : nk[l], 0] = np.sort(prng.uniform(0, 1, nk[l]))
    out = np.asarray(fused_gram_cholesky(
        jnp.asarray(xk), jnp.asarray(nk),
        jnp.full((Lk,), -0.5, jnp.float32), jnp.full((Lk,), 0.2, jnp.float32),
        jnp.full((Lk,), 0.05, jnp.float32),
    ))
    assert not np.isnan(out).any()
    worst = 0.0
    for l in range(Lk):
        K = np.asarray(_gram("iso_se", jnp.asarray([-0.5]), jnp.asarray(0.2),
                             jnp.asarray(xk[l, : nk[l]]),
                             jnp.asarray(xk[l, : nk[l]])), dtype=np.float64)
        K = K + (0.05 + 1e-8) * np.eye(nk[l])
        worst = max(worst, np.abs(
            out[l, : nk[l], : nk[l]] - np.linalg.cholesky(K)).max())
    assert worst < 5e-4, f"compiled pallas kernel err {worst}"
    ok.append(f"pallas kernel compiled-on-TPU oracle err {worst:.2e}")

print("\n".join("OK " + s for s in ok))
print(f"ALL {len(ok)} FLOWS PASS")
