"""Round-2 verify drive: public API end-to-end, incl. the untied-hypers fix."""
import numpy as np

import deepstructuredmixtures_tpu as dsm

rng = np.random.default_rng(0)
x = np.linspace(0, 1, 200)
y = np.sin(x * 4 * np.pi) + rng.normal(0, 0.1, 200)

model = dsm.build_dsmgp(x.reshape(-1, 1), y, V=3, K=4, M=10,
                        kernel=dsm.IsoSE(1.0, 1.0), seed=0)
dsm.train(model, iterations=30, lam=1e-4, randinit=False)
z = model.update()
mu, var = model.predict(np.linspace(-0.2, 1.2, 100).reshape(-1, 1))
assert np.all(np.isfinite(mu)) and np.all(var > 0)
print(f"train+update+predict OK z={z:.3f}")

# shared vs batched parity (tied hypers)
model.fit(method="batched"); mb = model.mll()
model.fit(method="shared"); ms = model.mll()
assert abs(mb - ms) < 1e-5, (mb, ms)
print(f"shared/batched parity OK: {mb:.6f} vs {ms:.6f}")

# finetune -> untied -> fit must be batched-exact (the r1 bug)
dsm.finetune(model, iterations=3, lam=1e-9)
assert model.theta.ndim == 2
from deepstructuredmixtures_tpu import fit as fitlib
pb = fitlib.fit_batched(model.layout, model.theta, model.batch)
err = float(np.max(np.abs(np.asarray(model.leaf_mlls()) - np.asarray(pb.mll))))
assert err < 1e-5, err
print(f"post-finetune parity OK: max leaf-mll err {err:.2e}")

# explicit shared request with untied hypers: warns + falls back, stays exact
model.fit(method="shared")
err2 = float(np.max(np.abs(np.asarray(model.leaf_mlls()) - np.asarray(pb.mll))))
assert err2 < 1e-5, err2
print(f"explicit-shared downgrade OK: max leaf-mll err {err2:.2e}")

# other model families + standalone GP
p = dsm.build_poe(x.reshape(-1, 1), y, K=4, M=10, generalized=True, seed=1)
mu, var = p.predict(x[:50].reshape(-1, 1))
assert np.all(np.isfinite(mu))
b = dsm.build_bcm(x.reshape(-1, 1), y, K=4, M=10, seed=2)
mu, var = b.predict(x[:50].reshape(-1, 1))
assert np.all(np.isfinite(mu))
gp = dsm.GaussianProcess(x.reshape(-1, 1), y).fit()
mu, var = gp.predict(x[:20].reshape(-1, 1))
assert np.all(np.isfinite(mu))
print("PoE/rBCM/GP OK")
print("ALL VERIFY CHECKS PASSED")
