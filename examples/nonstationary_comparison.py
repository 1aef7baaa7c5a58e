"""The paper's toy benchmark: DSMGP vs PoE/gPoE/rBCM on the nonstationary
heteroscedastic dataset (reference ``datasets.jl:5-27``), scored with the
reference metrics (``scorefunctions.jl``).

Run: ``python examples/nonstationary_comparison.py``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import deepstructuredmixtures_tpu as dsm

x, y, _noise = dsm.nonstationary(1500, seed=0)
x = np.asarray(x).reshape(-1, 1)
y = np.asarray(y)
itr = np.arange(0, len(y), 2)
ite = np.arange(1, len(y), 2)

models = {
    "DSMGP": dsm.build_dsmgp(x[itr], y[itr], V=3, K=4, M=40,
                             kernel=dsm.IsoSE(-1.0, 0.0), log_noise=-1.0,
                             seed=1),
    "PoE": dsm.build_poe(x[itr], y[itr], K=4, M=40,
                         kernel=dsm.IsoSE(-1.0, 0.0), log_noise=-1.0, seed=1),
    "gPoE": dsm.build_poe(x[itr], y[itr], K=4, M=40, generalized=True,
                          kernel=dsm.IsoSE(-1.0, 0.0), log_noise=-1.0, seed=1),
    "rBCM": dsm.build_bcm(x[itr], y[itr], K=4, M=40,
                          kernel=dsm.IsoSE(-1.0, 0.0), log_noise=-1.0, seed=1),
}

print(f"{'model':>6s} {'RMSE':>8s} {'MAE':>8s} {'NLPD':>8s}")
for name, m in models.items():
    if name == "DSMGP":
        dsm.train(m, iterations=100, lam=1e-3, randinit=False)
        m.update()
    mu, var = m.predict(x[ite])
    mu = np.asarray(mu)
    var = np.asarray(var)
    rmse = float(np.sqrt(dsm.mse(y[ite], mu)))
    mae = float(dsm.mae(y[ite], mu))
    nlpd = float(dsm.nlpd(y[ite], mu, var))
    print(f"{name:>6s} {rmse:8.4f} {mae:8.4f} {nlpd:8.4f}")
