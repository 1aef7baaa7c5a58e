"""The reference README workflow end-to-end (reference ``README.md:35-100``):
build a DSMGP on a noisy sine, train tied hypers, exact posterior update,
predict beyond the data, and plot.

Run: ``python examples/readme_workflow.py`` (writes dsmgp_readme.png).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import deepstructuredmixtures_tpu as dsm

rng = np.random.default_rng(0)
xtrain = np.linspace(0, 1, 100)
ytrain = np.sin(xtrain * 4 * np.pi) + rng.normal(0, 0.2, 100)

model = dsm.build_dsmgp(
    xtrain.reshape(-1, 1), ytrain, V=3, K=4, M=10,
    kernel=dsm.IsoSE(1.0, 1.0), mean_fun=dsm.ConstMean(float(ytrain.mean())),
    seed=0,
)
hist = dsm.train(model, iterations=200, lam=1e-3)
z = model.update()
print(f"trained {len(hist)} iters, final mll {hist[-1]:.3f}, log-evidence {z:.3f}")

xtest = np.linspace(-0.2, 1.2, 200).reshape(-1, 1)
m, s = model.predict(xtest)
print(f"predictive mean range [{float(np.min(m)):.2f}, {float(np.max(m)):.2f}]")

try:
    from deepstructuredmixtures_tpu.plotting import plot_model

    path = os.path.join(os.path.dirname(__file__), "dsmgp_readme.png")
    plot_model(model, show_splits=True, path=path)
    print(f"wrote {path}")
except Exception as e:  # matplotlib optional
    print(f"plot skipped: {e}")
