"""Verify driver: cached-alpha mean fast path (CPU/f64).

fit(store='light') caches per-bucket alpha weights; predict(xt,
return_var=False) must equal the factor-cached full predict's mean,
through the public API, serve layer, untied hypers, kernel mixtures,
and after checkpoint round-trip (cache not persisted -> falls back)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_enable_x64", True)

import json
import threading
import urllib.request

import numpy as np

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.serve import Predictor, serve

rng = np.random.default_rng(5)
X = rng.uniform(size=(500, 3))
y = np.sin(X @ np.array([3.0, 5.0, 2.0])) + 0.1 * rng.normal(size=500)
XT = rng.uniform(-0.1, 1.1, size=(77, 3))

# kernel mixture + multi-D: the hardest routing/layout case
model = dsm.build_dsmgp(
    X, y, V=2, K=2, M=40,
    kernel=[dsm.ArdSE([0.0] * 3, 0.0), dsm.IsoLinear(0.0)],
    seed=7, dtype=np.float64,
)
model.update()
mu_full, var_full = model.predict(XT)
assert model.posterior.chol is not None  # full store at this size

model.fit(store="light")
model.update()
assert model.posterior.chol is None and model._alpha_cache is not None
mu_fast = model.predict(XT, return_var=False)
np.testing.assert_allclose(np.asarray(mu_fast), np.asarray(mu_full),
                           atol=1e-9, rtol=1e-9)
print("CHECK 1 PASSED: kernel-mixture alpha-mean == full predict mean")

# untied per-leaf hypers (post-finetune shape)
L = model.num_leaves
H = np.tile(np.asarray(model.theta), (L, 1))
H[:, 0] += np.linspace(-0.15, 0.15, L)
model.set_params(H)
assert model._alpha_cache is None
model.fit(store="full")
model.update()
mu_u_full, _ = model.predict(XT)
model.fit(store="light")
mu_u_fast = model.predict(XT, return_var=False)
np.testing.assert_allclose(np.asarray(mu_u_fast), np.asarray(mu_u_full),
                           atol=1e-9, rtol=1e-9)
print("CHECK 2 PASSED: untied-hypers alpha-mean == full predict mean")

# return_var=False on a FULL-store model returns mean-only (no fast path
# needed; API shape must still hold)
model.fit(store="full")
mu_only = model.predict(XT, return_var=False)
np.testing.assert_allclose(np.asarray(mu_only), np.asarray(mu_u_full),
                           atol=1e-12)
print("CHECK 3 PASSED: return_var=False on full store is mean-only")

# serve layer: light store + variance:false end to end over HTTP
model.fit(store="light")
model.update()
p = Predictor(model, warm_sizes=(16,), warm=True, factor_budget=0)
assert p._mean_only
server = serve(p, port=0)
port = server.server_address[1]
threading.Thread(target=server.serve_forever, daemon=True).start()
body = json.dumps({"x": XT.tolist(), "variance": False}).encode()
req = urllib.request.Request(f"http://127.0.0.1:{port}/predict", data=body)
with urllib.request.urlopen(req, timeout=60) as r:
    out = json.loads(r.read())
server.shutdown()
assert "var" not in out and "mean" in out
np.testing.assert_allclose(out["mean"], np.asarray(mu_u_full), atol=1e-7)
body = json.dumps({"x": XT.tolist()}).encode()  # default: both moments
server = serve(p, port=0)
port = server.server_address[1]
threading.Thread(target=server.serve_forever, daemon=True).start()
req = urllib.request.Request(f"http://127.0.0.1:{port}/predict", data=body)
with urllib.request.urlopen(req, timeout=120) as r:
    out2 = json.loads(r.read())
server.shutdown()
assert "var" in out2
print("CHECK 4 PASSED: HTTP variance:false mean-only; default still both")

# checkpoint round-trip: the alpha cache is derived state, not persisted;
# a loaded model must still answer return_var=False (streamed fallback)
from deepstructuredmixtures_tpu import checkpoint

checkpoint.save(model, "/tmp/_alpha_ckpt.npz")
m2 = checkpoint.load("/tmp/_alpha_ckpt.npz")
mu_ck = m2.predict(XT, return_var=False)
np.testing.assert_allclose(np.asarray(mu_ck), np.asarray(mu_u_full),
                           atol=1e-8, rtol=1e-8)
print("CHECK 5 PASSED: loaded checkpoint serves mean-only via fallback")

# refit idempotence of the cache: two light fits, same answer
model.fit(store="light")
mu_again = model.predict(XT, return_var=False)
np.testing.assert_allclose(np.asarray(mu_again), np.asarray(mu_u_fast),
                           atol=1e-12)
print("CHECK 6 PASSED: light refit idempotent")

print("ALL ALPHA-MEAN CPU CHECKS PASSED")
