"""Round-2 verify driver: CPU/f64 path + multichip dryrun + serve."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import numpy as np
import deepstructuredmixtures_tpu as dsm

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) >= 8

rng = np.random.default_rng(0)
x = np.sort(rng.uniform(0, 1, 300)).reshape(-1, 1)
y = np.sin(x[:, 0] * 4 * np.pi) + 0.2 * rng.standard_normal(300)

# f64: shared vs batched at 1e-10
m = dsm.build_dsmgp(x, y, V=2, K=3, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                    log_noise=-1.0, seed=1)
m.fit(method="batched"); mb = m.mll()
m.fit(method="shared"); ms = m.mll()
assert abs(mb - ms) < 1e-8, (mb, ms)
print("CPU f64 shared/batched parity OK (%.10f vs %.10f)" % (mb, ms))

# sharded routed predict parity on the 8-dev mesh
from deepstructuredmixtures_tpu.parallel import make_mesh, make_sharded_routed_predict
import jax.numpy as jnp
mesh = make_mesh(8)
xt = np.linspace(-0.05, 1.05, 41).reshape(-1, 1)
tidx, tmask = m._route(xt)
f, prep = make_sharded_routed_predict(m.layout, m.plan, m.batch, mesh)
ti, tm = prep(tidx, tmask)
z_s, mu_s, var_s = f(m.theta, jnp.asarray(xt, m.dtype), ti, tm)
m.fit(method="batched"); z_l = m.update()
mu_l, var_l = m.predict(xt)
assert abs(float(z_s) - z_l) < 1e-9
assert np.max(np.abs(np.asarray(mu_s) - np.asarray(mu_l))) < 1e-9
print("sharded routed predict parity OK")

# distributed giant-GP at model layer
gp_d = dsm.GaussianProcess(x, y, kernel=dsm.IsoSE(-1.0, 0.0), log_noise=-1.5).fit(mesh=mesh, block=32)
gp_s = dsm.GaussianProcess(x, y, kernel=dsm.IsoSE(-1.0, 0.0), log_noise=-1.5).fit()
assert abs(gp_d.mll() - gp_s.mll()) < 1e-7 * abs(gp_s.mll())
md, vd = gp_d.predict(xt); msd, vsd = gp_s.predict(xt)
assert np.max(np.abs(np.asarray(md) - np.asarray(msd))) < 1e-7
print("distributed GaussianProcess OK")

# finetune bucketed==monolithic end to end
m1 = dsm.build_dsmgp(x, y, V=2, K=2, M=20, kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0, seed=7)
m2 = dsm.build_dsmgp(x, y, V=2, K=2, M=20, kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0, seed=7)
h1 = dsm.finetune(m1, iterations=3, lam=1e-9, progress=False)
h2 = dsm.finetune(m2, iterations=3, lam=1e-9, progress=False, bucketed=True)
assert np.allclose(h1, h2, atol=1e-8) and np.allclose(np.asarray(m1.theta), np.asarray(m2.theta), atol=1e-8)
print("finetune bucketed path parity OK")

# serve: predictor + HTTP incl. 413 and chunked big batch
import json, threading, urllib.request, urllib.error
from deepstructuredmixtures_tpu.serve import Predictor, serve
p = Predictor(m1, warm_sizes=(16,), warm=True)
server = serve(p, port=0, max_body_bytes=2048)
port = server.server_address[1]
threading.Thread(target=server.serve_forever, daemon=True).start()
req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                             data=json.dumps({"x": [[0.3], [0.7]]}).encode())
out = json.loads(urllib.request.urlopen(req, timeout=30).read())
assert len(out["mean"]) == 2
big = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                             data=json.dumps({"x": [[0.5]] * 500}).encode())
try:
    urllib.request.urlopen(big, timeout=10); raise SystemExit("FAIL: no 413")
except urllib.error.HTTPError as e:
    assert e.code == 413
server.shutdown()
mu_big, var_big, _ = p.predict(np.linspace(0, 1, 57).reshape(-1, 1))  # chunked
assert np.all(np.isfinite(mu_big))
print("serve OK (predict, 413, chunked batch)")

# high-level train on the mesh: identical trajectory
m3 = dsm.build_dsmgp(x, y, V=2, K=2, M=25, kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0, seed=11)
m4 = dsm.build_dsmgp(x, y, V=2, K=2, M=25, kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0, seed=11)
import optax
ha = dsm.train(m3, optax.adam(5e-2), iterations=5, lam=1e-9, randinit=False, progress=False)
hb = dsm.train(m4, optax.adam(5e-2), iterations=5, lam=1e-9, randinit=False, progress=False, mesh=mesh)
assert np.allclose(ha, hb, atol=1e-9)
print("train(mesh=...) trajectory parity OK")

# per-call tau rebuild (≙ fit!(model; τ))
m3.rebuild_schedule(tau=1e-12)
m3.fit(method="shared")
assert np.isfinite(m3.mll())
print("rebuild_schedule OK")

# mixed-precision refined predict (ops/refine.py): f32 model, true-K f64
# residual refinement — runs, stays near the f32 answer, needs x64
import jax.numpy as jnp
m5 = dsm.build_dsmgp(x, y, V=2, K=2, M=25, kernel=dsm.IsoSE(0.0, 0.0),
                     log_noise=-2.0, seed=4, dtype=jnp.float32)
m5.update()
xr = np.linspace(0.1, 0.9, 13).reshape(-1, 1)
mr0, vr0 = m5.predict(xr)
mr2, vr2 = m5.predict(xr, refine_steps=2)
assert np.all(np.isfinite(np.asarray(mr2))) and np.all(np.asarray(vr2) > 0)
assert np.max(np.abs(np.asarray(mr2) - np.asarray(mr0))) < 1e-2
print("refined predict OK")

# multichip dryrun (train step + sharded fit + predict parity)
import __graft_entry__ as g
g.dryrun_multichip(8)
print("ALL CPU VERIFY CHECKS PASSED")
