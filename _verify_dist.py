"""Verify drive: distributed Cholesky path on the 8-device CPU mesh."""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from deepstructuredmixtures_tpu.parallel import make_mesh, sharded_gp_fit, sharded_cholesky
import scipy.linalg as sla

mesh = make_mesh(8)
N = 1024
rng = np.random.default_rng(0)
x = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
y = np.sin(x[:, 0] * 6) + 0.1 * rng.standard_normal(N)
alpha, mll = sharded_gp_fit(jnp.asarray(x), jnp.asarray(y), -1.0, 0.0, -1.5, mesh, block=128)
d2 = (x[:, None, 0] - x[None, :, 0]) ** 2
K = np.exp(0.0) * np.exp(-0.5 * d2 * np.exp(2.0))
K[np.diag_indices_from(K)] += np.exp(-3.0) + 1e-8
L = np.linalg.cholesky(K)
aref = sla.cho_solve((L, True), y)
mref = -0.5 * (y @ aref + 2 * np.log(np.diag(L)).sum() + N * np.log(2 * np.pi))
print("alpha err", np.abs(np.asarray(alpha) - aref).max(), "mll err", abs(float(mll) - mref))
assert np.abs(np.asarray(alpha) - aref).max() < 1e-6
assert abs(float(mll) - mref) < 1e-6 * abs(mref)
print("OK distributed giant-leaf GP fit on 8-device mesh, N=1024")
