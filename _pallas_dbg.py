import numpy as np, jax, jax.numpy as jnp
from deepstructuredmixtures_tpu.ops.pallas_chol import fused_gram_cholesky
L, N, D = 1, 256, 1
rng = np.random.default_rng(0)
nl = 200
x = np.zeros((L, N, D), np.float32)
x[0, :nl, 0] = np.sort(rng.uniform(0, 1, nl))
n = np.array([nl], np.int32)
out = np.asarray(fused_gram_cholesky(jnp.asarray(x), jnp.asarray(n),
      jnp.asarray([-0.5],np.float32), jnp.asarray([0.2],np.float32), jnp.asarray([0.05],np.float32)))
print("any nan:", np.isnan(out).any())
print("corner 3x3:\n", out[0,:3,:3])
print("pad corner:\n", out[0, nl:nl+3, nl:nl+3])
print("pad offdiag max:", np.abs(out[0, nl:, :nl]).max())
from deepstructuredmixtures_tpu.kernels import gram
K = np.asarray(gram("iso_se", jnp.asarray([-0.5]), jnp.asarray(0.2), jnp.asarray(x[0,:nl],dtype=jnp.float64), jnp.asarray(x[0,:nl],dtype=jnp.float64)))
K = K + (0.05+1e-8)*np.eye(nl)
Lref = np.linalg.cholesky(K)
print("err stats:", np.abs(out[0,:nl,:nl]-Lref).max(), np.abs(out[0,:nl,:nl]-Lref).mean())
print("ref corner:\n", Lref[:3,:3])
