import numpy as np, jax, jax.numpy as jnp, time
from deepstructuredmixtures_tpu.ops.pallas_chol import fused_gram_cholesky
from deepstructuredmixtures_tpu.ops import cholesky as chol
from deepstructuredmixtures_tpu.kernels import gram

L, N, D = 8, 512, 1
rng = np.random.default_rng(0)
x = np.zeros((L, N, D), np.float32)
n = np.zeros(L, np.int32)
for l in range(L):
    nl = int(rng.integers(N//2, N))
    x[l, :nl, 0] = np.sort(rng.uniform(0, 1, nl))
    n[l] = nl
logl = np.full(L, -0.5, np.float32); logsig = np.full(L, 0.2, np.float32)
noise = np.full(L, 0.05, np.float32)

out = fused_gram_cholesky(jnp.asarray(x), jnp.asarray(n), jnp.asarray(logl), jnp.asarray(logsig), jnp.asarray(noise))
out = np.asarray(jax.block_until_ready(out))

# oracle
maxerr = 0
for l in range(L):
    nl = n[l]
    K = np.asarray(gram("iso_se", jnp.asarray([logl[l]]), jnp.asarray(logsig[l]), jnp.asarray(x[l,:nl]), jnp.asarray(x[l,:nl])))
    K = K + (noise[l] + 1e-8)*np.eye(nl)
    Lref = np.linalg.cholesky(K.astype(np.float64))
    err = np.abs(out[l,:nl,:nl] - Lref).max()
    pad_ok = np.allclose(out[l,nl:,nl:], np.eye(N-nl), atol=1e-6) and np.allclose(out[l,:nl,nl:],0)
    maxerr = max(maxerr, err)
    assert pad_ok, f"padding wrong leaf {l}"
print("pallas fused max err vs f64 oracle:", maxerr)

# timing vs XLA path
xj = jnp.asarray(x); nj = jnp.asarray(n)
f_pallas = jax.jit(lambda: fused_gram_cholesky(xj, nj, jnp.asarray(logl), jnp.asarray(logsig), jnp.asarray(noise)))
def xla_path():
    d2 = jnp.sum(xj*xj,-1)[:,:,None] + jnp.sum(xj*xj,-1)[:,None,:] - 2*jnp.einsum('lnd,lmd->lnm',xj,xj)
    K = jnp.exp(2*0.2)*jnp.exp(-0.5*jnp.maximum(d2,0)*jnp.exp(1.0))
    mask = jnp.arange(N)[None,:] < nj[:,None]
    K = chol.masked_gram_noise(K, mask, 0.05, 1e-8)
    return jnp.linalg.cholesky(K)
f_xla = jax.jit(xla_path)
for f, name in [(f_pallas,"pallas"),(f_xla,"xla")]:
    r = jax.block_until_ready(f())
    t0=time.perf_counter()
    for _ in range(20): r = f()
    jax.block_until_ready(r)
    print(name, (time.perf_counter()-t0)/20*1e3, "ms")
