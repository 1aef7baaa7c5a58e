import time, numpy as np
import jax, jax.numpy as jnp
from jax import lax

n = 11136  # ~bucket size, mult of 128
rng = np.random.default_rng(0)
x = jnp.asarray(np.sort(rng.uniform(0, 1, n)).reshape(-1, 1).astype(np.float32))
y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
HI = jax.lax.Precision.HIGHEST

def gram(x):
    n1 = jnp.sum(x*x, -1)
    cross = jnp.matmul(x, x.T, precision=HI)
    d2 = jnp.maximum(n1[:,None]+n1[None,:]-2*cross, 0.0)
    return jnp.exp(-0.5*d2*np.exp(1.0)) + 0.2*jnp.eye(n)

def chol(K): return jnp.linalg.cholesky(K)
def alpha(L, y):
    z = lax.linalg.triangular_solve(L, y[:,None], left_side=True, lower=True)
    return lax.linalg.triangular_solve(L, z, left_side=True, lower=True, transpose_a=True)[:,0]

fg = jax.jit(gram); K = fg(x); _=float(K[0,0])
fc = jax.jit(chol); L = fc(K); _=float(L[0,0])
fa = jax.jit(alpha); a = fa(L, y); _=float(a[0])
ffit = jax.jit(lambda x, y: alpha(chol(gram(x)), y))
_ = float(ffit(x, y)[0])

def t(f, *a):
    ts=[]
    for _i in range(3):
        t0=time.perf_counter(); o=f(*a); _=float(o.reshape(-1)[0]); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3
print(f"gram  {t(fg,x):8.1f} ms")
print(f"chol  {t(fc,K):8.1f} ms")
print(f"alpha {t(fa,L,y):8.1f} ms")
print(f"fused {t(ffit,x,y):8.1f} ms")
