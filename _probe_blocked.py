import time, numpy as np
import jax, jax.numpy as jnp
from jax import lax
HI = jax.lax.Precision.HIGHEST

def blocked_cholesky(K, block=1024):
    """Right-looking blocked Cholesky, static python panel loop, batched."""
    N = K.shape[-1]
    out = jnp.zeros_like(K)
    for s in range(0, N, block):
        b = min(block, N - s)
        D = K[..., s:s+b, s:s+b]
        Lbb = jnp.linalg.cholesky(D)
        out = out.at[..., s:s+b, s:s+b].set(Lbb)
        if s + b < N:
            E = K[..., s+b:, s:s+b]
            T = lax.linalg.triangular_solve(Lbb, E, left_side=False, lower=True, transpose_a=True)
            out = out.at[..., s+b:, s:s+b].set(T)
            TT = jax.numpy.matmul(T, jnp.swapaxes(T, -1, -2), precision=HI)
            K = K.at[..., s+b:, s+b:].add(-TT)
    return out

def loop_time(f, K, iters=8):
    @jax.jit
    def g(K):
        def body(i, acc):
            L = f(K + acc * 1e-30)
            return jnp.sum(L[..., -1, -1])
        return lax.fori_loop(0, iters, body, 0.0)
    _ = float(g(K))
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); _ = float(g(K)); ts.append(time.perf_counter()-t0)
    return min(ts) / iters * 1e3

n = 11136
rng = np.random.default_rng(0)
x = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
d2 = (x[:, None] - x[None, :])**2
K = np.exp(-0.5 * d2 * np.e) + 0.2 * np.eye(n, dtype=np.float32)
Kd = jnp.asarray(K)

# correctness
L1 = np.asarray(jax.jit(lambda K: blocked_cholesky(K, 1024))(Kd))
Lr = np.linalg.cholesky(K.astype(np.float64))
print("blocked f32 vs f64 oracle max err:", np.abs(L1 - Lr).max(), flush=True)

print(f"xla cholesky     : {loop_time(jnp.linalg.cholesky, Kd):7.1f} ms", flush=True)
for B in [512, 1024, 1856]:
    print(f"blocked B={B:5d}  : {loop_time(lambda K, B=B: blocked_cholesky(K, B), Kd):7.1f} ms", flush=True)
