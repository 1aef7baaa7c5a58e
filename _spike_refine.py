"""Spike: mixed-precision iterative refinement of the GP quad term on TPU.

f32 factorization (as production) + k refinement steps whose residual is
computed against a FRESH float64 gram built on the fly (O(n^2) emulated-f64
work per step — the O(n^3) factorization stays f32). Round 2 measured that
refinement against the STORED f32 matrix changes nothing (the error IS the
f32 rounding of the stored entries); this spike measures whether a true-K
residual converges, what it costs, and whether the mixed f32/f64 program
compiles under the axon tunnel.
"""
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

N = 8192
LOGL, LOGSIGMA, LOGNOISE = 0.0, 0.0, -1.0
EPS = 1e-8

rng = np.random.default_rng(0)
x = np.sort(rng.uniform(0.0, 1.0, N))
y = np.sin(x * 4 * np.pi) + rng.normal(0.0, 0.5, N)

# ---- CPU f64 oracle --------------------------------------------------------
d2 = (x[:, None] - x[None, :]) ** 2
K64 = np.exp(2 * LOGSIGMA) * np.exp(-0.5 * d2 * np.exp(-2 * LOGL))
noise = float(np.exp(2 * LOGNOISE))
K64[np.diag_indices(N)] += noise + EPS
L64 = np.linalg.cholesky(K64)
import scipy.linalg as sla

alpha64 = sla.cho_solve((L64, True), y)
quad_true = float(y @ alpha64)
logdet_true = 2 * float(np.log(np.diag(L64)).sum())
print(f"oracle quad={quad_true:.10e} logdet={logdet_true:.10e}")

# ---- TPU program -----------------------------------------------------------
CHUNK = 1024  # rows of the f64 gram per map step


def gram_row_block_f64(xb, xall, alpha):
    """[C] rows of the true-K (f64) matvec K @ alpha."""
    d2b = (xb[:, None] - xall[None, :]) ** 2
    Kb = jnp.exp(2.0 * LOGSIGMA) * jnp.exp(-0.5 * d2b * jnp.exp(-2.0 * LOGL))
    return Kb @ alpha


def refined(xd, yd, steps: int):
    x32 = xd.astype(jnp.float32)
    y32 = yd.astype(jnp.float32)
    d2_ = (x32[:, None] - x32[None, :]) ** 2
    K32 = jnp.exp(jnp.float32(2 * LOGSIGMA)) * jnp.exp(
        -0.5 * d2_ * jnp.exp(jnp.float32(-2 * LOGL))
    )
    K32 = K32 + (noise + EPS) * jnp.eye(N, dtype=jnp.float32)
    Lf = lax.linalg.cholesky(K32)
    a0 = lax.linalg.triangular_solve(
        Lf, lax.linalg.triangular_solve(
            Lf, y32[:, None], lower=True, left_side=True
        ),
        lower=True, left_side=True, transpose_a=True,
    )[:, 0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lf)))

    x64 = xd  # f64
    y64 = yd

    def matvec64(alpha):
        def body(i):
            xb = lax.dynamic_slice_in_dim(x64, i * CHUNK, CHUNK)
            out = gram_row_block_f64(xb, x64, alpha)
            return out
        blocks = lax.map(body, jnp.arange(N // CHUNK))
        return blocks.reshape(-1) + (noise + EPS) * alpha

    alpha = a0.astype(jnp.float64)
    quads = []
    for _ in range(steps):
        r = y64 - matvec64(alpha)
        d = lax.linalg.triangular_solve(
            Lf, lax.linalg.triangular_solve(
                Lf, r.astype(jnp.float32)[:, None], lower=True, left_side=True
            ),
            lower=True, left_side=True, transpose_a=True,
        )[:, 0]
        alpha = alpha + d.astype(jnp.float64)
        quads.append(jnp.dot(y64, alpha))
    qs = jnp.stack(quads) if quads else jnp.zeros((0,), jnp.float64)
    return jnp.dot(y32.astype(jnp.float64), a0.astype(jnp.float64)), qs, logdet


STEPS = 3
f = jax.jit(lambda xd, yd: refined(xd, yd, STEPS))
xd = jnp.asarray(x)
yd = jnp.asarray(y)
t0 = time.perf_counter()
q0, qs, ld = f(xd, yd)
q0 = float(q0)
print(f"compile+run: {time.perf_counter()-t0:.1f} s")
qs = np.asarray(qs)
print(f"f32 quad rel err: {abs(q0-quad_true)/abs(quad_true):.3e}")
for k, q in enumerate(qs):
    print(f"after step {k+1}: rel err {abs(q-quad_true)/abs(quad_true):.3e}")
print(f"logdet rel err (f32): {abs(float(ld)-logdet_true)/abs(logdet_true):.3e}")

# timing: fenced reruns
for tag, steps in (("0 steps", 0), (f"{STEPS} steps", STEPS)):
    g = jax.jit(lambda xd, yd, s=steps: refined(xd, yd, s))
    out = g(xd, yd)
    _ = float(out[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = g(xd, yd)
        _ = float(out[0])  # d2h fence
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: min {min(ts)*1e3:.1f} ms")
