"""Multi-chip scale-out via ``jax.sharding``.

The reference's only parallelism is shared-memory ``Threads.@threads`` over
leaves (``fit.jl:308``, ``optimize.jl:58,114``) — single process, no
distributed backend (SURVEY §2.3). The TPU-native equivalent is **expert
parallelism over the padded leaf-batch axis**: leaf covariances,
factorizations, solves and mlls shard across the device mesh
(``NamedSharding(mesh, P('experts'))``), XLA inserts the ICI collectives
for the tiny SPN logsumexp reductions, and the hyper vector stays
replicated. Test points shard the same way for prediction (data
parallelism over the test axis).

Everything here works identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) and a real TPU slice.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from .. import infer as inferlib
from ..fit import _noisy_gram
from ..hyper import HyperLayout
from ..leafgp import (
    LeafBatch,
    centered_y,
    leaf_mll,
    leaf_predict,
    posterior_from_chol,
)
from ..ops import cholesky as chol
from ..plan import SPNPlan

EXPERT_AXIS = "experts"


def make_mesh(n_devices: Optional[int] = None, axis: str = EXPERT_AXIS) -> Mesh:
    """1-D device mesh over the expert (leaf-batch) axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _pad_rows(a, rows: int):
    """Zero-pad a leading (leaf/row) axis up to ``rows``."""
    pad = rows - a.shape[0]
    if pad <= 0:
        return a
    z = jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)
    return jnp.concatenate([a, z], axis=0)


def pad_leaves(batch: LeafBatch, multiple: int) -> LeafBatch:
    """Pad the leaf axis to a multiple of the mesh size. Padding leaves are
    fully masked (identity covariance, zero targets) and are never
    referenced by the SPN plan, so they are exact no-ops."""
    L = batch.num_leaves
    rows = L + ((-L) % multiple)
    if rows == L:
        return batch
    return LeafBatch(*[_pad_rows(a, rows) for a in batch])


def shard_batch(batch: LeafBatch, mesh: Mesh, axis: str = EXPERT_AXIS) -> LeafBatch:
    """Pad to the mesh size and place each array sharded on the leaf axis."""
    n = mesh.shape[axis]
    batch = pad_leaves(batch, n)
    sh = NamedSharding(mesh, P(axis))
    return LeafBatch(*[jax.device_put(a, sh) for a in batch])


def make_sharded_mll_fn(
    layout: HyperLayout, plan: SPNPlan, batch: LeafBatch, mesh: Mesh,
    axis: str = EXPERT_AXIS,
):
    """``theta -> root mll`` with the leaf batch sharded over the mesh.

    The per-leaf factorizations run fully parallel across devices; only the
    [L]-vector of leaf mlls crosses the ICI for the (tiny) SPN upward pass.
    """
    L = plan.num_leaves
    sbatch = shard_batch(batch, mesh, axis)
    rep = NamedSharding(mesh, P())

    def f(theta):
        lm = _sharded_leaf_mll(layout, theta, sbatch)
        lm = jax.lax.with_sharding_constraint(lm, rep)
        return inferlib.root_mll(plan, lm[:L])

    return f, sbatch


def _sharded_leaf_mll(layout, theta, batch: LeafBatch):
    Kn = _noisy_gram(layout, theta, batch)
    Lf = jnp.linalg.cholesky(Kn)
    yc = centered_y(batch)
    alpha = chol.cho_solve_lower(Lf, yc)
    return leaf_mll(Lf, yc, alpha, batch)


def sharded_fit(layout, theta, batch: LeafBatch, mesh: Mesh,
                axis: str = EXPERT_AXIS):
    """Batched posterior fit with the leaf axis sharded over the mesh.
    Returns the (sharded) LeafPosterior."""
    sbatch = shard_batch(batch, mesh, axis)

    @jax.jit
    def f(theta, b):
        Kn = _noisy_gram(layout, theta, b)
        Lf = jnp.linalg.cholesky(Kn)
        return posterior_from_chol(Lf, b)

    return f(theta, sbatch)


def make_sharded_routed_predict(
    layout: HyperLayout,
    plan: SPNPlan,
    batch: LeafBatch,
    mesh: Mesh,
    axis: str = EXPERT_AXIS,
):
    """Routed DSMGP prediction with the leaf (expert) axis sharded.

    The heavy per-leaf work — covariance, Cholesky, solves, routed
    cross-covariances — shards across the mesh; only the [L]-vector of
    leaf mlls and the [L, tmax] routed moments cross the ICI for the
    (tiny) SPN weight update and log-space moment matching, which run
    replicated (≙ the single-device ``DSMGP.predict`` +
    ``update_weights`` pipeline).

    Returns ``(f, prepare)``: ``prepare(tidx, tmask)`` pads/places the
    routing arrays on the mesh; ``f(theta, xt, tidx_p, tmask_p)`` is
    jitted and returns ``(z_root, mean [T], var [T])``.
    """
    from ..models import _routed_moment_match

    L = plan.num_leaves
    sbatch = shard_batch(batch, mesh, axis)
    Lp = sbatch.num_leaves
    shl = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def prepare(tidx, tmask):
        ti = jax.device_put(_pad_rows(jnp.asarray(tidx), Lp), shl)
        tm = jax.device_put(_pad_rows(jnp.asarray(tmask), Lp), shl)
        return ti, tm

    @jax.jit
    def f(theta, xt, tidx_p, tmask_p):
        T = xt.shape[0]
        Kn = _noisy_gram(layout, theta, sbatch)
        Lf = jnp.linalg.cholesky(Kn)
        post = posterior_from_chol(Lf, sbatch)
        xt_leaf = xt[tidx_p]  # [Lp, tmax, D] sharded on leaves
        mu, var = leaf_predict(layout, theta, sbatch, post, xt_leaf)
        # replicate the small per-leaf results for the SPN combination
        mu = jax.lax.with_sharding_constraint(mu, rep)[:L]
        var = jax.lax.with_sharding_constraint(var, rep)[:L]
        mll = jax.lax.with_sharding_constraint(post.mll, rep)[:L]
        ti = jax.lax.with_sharding_constraint(tidx_p, rep)[:L]
        tm = jax.lax.with_sharding_constraint(tmask_p, rep)[:L]
        lw, z = inferlib.update_weights(plan, mll)
        mean, v = _routed_moment_match(plan, mu, var, lw, ti, tm, T)
        return z, mean, v

    return f, prepare


def sharded_bucketed_streamed_predict(
    layout: HyperLayout,
    theta,
    batches,
    leaf_ids,
    L: int,
    xt,
    tidx,
    tmask,
    mesh: Mesh,
    axis: str = EXPERT_AXIS,
    budget: int = 2 << 30,
):
    """The benchmark path — fused fit+predict over size buckets with
    factors recomputed chunk-wise and never persisted — sharded over the
    expert mesh: each device runs the chunked streaming loop over ITS
    leaves only (``shard_map``; zero cross-device traffic inside a
    bucket), and the per-leaf moments are scattered back replicated.

    Same signature/result as ``fit.bucketed_streamed_predict`` plus the
    mesh: ``(mu [L, tmax], var, mll [L])``.
    """
    from ..fit import default_chunk, streamed_leaf_predict

    ndev = mesh.shape[axis]
    T = xt.shape[0] if tidx is None else tidx.shape[1]
    dt = batches[0].x.dtype
    if tidx is None:
        # PoE-family: every leaf predicts all T points — expressed as a
        # trivial routing so one shard_map body serves both shapes.
        tidx = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (L, T))
        tmask = jnp.ones((L, T), dtype=bool)
    mu = jnp.zeros((L, T), dtype=dt)
    var = jnp.ones((L, T), dtype=dt)
    mll = jnp.zeros((L,), dtype=dt)
    tied = jnp.ndim(theta) == 1
    for b, ids in zip(batches, leaf_ids):
        nb = int(np.ceil(b.num_leaves / ndev)) * ndev
        bpad = pad_leaves(b, ndev)
        idx = jnp.asarray(ids)
        ti = _pad_rows(jnp.asarray(tidx)[idx], nb)
        tm = _pad_rows(jnp.asarray(tmask)[idx], nb)
        th = theta if tied else _pad_rows(theta[idx], nb)
        local_rows = nb // ndev
        chunk = max(1, min(default_chunk(b.nmax, dt, budget), local_rows))

        bspec = LeafBatch(*([P(axis)] * len(bpad)))
        tspec = P() if tied else P(axis)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(bspec, tspec, P(), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )
        def run(b_loc, th_loc, xt_all, ti_loc, tm_loc):
            return streamed_leaf_predict(
                layout, th_loc, b_loc, xt_all, ti_loc, tm_loc, chunk=chunk
            )

        mu_b, var_b, mll_b = run(bpad, th, jnp.asarray(xt, dt), ti, tm)
        nb_true = idx.shape[0]
        mu = mu.at[idx].set(mu_b[:nb_true])
        var = var.at[idx].set(var_b[:nb_true])
        mll = mll.at[idx].set(mll_b[:nb_true])
    return mu, var, mll


def make_sharded_value_and_grad_bucketed(
    layout: HyperLayout,
    plan: SPNPlan,
    batches,
    leaf_ids,
    mesh: Mesh,
    axis: str = EXPERT_AXIS,
    budget: int = 2 << 30,
    chunk: Optional[int] = None,
):
    """Exact ``theta -> (root mll, grad)`` for size-bucketed (large)
    models with the LEAF axis sharded across the mesh and per-device
    chunked rematerialization — multi-chip *training* at the headline
    scale. The round-2 mesh path materialized each device's whole-shard
    ``[L/ndev, Nmax, Nmax]`` covariances at once (so 8 chips could not
    train what 1 chip streams); here every device runs the chunked
    ``leaf_mlls_fn`` loop over its own leaves, exactly like the
    single-device per-bucket path.

    Same chain-rule factoring as ``train.make_value_and_grad_bucketed``:
    forward leaf mlls per bucket (sharded), responsibilities from the
    tiny replicated SPN pass, then one sharded VJP per bucket with
    cotangent ``resp`` and a ``psum`` over the mesh for the [P] gradient.
    Reference role: the leaf-parallel training loop
    (``optimisers.jl:4-87``) scaled over ICI instead of threads.
    """
    from ..fit import _bucket_chunk
    from ..train import leaf_mlls_fn

    L = plan.num_leaves
    ndev = mesh.shape[axis]
    bspec = LeafBatch(*([P(axis)] * 6))
    entries = []
    for b, ids in zip(batches, leaf_ids):
        sb = shard_batch(b, mesh, axis)
        rows = sb.num_leaves // ndev  # leaves per device
        c = chunk if chunk is not None else _bucket_chunk(
            b.nmax, rows, b.x.dtype, budget
        )
        c = max(1, min(c, rows))

        def fwd(b_loc, th, c=c, rows=rows):
            return leaf_mlls_fn(layout, b_loc, c if c < rows else None)(th)

        fwd_sh = jax.jit(shard_map(
            fwd, mesh=mesh, in_specs=(bspec, P()), out_specs=P(axis),
            check_vma=False,
        ))

        def vjp(b_loc, th, rw_loc, c=c, rows=rows):
            f = leaf_mlls_fn(layout, b_loc, c if c < rows else None)
            g = jax.grad(lambda t: jnp.vdot(rw_loc, f(t)))(th)
            return jax.lax.psum(g, axis)

        vjp_sh = jax.jit(shard_map(
            vjp, mesh=mesh, in_specs=(bspec, P(), P(axis)), out_specs=P(),
            check_vma=False,
        ))
        entries.append(
            (fwd_sh, vjp_sh, sb, jnp.asarray(ids), b.num_leaves,
             sb.num_leaves)
        )

    root_fn = jax.jit(lambda mll: inferlib.root_mll(plan, mll))
    resp_fn = jax.jit(lambda mll: inferlib.leaf_responsibilities(plan, mll))

    def vg(theta):
        mll = jnp.zeros((L,), theta.dtype)
        for fwd_sh, _, sb, ids, nv, _ in entries:
            mll = mll.at[ids].set(fwd_sh(sb, theta)[:nv])
        value = root_fn(mll)
        r = resp_fn(mll)
        g = None
        for _, vjp_sh, sb, ids, nv, rows_tot in entries:
            rw = jnp.zeros((rows_tot,), theta.dtype).at[:nv].set(r[ids])
            gb = vjp_sh(sb, theta, rw)
            g = gb if g is None else g + gb
        return value, g

    return vg


def make_sharded_train_step(
    layout: HyperLayout,
    plan: SPNPlan,
    batch: LeafBatch,
    mesh: Mesh,
    optimizer=None,
    axis: str = EXPERT_AXIS,
):
    """One jitted multi-chip training step: sharded leaf factorizations,
    replicated hyper vector, mll-ascent optax update.

    Returns ``(step, init_state, sharded_batch)`` where
    ``step(theta, opt_state) -> (mll, theta', opt_state')``.
    """
    optimizer = optimizer or optax.adam(1e-3)
    mll_fn, sbatch = make_sharded_mll_fn(layout, plan, batch, mesh, axis)
    vg = jax.value_and_grad(mll_fn)

    @jax.jit
    def step(theta, opt_state):
        val, g = vg(theta)
        updates, opt_state = optimizer.update(-g, opt_state, theta)
        return val, optax.apply_updates(theta, updates), opt_state

    def init(theta):
        return optimizer.init(theta)

    return step, init, sbatch
