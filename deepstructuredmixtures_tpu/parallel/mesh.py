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

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import infer as inferlib
from ..fit import _noisy_gram
from ..hyper import HyperLayout
from ..leafgp import LeafBatch, centered_y, leaf_mll, posterior_from_chol
from ..ops import cholesky as chol
from ..plan import SPNPlan

EXPERT_AXIS = "experts"


def make_mesh(n_devices: Optional[int] = None, axis: str = EXPERT_AXIS) -> Mesh:
    """1-D device mesh over the expert (leaf-batch) axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def pad_leaves(batch: LeafBatch, multiple: int) -> LeafBatch:
    """Pad the leaf axis to a multiple of the mesh size. Padding leaves are
    fully masked (identity covariance, zero targets) and are never
    referenced by the SPN plan, so they are exact no-ops."""
    L = batch.num_leaves
    pad = (-L) % multiple
    if pad == 0:
        return batch

    def pad_arr(a):
        padding = jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)
        return jnp.concatenate([a, padding], axis=0)

    return LeafBatch(*[pad_arr(a) for a in batch])


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
