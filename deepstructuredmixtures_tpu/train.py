"""Hyperparameter training and fine-tuning.

TPU-native equivalent of the reference L4 layer:

* ``train`` (≙ ``train!``, ``optimisers.jl:4-87``): gradient *ascent* on the
  root marginal log-likelihood w.r.t. one tied hyper vector, with any optax
  optimizer (replacing Flux ``Optimise.apply!``) and the reference's
  moving-window early stopping (δ = |ℓ_i − mean(ℓ_{i−9..i−1})| < λ for
  ``earlystop`` consecutive iterations, ``optimisers.jl:53-66``).
  Gradients come from autodiff of the jitted fit+upward program — exactly
  the responsibility-weighted sum the reference assembles by hand
  (``optimize.jl:42-89``), without its σ-scaling defect (see kernels.py).
* ``train_gp`` (≙ single-GP ``train!``, ``optimisers.jl:89-145``) with NaN
  rollback.
* ``finetune`` (≙ ``finetune!``, ``finetuning.jl:3-88``): unties the hyper
  vector per leaf. The reference's within-iteration round-robin updates are
  independent across leaves (each leaf's candidate vector is applied to the
  whole tree and only that leaf's entry is updated), so all L candidate
  evaluations run as one batched/chunked program per iteration. The
  overlap-row weighting (``optimize.jl:92-150``) is realized with a
  stop-gradient surrogate on the leaf mll vector. NOTE: the reference
  builds ``Dd`` with unit diagonal (``finetuning.jl:30-31``) but then
  passes ``D`` (zero diagonal) — zeroing each leaf's own-gradient
  contribution; we default to the evident intent (``self_weight=1.0``).

Memory: for large models the mll+gradient is evaluated in leaf chunks with
``jax.checkpoint`` rematerialization, so peak memory is
``O(chunk · Nmax²)`` instead of ``O(L · Nmax²)``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from . import infer as inferlib
from .fit import _noisy_gram
from .hyper import HyperLayout
from .leafgp import LeafBatch, centered_y, leaf_mll_forward
from .ops import cholesky as chol
from .plan import SPNPlan


class _Progress:
    """Live single-line training display (≙ ProgressMeter,
    ``optimisers.jl:25,54,122``: iteration / δ / llh refreshed in place).

    ``enable=None`` auto-enables on a TTY stderr; an explicit bool forces.
    """

    def __init__(self, label: str, total: int, enable=None):
        import sys

        self.label = label
        self.total = total
        self.out = sys.stderr
        self.on = self.out.isatty() if enable is None else bool(enable)
        self._dirty = False

    def show(self, it: int, value: float, delta: float):
        if not self.on:
            return
        d = f"{delta:.4g}" if np.isfinite(delta) else "--"
        self.out.write(
            f"\r[{self.label}] iter {it + 1}/{self.total}  "
            f"llh={value:.4f}  delta={d}   "
        )
        self.out.flush()
        self._dirty = True

    def close(self, note: str = ""):
        if self.on and self._dirty:
            self.out.write(note + "\n")
            self.out.flush()


# ---------------------------------------------------------------------------
# Leaf mll as a pure function of the hyper vector (chunked + rematerialized)
# ---------------------------------------------------------------------------


def _chunk_leaf_mll(layout, theta, batch: LeafBatch):
    """mll of every leaf in ``batch`` under hyper ``theta`` ([P] or [C, P]).

    Forward solve only: ``y'α = ||L^{-1}y||²`` — the alpha (transposed)
    solve is skipped, halving the latency-bound triangular-solve cost of
    every training step (autodiff flows through the forward solve)."""
    Kn = _noisy_gram(layout, theta, batch)
    Lf = jnp.linalg.cholesky(Kn)
    yc = centered_y(batch)
    z = chol.solve_lower(Lf, yc[..., None])[..., 0]
    return leaf_mll_forward(Lf, z, batch)


def leaf_mlls_fn(layout: HyperLayout, batch: LeafBatch, chunk: Optional[int]):
    """Returns ``f(theta) -> [L]`` computing all leaf mlls, chunked with
    rematerialization when ``chunk`` is set."""
    L = batch.num_leaves
    if chunk is None or chunk >= L:
        return lambda theta: _chunk_leaf_mll(layout, theta, batch)

    pad = (-L) % chunk

    def pad_leaf(a):
        return jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0) if pad else a

    bpad = LeafBatch(*[pad_leaf(a) for a in batch])
    nchunks = bpad.num_leaves // chunk

    @jax.checkpoint
    def body(theta, i):
        sl = lambda a: lax.dynamic_slice_in_dim(a, i * chunk, chunk, axis=0)
        b = LeafBatch(*[sl(a) for a in bpad])
        th = theta if theta.ndim == 1 else sl(theta)
        return _chunk_leaf_mll(layout, th, b)

    def f(theta):
        vals = lax.map(lambda i: body(theta, i), jnp.arange(nchunks))
        return vals.reshape(-1)[:L]

    return f


def make_mll_fn(layout, plan: SPNPlan, batch: LeafBatch, chunk=None):
    """``theta -> root mll`` (tied hypers, uniform sum weights)."""
    lf = leaf_mlls_fn(layout, batch, chunk)

    def f(theta):
        return inferlib.root_mll(plan, lf(theta))

    return f


def make_mll_fn_bucketed(layout, plan: SPNPlan, batches, leaf_ids,
                         budget: int = 2 << 30):
    """``theta -> root mll`` over size-bucketed batches (large models)."""
    from .fit import bucketed_leaf_mlls

    L = plan.num_leaves

    def f(theta):
        mll = bucketed_leaf_mlls(layout, theta, batches, leaf_ids, L, budget)
        return inferlib.root_mll(plan, mll)

    return f


def _build_bucket_fns(layout, batches, leaf_ids, budget: int):
    """Per-bucket jitted (forward leaf-mlls, cotangent-VJP) program pairs +
    index arrays — the shared scaffolding of the bucketed training and
    finetune paths (one small compiled program per size bucket; the
    cotangent of the VJP is whatever per-leaf weighting the caller needs).
    """
    from .fit import _bucket_chunk

    fwd_fns, vg_fns, idx = [], [], []
    for b, ids in zip(batches, leaf_ids):
        chunk = _bucket_chunk(b.nmax, b.num_leaves, b.x.dtype, budget)
        f = leaf_mlls_fn(layout, b, chunk if chunk < b.num_leaves else None)
        fwd_fns.append(jax.jit(f))
        vg_fns.append(
            jax.jit(jax.grad(lambda theta, rw, f=f: jnp.vdot(rw, f(theta))))
        )
        idx.append(jnp.asarray(ids))
    return fwd_fns, vg_fns, idx


def make_value_and_grad_bucketed(layout, plan: SPNPlan, batches, leaf_ids,
                                 budget: int = 2 << 30):
    """Exact ``theta -> (root mll, grad)`` with ONE compiled program per
    size bucket instead of a monolith.

    Differentiating the all-buckets objective as a single jit makes the
    XLA compile footprint grow with the bucket count (observed compiler
    OOM at N=100k / 13 buckets). The chain rule factors exactly through
    the SPN: ``d root/dθ = Σ_l r_l · d mll_l/dθ`` with the leaf
    responsibilities ``r = ∂root/∂mll`` (``infer.leaf_responsibilities`` —
    precisely the weights the reference's hand propagation uses,
    ``optimize.jl:42-89``). So: (1) forward leaf mlls per bucket,
    (2) responsibilities from the tiny SPN pass, (3) per-bucket VJP of
    ``r_b · mll_b(θ)`` — each its own small program.
    """
    L = plan.num_leaves
    fwd_fns, vg_fns, idx = _build_bucket_fns(layout, batches, leaf_ids, budget)

    root_fn = jax.jit(lambda mll: inferlib.root_mll(plan, mll))
    resp_fn = jax.jit(lambda mll: inferlib.leaf_responsibilities(plan, mll))

    def vg(theta):
        mll = jnp.zeros((L,), theta.dtype)
        for f, ids in zip(fwd_fns, idx):
            mll = mll.at[ids].set(f(theta))
        value = root_fn(mll)
        r = resp_fn(mll)
        grad = None
        for g, ids in zip(vg_fns, idx):
            gb = g(theta, r[ids])
            grad = gb if grad is None else grad + gb
        return value, grad

    return vg


# ---------------------------------------------------------------------------
# train! — tied hyperparameters
# ---------------------------------------------------------------------------


def train(
    model,
    optimizer=None,
    iterations: int = 10_000,
    lam: float = 0.05,
    randinit: bool = True,
    earlystop: int = 10,
    chunk: Optional[int] = None,
    seed=None,
    verbose: bool = False,
    progress=None,
    mesh=None,
):
    """Train tied hyperparameters by mll ascent (≙ ``train!``,
    ``optimisers.jl:4-87``). Mutates ``model.theta``, refits, and returns
    the mll history array.

    ``progress``: live single-line iteration/llh/δ display (≙ ProgressMeter,
    ``optimisers.jl:25,54``); ``None`` auto-enables on a TTY.

    ``mesh``: a ``jax.sharding.Mesh`` runs every training step
    expert-parallel across the devices (leaf factorizations sharded,
    hypers replicated, ICI collectives for the SPN reduction — see
    ``parallel.mesh``); identical mathematics, same history. Bucketed
    models (any standard build) stream each device's leaves chunk-wise
    within a memory budget, so the mesh path trains at the same scale
    the single-device per-bucket path does; ``chunk=`` overrides the
    per-device leaf chunk."""
    optimizer = optimizer or optax.adam(1e-3)
    # NOTE: model.batch (the monolithic [L, nmax] leaf batch) is lazy and
    # mostly padding at scale — only the non-bucketed fallback paths below
    # may touch it.
    layout, plan = model.layout, model.plan
    P = model.theta.shape[-1]
    rng = np.random.default_rng(seed)
    theta = (
        jnp.asarray(rng.standard_normal(P), dtype=model.dtype)
        if randinit
        else model.theta
    )

    bucketed = chunk is None and getattr(model, "bucket_batches", None) is not None
    # Large buckets: differentiate per bucket (separate compiled programs,
    # exact via the SPN chain rule) — a monolithic grad over many big
    # Cholesky programs exhausts the XLA compiler (see
    # make_value_and_grad_bucketed).
    per_bucket = bucketed and max(
        b.nmax for b in model.bucket_batches
    ) >= 4096
    if mesh is not None:
        if theta.ndim != 1:
            raise ValueError(
                "train(mesh=...) requires tied hypers (theta 1-D); the "
                "sharded batch is padded past the leaf count, which a "
                "per-leaf theta matrix cannot follow — train untied "
                "models on the single-device per-bucket path"
            )
        if getattr(model, "bucket_batches", None) is not None:
            # leaf axis sharded + per-device chunked streaming: trains at
            # the headline scale on any mesh size (see
            # parallel.mesh.make_sharded_value_and_grad_bucketed);
            # chunk= overrides the per-device leaf chunk
            from .parallel.mesh import make_sharded_value_and_grad_bucketed

            vg = make_sharded_value_and_grad_bucketed(
                layout, plan, model.bucket_batches,
                model.bucket_spec.leaf_ids, mesh, chunk=chunk,
            )
        else:
            if chunk is not None:
                raise ValueError(
                    "train(mesh=...) without bucket batches does not "
                    "chunk (each device holds its shard's covariances at "
                    "once); drop chunk= or drop mesh="
                )
            from .parallel.mesh import make_sharded_mll_fn

            f, _ = make_sharded_mll_fn(layout, plan, model.batch, mesh)
            vg = jax.jit(jax.value_and_grad(f))
    elif per_bucket:
        vg = make_value_and_grad_bucketed(
            layout, plan, model.bucket_batches, model.bucket_spec.leaf_ids
        )
    elif bucketed:
        vg = jax.jit(jax.value_and_grad(make_mll_fn_bucketed(
            layout, plan, model.bucket_batches, model.bucket_spec.leaf_ids
        )))
    else:
        vg = jax.jit(jax.value_and_grad(
            make_mll_fn(layout, plan, model.batch, chunk)
        ))

    @jax.jit
    def apply(g, opt_state, theta):
        # ascent: feed the negative gradient to the (descent-convention)
        # optax transform (≙ apply! + hyp += grad, optimisers.jl:78-79)
        updates, opt_state = optimizer.update(-g, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state

    def step(theta, opt_state):
        val, g = vg(theta)
        new_theta, opt_state = apply(g, opt_state, theta)
        return val, new_theta, opt_state

    opt_state = optimizer.init(theta)
    hist = np.zeros(iterations)
    c = 0
    n_hist = 0
    bar = _Progress("train", iterations, progress)
    for it in range(iterations):
        val, new_theta, opt_state = step(theta, opt_state)
        hist[it] = float(val)
        if not np.isfinite(hist[it]):
            # keep last finite hypers (mirrors the single-GP NaN rollback);
            # n_hist is not advanced, so the non-finite value stays out of
            # the returned history
            break
        n_hist = it + 1
        theta = new_theta
        delta = (
            abs(hist[it] - hist[it - 10 : it - 1].mean()) if it >= 10 else np.inf
        )
        bar.show(it, hist[it], delta)
        if verbose and it % 50 == 0:
            print(f"[train] iter={it} mll={hist[it]:.4f} delta={delta:.4g}")
        c = c + 1 if delta < lam else 0
        if c >= earlystop:
            break
    bar.close(f" (stopped after {n_hist} iterations)")

    if iterations > 0 and n_hist == 0:
        # The very first step produced a non-finite mll: there is no finite
        # trajectory to report and callers index hist[-1]. Fail loudly
        # instead of returning an empty history (model hypers are left at
        # their pre-train values).
        raise RuntimeError(
            "train: the marginal log-likelihood was non-finite at the "
            "first iteration; check the initial hyperparameters / data "
            "scaling (or pass randinit=False with known-good hypers)"
        )
    model.set_params(theta)
    model.fit()
    return hist[:n_hist]


def train_gp(
    gp,
    iterations: int = 10_000,
    optimizer=None,
    lam: float = 0.1,
    randinit: bool = True,
    seed=None,
    progress=None,
):
    """Train a standalone exact GP (≙ single-GP ``train!``,
    ``optimisers.jl:89-145``) with NaN rollback. Single-device only (see
    ``GaussianProcess.grad_mll``)."""
    if getattr(gp, "_mesh", None) is not None:
        raise NotImplementedError(
            "train_gp is single-device only; a mesh-fitted GP's [N, N] "
            "covariance cannot be rebuilt on one chip for the gradient — "
            "train hypers at single-device scale, then fit(mesh=...)"
        )
    optimizer = optimizer or optax.rmsprop(1e-3)
    rng = np.random.default_rng(seed)
    theta = (
        jnp.asarray(rng.standard_normal(gp.theta.shape[0]), dtype=gp.x.dtype)
        if randinit
        else gp.theta
    )
    kind, nl = gp.kernel.kind, gp.nl

    from .gp import _mll

    vg = jax.jit(
        jax.value_and_grad(lambda th: _mll(kind, nl, th, gp.x, gp.yc))
    )

    @jax.jit
    def step(theta, opt_state):
        val, g = vg(theta)
        updates, opt_state = optimizer.update(-g, opt_state, theta)
        return val, optax.apply_updates(theta, updates), opt_state

    opt_state = optimizer.init(theta)
    hist = np.zeros(iterations)
    old = theta
    n_hist = 0
    bar = _Progress("train_gp", iterations, progress)
    for it in range(iterations):
        val, new_theta, opt_state = step(theta, opt_state)
        hist[it] = float(val)
        if np.isnan(hist[it]):
            theta = old  # rollback (optimisers.jl:115-119)
            break
        n_hist = it + 1
        delta = (
            abs(hist[it] - hist[it - 10 : it - 1].mean()) if it >= 10 else np.inf
        )
        bar.show(it, hist[it], delta)
        old = theta
        theta = new_theta
        if delta < lam:
            break
    bar.close()

    if iterations > 0 and n_hist == 0:
        raise RuntimeError(
            "train_gp: the marginal log-likelihood was non-finite at the "
            "first iteration (nothing to roll back to); check the initial "
            "hyperparameters / data scaling"
        )
    gp.set_params(theta)
    gp.fit()
    return hist[:n_hist]


# ---------------------------------------------------------------------------
# finetune! — per-leaf (untied) hyperparameters
# ---------------------------------------------------------------------------


def _weighted_root_mll(layout, plan, batch, theta, w):
    """Root mll where leaf mll gradients are scaled by ``w [L]`` via a
    stop-gradient surrogate (≙ the D-row weighting in ``∇mll!``,
    ``optimize.jl:92-150``): the value equals the true root mll, while
    d(root)/dθ = Σ_l resp_l · w_l · d(mll_l)/dθ."""
    lm = _chunk_leaf_mll(layout, theta, batch)
    sg = lax.stop_gradient(lm)
    lm_w = sg + w * (lm - sg)
    vals = inferlib.upward(plan, lm_w)
    return vals[plan.root_slot], lm


def make_finetune_vg_bucketed(layout, plan: SPNPlan, batches, leaf_ids,
                              budget: int = 2 << 30, mesh=None,
                              axis: str = "experts", cand_map: int = 8,
                              sparse: Optional[bool] = None,
                              pair_map: int = 8):
    """ALL finetune candidates ``(H [C, P], W [C, L]) -> (leaf mlls
    [C, L], grads [C, P])`` through the size-bucketed chunked programs —
    the large-model finetune path (the monolithic vmapped candidate pass
    OOMs at N=100k).

    Same chain-rule factoring as :func:`make_value_and_grad_bucketed`:
    candidate j's D-row-weighted gradient is exactly
    ``Σ_l resp_l · w_jl · d mll_l/dθ`` (the stop-gradient surrogate of
    ``_weighted_root_mll``, ≙ ``optimize.jl:92-150``), so it decomposes
    into one VJP per bucket with cotangent ``resp · w``.

    Candidates are evaluated ``cand_map`` at a time with ``lax.map``
    INSIDE each per-bucket program — peak memory stays ONE candidate's
    chunk workspace, and a full iteration costs ``2·buckets·C/cand_map``
    dispatches instead of round 2's per-candidate host loop (144
    candidates x 23 buckets x 2 programs ≈ 6.6k dispatches x ~25 ms
    dispatch floor). ``cand_map`` is NOT all-candidates-at-once because
    a 144-iteration map-of-VJP at nmax≈16k crashes the v5e TPU worker
    (bisected on chip: single grad and map-of-4 are fine, map-of-144
    dies — a runtime limit, not mathematics; 8 per dispatch is the safe
    measured-stable point). With ``mesh``, each candidate chunk is
    sharded across the devices (``shard_map``; ``cand_map`` must be a
    multiple of the mesh size): candidate evaluations are embarrassingly
    parallel, ≙ the independence of the reference's round-robin leaf
    updates (``finetuning.jl:37-57``).

    ``sparse``: exploit the zero pattern of ``W`` in the BACKWARD pass.
    Candidate j's gradient is ``Σ_l resp_jl · w_jl · d mll_l/dθ`` — leaves
    with ``w_jl == 0`` (non-overlapping leaves: the overlap row ``D[j,:]``
    is ~10% dense on the benchmark tree, ``fit.jl:12-39``) contribute
    NOTHING, so the VJP is evaluated only over the (candidate, leaf) pairs
    with nonzero weight: ONE program per bucket gathers the host-built
    pair list, runs single-leaf VJPs (``lax.map`` with a VMEM-budgeted
    ``batch_size``) and segment-sums per candidate — one dispatch per
    bucket (a host-side per-pair-chunk loop was measured 17x slower
    through the single-chip tunnel's dispatch latency). Exactly the dense
    gradient (gated in ``test_train.py``), ~10x less backward compute at
    benchmark density. ``None`` (auto) uses the sparse path when ``W`` is
    < 25% dense; ``pair_map`` is only the sharded pair-axis pad quantum
    on a mesh. The forward pass is unchanged (every leaf's mll is needed
    for the responsibilities and the early-stop value,
    ``finetuning.jl:44-51``).
    """
    from .fit import _bucket_chunk

    L = plan.num_leaves
    fwd_fns, vg_fns, idx = [], [], []
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        ndev = mesh.shape[axis]
        if cand_map % ndev != 0:
            cand_map = ndev * max(1, cand_map // ndev)
        if pair_map % ndev != 0:
            pair_map = ndev * max(1, pair_map // ndev)
    pair_fns = []
    for b, ids in zip(batches, leaf_ids):
        chunk = _bucket_chunk(b.nmax, b.num_leaves, b.x.dtype, budget)
        f = leaf_mlls_fn(layout, b, chunk if chunk < b.num_leaves else None)

        def fwd(Hc, f=f):
            return lax.map(f, Hc)

        def vjp(Hc, RWc, f=f):
            def one(args):
                th, rw = args
                return jax.grad(lambda t: jnp.vdot(rw, f(t)))(th)

            return lax.map(one, (Hc, RWc))

        # pairs-per-vmap-chunk inside the pair program: bounded by the
        # single-pair VJP workspace (~6 [nmax, nmax] buffers)
        bs = max(1, min(
            64, int((2 << 30) // (6 * b.nmax ** 2 * b.x.dtype.itemsize))
        ))

        def pair_vjp(Hf, rw_b, jq, iq, vq, b=b, bs=bs):
            # ONE program per bucket: gather (candidate, leaf) pairs,
            # single-leaf VJPs chunked by lax.map(batch_size=bs),
            # segment-sum per candidate. One dispatch instead of the
            # 5-per-chunk host loop (measured 17x slower through the
            # single-chip tunnel's dispatch latency). ``vq`` masks padded
            # pairs (zero cotangent -> zero contribution).
            C = Hf.shape[0]

            def one(args):
                th, i, rw = args

                def obj(t):
                    b1 = LeafBatch(*[
                        lax.dynamic_slice_in_dim(a, i, 1, axis=0) for a in b
                    ])
                    return rw * _chunk_leaf_mll(layout, t, b1)[0]

                return jax.grad(obj)(th)

            rwq = rw_b[jq, iq] * vq
            gps = lax.map(one, (Hf[jq], iq, rwq), batch_size=bs)
            return jax.ops.segment_sum(gps, jq, num_segments=C)

        if mesh is not None:
            fwd = shard_map(fwd, mesh=mesh, in_specs=(P(axis),),
                            out_specs=P(axis), check_vma=False)
            vjp = shard_map(vjp, mesh=mesh, in_specs=(P(axis), P(axis)),
                            out_specs=P(axis), check_vma=False)

            def pair_vjp(Hf, rw_b, jq, iq, vq, pv=pair_vjp, mesh=mesh):
                # pairs are sharded over the mesh; candidate grads psum
                def body(Hf, rw_b, jq, iq, vq):
                    return lax.psum(pv(Hf, rw_b, jq, iq, vq), axis)

                return shard_map(
                    body, mesh=mesh,
                    in_specs=(P(), P(), P(axis), P(axis), P(axis)),
                    out_specs=P(), check_vma=False,
                )(Hf, rw_b, jq, iq, vq)

        fwd_fns.append(jax.jit(fwd))
        vg_fns.append(jax.jit(vjp))
        pair_fns.append(jax.jit(pair_vjp))
        idx.append(jnp.asarray(ids))

    resp_v = jax.jit(jax.vmap(
        lambda mll: inferlib.leaf_responsibilities(plan, mll)
    ))
    # Keyed on the W array OBJECT (a strong reference is kept, so its id
    # cannot be recycled; jax/numpy arrays passed here are never mutated).
    # finetune passes the same Dd every iteration — the [L, L] download +
    # zero-pattern scan happens once per finetune call, not per iteration.
    pair_cache = {}

    def _analysis(W):
        if pair_cache.get("W") is not W:
            Wh = np.asarray(W) != 0
            pair_cache.clear()
            pair_cache["W"] = W
            pair_cache["Wh"] = Wh
            pair_cache["density"] = float(Wh.mean())
            pair_cache["pairs"] = None
        return pair_cache

    def _pairs_for(info):
        if info["pairs"] is None:
            Wh = info["Wh"]
            plists = []
            for ids in leaf_ids:
                jj, ii = np.nonzero(Wh[:, np.asarray(ids)])
                plists.append((jj.astype(np.int32), ii.astype(np.int32)))
            info["pairs"] = plists
        return info["pairs"]

    def vg(H, W):
        C = H.shape[0]
        pad = (-C) % cand_map
        if pad:
            # tile (not slice): pad may exceed C (e.g. 3 candidates on an
            # 8-device mesh), and the sharded path needs Cp % cand_map == 0
            rep = jnp.arange(C + pad) % C
            Hp = jnp.take(H, rep, axis=0)
            Wp = jnp.take(W, rep, axis=0)
        else:
            Hp, Wp = H, W
        Cp = Hp.shape[0]
        chunks = [slice(s, s + cand_map) for s in range(0, Cp, cand_map)]
        mll = jnp.zeros((Cp, L), H.dtype)
        for f, ids in zip(fwd_fns, idx):
            for sl in chunks:
                mll = mll.at[sl, ids].set(f(Hp[sl]))
        rw = resp_v(mll) * Wp

        info = _analysis(W)
        use_sparse = sparse
        if use_sparse is None:
            use_sparse = info["density"] < 0.25
        g = jnp.zeros((Cp, Hp.shape[1]), H.dtype)
        if not use_sparse:
            for gfn, ids in zip(vg_fns, idx):
                for sl in chunks:
                    g = g.at[sl].add(gfn(Hp[sl], rw[sl][:, ids]))
            return mll[:C], g[:C]

        for (jj, ii), pfn, ids in zip(_pairs_for(info), pair_fns, idx):
            Q = jj.size
            if Q == 0:
                continue
            # mesh: pad the sharded pair axis to the device count (padded
            # pairs are masked out via vq); single device: no padding
            # (lax.map's batch_size handles the remainder)
            qpad = (-Q) % pair_map if mesh is not None else 0
            vv = np.ones(Q + qpad, dtype=np.asarray(H).dtype)
            if qpad:
                jj = np.concatenate([jj, np.zeros(qpad, np.int32)])
                ii = np.concatenate([ii, np.zeros(qpad, np.int32)])
                vv[Q:] = 0.0
            g = g + pfn(Hp, rw[:, ids], jnp.asarray(jj), jnp.asarray(ii),
                        jnp.asarray(vv))
        return mll[:C], g[:C]

    return vg


def finetune(
    model,
    optimizer=None,
    iterations: int = 1000,
    lam: float = 0.5,
    earlystop: int = 10,
    self_weight: float = 1.0,
    cand_chunk: Optional[int] = None,
    verbose: bool = False,
    progress=None,
    bucketed: Optional[bool] = None,
    mesh=None,
    axis=None,
    sparse: Optional[bool] = None,
    leaves=None,
):
    """Fine-tune per-leaf hyperparameters (≙ ``finetune!``,
    ``finetuning.jl:3-88``).

    Keeps a per-leaf hyper matrix ``H [L, P]``; per iteration, every leaf's
    candidate vector is applied to the whole tree, the root-mll gradient is
    computed with that leaf's overlap-row weighting, and only that leaf's
    row of ``H`` is updated — all candidates batched (chunked by
    ``cand_chunk``). On exit each leaf keeps its own hypers and the model is
    refit heterogeneously (``finetuning.jl:74-85``).

    Large models (any size bucket ≥ 4096) evaluate candidates through the
    size-bucketed chunked programs (:func:`make_finetune_vg_bucketed`)
    instead of vmapping over the monolithic padded batch, so finetune runs
    at N=100k within the same memory budget as ``train`` and in 2
    dispatches per bucket per iteration.

    ``mesh``: shard the candidate evaluations across a device mesh
    (forces the bucketed path; identical mathematics and history —
    candidates are independent, so this is pure data parallelism over
    the candidate axis). ``axis``: the single mesh axis to shard over —
    required on multi-axis meshes (matching ``fit(mesh=)``/
    ``gp.fit(mesh=)``: the other axes would silently idle).

    ``sparse``: bucketed path only — differentiate only the (candidate,
    leaf) pairs with nonzero overlap weight instead of all L×L pairs
    (exactly equal gradients; see :func:`make_finetune_vg_bucketed`).
    ``None`` auto-enables below 25% overlap density.

    ``leaves``: optional array of leaf indices to tune — only those
    leaves' candidate hypers are evaluated and updated per iteration
    (other rows of ``H`` keep their values; the early-stop value is the
    sum of the TUNED leaves' own mlls). The reference round-robins over
    every leaf (``finetuning.jl:37``); the subset form makes a targeted
    refinement (e.g. the worst-mll experts) affordable at frontier leaf
    counts, where a full L-candidate sweep is quadratic in L.
    """
    optimizer = optimizer or optax.adam(1e-3)
    # model.batch is lazy (mostly padding at scale); only the non-bucketed
    # fallback below touches it
    layout, plan = model.layout, model.plan
    L = plan.num_leaves
    theta0 = model.theta
    if theta0.ndim == 1:
        H = jnp.broadcast_to(theta0, (L,) + theta0.shape).astype(model.dtype)
    else:
        H = theta0
    if plan.overlap is None:
        raise ValueError(
            "finetune needs the leaf-overlap matrix D for its row "
            "weighting (finetuning.jl:54); this model was built with "
            "overlap=False — rebuild with overlap=True"
        )
    if leaves is None:
        cand = np.arange(L)
    else:
        cand = np.unique(np.asarray(leaves, dtype=np.int64))
        if cand.size == 0 or cand[0] < 0 or cand[-1] >= L:
            raise ValueError(
                f"finetune(leaves=...) indices must be unique ints in "
                f"[0, {L}); got range [{cand[0] if cand.size else '-'}, "
                f"{cand[-1] if cand.size else '-'}]"
            )
    C = cand.size
    Dov = plan.overlap
    try:
        import scipy.sparse as sp

        _is_sp = sp.issparse(Dov)
    except ImportError:  # pragma: no cover
        _is_sp = False
    # candidate rows of D, densified (a [C, L] block — cheap even when the
    # full D is stored sparse at frontier leaf counts)
    from .plan import MixtureOverlap

    if isinstance(Dov, MixtureOverlap):
        Dd = Dov.rows(cand)
    elif _is_sp:
        Dd = np.asarray(Dov[cand].todense(), dtype=np.float64)
    else:
        Dd = np.array(Dov[cand], dtype=np.float64)
    Dd[np.arange(C), cand] = self_weight
    Dd = jnp.asarray(Dd, dtype=model.dtype)
    cand_j = jnp.asarray(cand)

    cand_chunk = cand_chunk or max(1, min(C, 4096 // max(plan.nmax, 1)))

    per_bucket = bucketed
    if per_bucket is None:
        per_bucket = (
            getattr(model, "bucket_batches", None) is not None
            and max(b.nmax for b in model.bucket_batches) >= 4096
        )
    if mesh is not None:
        per_bucket = True  # the candidate-sharded path is the bucketed one
    if mesh is not None and axis is None:
        if len(mesh.shape) > 1:
            raise ValueError(
                "finetune(mesh=...) shards candidates over a single mesh "
                f"axis; this mesh has axes {tuple(mesh.shape)} — pass "
                "axis='name' (the other axes stay UNUSED) or reshape the "
                "mesh to one axis"
            )
        axis = next(iter(mesh.shape))
    if per_bucket:
        naxis = axis
        vg_all = make_finetune_vg_bucketed(
            layout, plan, model.bucket_batches, model.bucket_spec.leaf_ids,
            mesh=mesh, axis=naxis or "experts", sparse=sparse,
        )

        def _apply(G, opt_state, H):
            # scatter the candidate grads into full-H rows (non-tuned rows
            # see zero grad -> zero adam update from zero-initialized
            # moments, so they never move)
            Gf = jnp.zeros_like(H).at[cand_j].set(G)
            updates, opt_state = optimizer.update(-Gf, opt_state, H)
            return updates, opt_state

        apply_fn = jax.jit(_apply)
        jdiag = np.arange(C)

        def iteration(H, opt_state):
            mll_c, G = vg_all(H[cand_j], Dd)  # vg pads candidates internally
            own = np.asarray(mll_c)[jdiag, cand]  # candidate j's own mll
            updates, opt_state = apply_fn(G, opt_state, H)
            return optax.apply_updates(H, updates), opt_state, float(own.sum())
    else:
        batch = model.batch

        # gradient of the weighted root mll, plus the leaf's own mll (the
        # value the reference tracks for early stopping: l += L[gp.id],
        # finetuning.jl:51)
        def obj(theta_j, w_j):
            root, lm = _weighted_root_mll(layout, plan, batch, theta_j, w_j)
            return root, lm

        def one_candidate(theta_j, w_j, j):
            (root, lm), vjp = jax.vjp(lambda th: obj(th, w_j), theta_j)
            (g,) = vjp((jnp.ones((), dtype=theta_j.dtype), jnp.zeros_like(lm)))
            return g, lm[j]

        batched = jax.vmap(one_candidate, in_axes=(0, 0, 0))

        @jax.jit
        def iteration(H, opt_state):
            js = cand_j
            Hc = H[cand_j]
            if cand_chunk >= C:
                G, own = batched(Hc, Dd, js)
            else:
                pad = (-C) % cand_chunk
                Hp = jnp.concatenate([Hc, Hc[:pad]], axis=0) if pad else Hc
                Dp = jnp.concatenate([Dd, Dd[:pad]], axis=0) if pad else Dd
                jp = jnp.concatenate([js, js[:pad]], axis=0) if pad else js
                nc = Hp.shape[0] // cand_chunk

                def body(i):
                    sl = lambda a: lax.dynamic_slice_in_dim(
                        a, i * cand_chunk, cand_chunk, axis=0
                    )
                    return batched(sl(Hp), sl(Dp), sl(jp))

                G, own = lax.map(body, jnp.arange(nc))
                G = G.reshape((-1,) + G.shape[2:])[:C]
                own = own.reshape(-1)[:C]
            Gf = jnp.zeros_like(H).at[cand_j].set(G)
            updates, opt_state = optimizer.update(-Gf, opt_state, H)
            return optax.apply_updates(H, updates), opt_state, jnp.sum(own)

    opt_state = optimizer.init(H)
    hist = np.zeros(iterations)
    c = 0
    n_hist = 0
    bar = _Progress("finetune", iterations, progress)
    for it in range(iterations):
        H, opt_state, val = iteration(H, opt_state)
        hist[it] = float(val)
        n_hist = it + 1
        delta = (
            abs(hist[it] - hist[it - 10 : it - 1].mean()) if it >= 10 else np.inf
        )
        bar.show(it, hist[it], delta)
        if verbose and it % 10 == 0:
            print(f"[finetune] iter={it} sum-own-mll={hist[it]:.4f}")
        c = c + 1 if delta < lam else 0
        if c >= earlystop:
            break
    bar.close(f" (stopped after {n_hist} iterations)")

    # final heterogeneous refit: each leaf with its own hypers
    model.set_params(H)
    model.fit()
    return hist[:n_hist]
