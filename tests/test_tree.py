"""Structure-builder invariants (≙ treeStructure.jl semantics)."""
import numpy as np

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.config import DSMGPConfig
from deepstructuredmixtures_tpu.tree import (
    LeafNode,
    SplitNode,
    SumNode,
    build_tree,
    get_leaves,
    get_splits,
    num_mixtures,
    stats,
)

rng = np.random.default_rng(0)
N = 400
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 6) + rng.normal(0, 0.1, N)


def _cfg(V=2, K=4, M=30, depth=2, bnoise=0.5, sum_root=True, kernels=None):
    return DSMGPConfig(
        mean_fun=None,
        kernels=kernels or dsm.IsoSE(0.0, 0.0),
        observation_noise=-1.0,
        min_data=M,
        K=K,
        V=V,
        depth=depth,
        bnoise=bnoise,
        sum_root=sum_root,
    )


def test_split_children_partition_observations():
    root = build_tree(X, Y, _cfg(), np.random.default_rng(1))

    def check(node, expected_obs):
        if isinstance(node, LeafNode):
            np.testing.assert_array_equal(node.obs, expected_obs)
            return
        if isinstance(node, SplitNode):
            gathered = []
            lo = node.lb[node.dim]
            for c, hi in zip(node.children, node.thresholds):
                sel = (X[expected_obs, node.dim] > lo) & (
                    X[expected_obs, node.dim] <= hi
                )
                check(c, expected_obs[sel])
                gathered.append(expected_obs[sel])
                lo = hi
            np.testing.assert_array_equal(np.sort(np.concatenate(gathered)),
                                          np.sort(expected_obs))
            return
        for c in node.children:
            check(c, expected_obs)

    check(root, np.arange(N))


def test_sum_root_structure_and_weights():
    root = build_tree(X, Y, _cfg(V=3), np.random.default_rng(2))
    assert isinstance(root, SumNode)
    assert len(root.children) == 3
    np.testing.assert_allclose(root.logweights, -np.log(3.0))


def test_leaf_boxes_contain_their_points():
    root = build_tree(X, Y, _cfg(), np.random.default_rng(3))
    for leaf in get_leaves(root):
        pts = X[leaf.obs]
        assert np.all(pts > leaf.lb - 1e-12)
        assert np.all(pts <= leaf.ub + 1e-12)


def test_get_splits_bounded_by_K():
    for K in (2, 4, 8):
        s = get_splits(X[:, 0], -np.inf, np.inf, 10, 0.5, K,
                       np.random.default_rng(4))
        assert len(s) <= K
        assert all(0 < v < 1 for v in s)


def test_kernel_mixture_leaf_sums():
    kernels = [dsm.IsoSE(0.0, 0.0), dsm.IsoLinear(0.0)]
    root = build_tree(X, Y, _cfg(kernels=kernels), np.random.default_rng(5))
    leaves = get_leaves(root)
    kids = {l.kernelid for l in leaves}
    assert kids == {0, 1}

    def find_leaf_sums(node):
        if isinstance(node, LeafNode):
            return []
        out = []
        if isinstance(node, SumNode) and node.is_leaf_sum:
            out.append(node)
        for c in node.children:
            out.extend(find_leaf_sums(c))
        return out

    lsums = find_leaf_sums(root)
    assert lsums
    for s in lsums:
        assert len(s.children) == 2
        # Dirichlet weights normalize
        assert abs(np.exp(s.logweights).sum() - 1.0) < 1e-12
        # both children share the same observations
        np.testing.assert_array_equal(s.children[0].obs, s.children[1].obs)


def test_split_only_tree_for_poe():
    root = build_tree(X, Y, _cfg(V=1, sum_root=False), np.random.default_rng(6))

    def no_sums(node):
        if isinstance(node, LeafNode):
            return True
        if isinstance(node, SumNode):
            return False
        return all(no_sums(c) for c in node.children)

    assert no_sums(root)


def test_stats_and_num_mixtures():
    root = build_tree(X, Y, _cfg(V=2), np.random.default_rng(7))
    st = stats(root)
    assert st["gps"] == len(get_leaves(root))
    assert num_mixtures(root) >= 1


def test_get_splits_matches_naive_scan():
    """The sorted/searchsorted `get_splits` must reproduce the naive
    O(N)-scan formulation (the reference's semantics, treeStructure.jl:23-129)
    exactly — same RNG trajectory, same split values — including on data
    with duplicates."""

    def naive(Xd, lb_d, ub_d, min_data, eps, K, rng, depth=1):
        K_local = depth * depth
        s = []
        if Xd.size == 0:
            return s
        lo = max(lb_d, float(Xd.min()))
        hi = min(ub_d, float(Xd.max()))
        v = hi - lo
        Xsel = Xd[(Xd > lo) & (Xd <= hi)]
        if Xsel.size > min_data * 2:
            m = float(np.median(Xsel))
            s_new = m
            z1 = z2 = 0
            c = 0
            while z1 == 0 or z2 == 0:
                a = float(rng.beta(2.0, 2.0)) * v + lo
                s_new = eps * a + (1.0 - eps) * m
                z1 = int(np.sum(Xsel <= s_new))
                z2 = int(np.sum(Xsel > s_new))
                c += 1
                if c > 100:
                    return s
            zi = int(rng.integers(1, 3))
            br = [(z1, lb_d, s_new), (z2, s_new, ub_d)]
            if zi != 1:
                br = br[::-1]
            for bi, (z, nlb, nub) in enumerate(br):
                if z > min_data and K_local < K:
                    s.extend(naive(Xd, nlb, nub, min_data, eps, K, rng,
                                   depth=depth + 1))
                    if bi == 0:
                        K_local += 1
            s.append(s_new)
        return s

    for seed in range(8):
        r = np.random.default_rng(seed)
        n = int(r.integers(50, 800))
        xd = r.uniform(0, 1, n)
        if seed % 2:  # heavy duplicates
            xd = np.round(xd, 2)
        for eps in (0.0, 0.3, 0.9):
            got = get_splits(xd, -np.inf, np.inf, 10, eps, 6,
                             np.random.default_rng(100 + seed))
            want = naive(xd, -np.inf, np.inf, 10, eps, 6,
                         np.random.default_rng(100 + seed))
            assert got == want


def test_get_splits_dtype_independent():
    """float32 input columns must produce the SAME split list as the same
    values in float64 (get_splits casts to f64 up front): split arithmetic
    is deterministic across input dtypes, so a tree built from f32 data is
    reproducible against its f64 twin."""
    for seed in range(12):
        r = np.random.default_rng(seed)
        n = int(r.integers(50, 800))
        xd32 = r.uniform(0, 1, n).astype(np.float32)
        if seed % 2:
            xd32 = np.round(xd32, 2)
        for eps in (0.0, 0.3, 0.9):
            got32 = get_splits(xd32, -np.inf, np.inf, 10, eps, 6,
                               np.random.default_rng(100 + seed))
            got64 = get_splits(xd32.astype(np.float64), -np.inf, np.inf,
                               10, eps, 6, np.random.default_rng(100 + seed))
            assert got32 == got64
