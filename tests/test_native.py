"""Native host kernels vs NumPy fallbacks (both paths must agree)."""
import numpy as np
import pytest

from deepstructuredmixtures_tpu.utils import native


rng = np.random.default_rng(0)


def test_intersect_counts_matches_numpy():
    masks = rng.random((17, 301)) < 0.3
    want = masks.astype(np.int64) @ masks.astype(np.int64).T
    got = native.intersect_counts(masks)
    np.testing.assert_array_equal(got, want)


def test_route_box_matches_numpy():
    T, L, D = 57, 9, 3
    xt = rng.normal(size=(T, D))
    lb = rng.normal(size=(L, D)) - 1.0
    ub = lb + rng.uniform(0.5, 3.0, (L, D))
    lb[0] = -np.inf
    ub[0] = np.inf
    want = np.all((xt[:, None, :] > lb[None]) & (xt[:, None, :] <= ub[None]), axis=-1)
    got = native.route_box(xt, lb, ub)
    np.testing.assert_array_equal(got, want)


def test_pack_routes_matches_fallback():
    member = rng.random((40, 6)) < 0.4
    tmax = int(member.sum(0).max()) + 2
    ti, tm = native.pack_routes(member, tmax)
    for l in range(6):
        idx = np.where(member[:, l])[0]
        assert tm[l].sum() == idx.size
        np.testing.assert_array_equal(ti[l, : idx.size], idx)
        assert not tm[l, idx.size :].any()


def test_native_lib_loaded():
    # The shared library should be built in this repo (make -C native);
    # if it is genuinely absent the other tests still pass via fallback.
    if native.get_lib() is None:
        pytest.skip("libdsmhost.so not built — NumPy fallback in use")
    assert native.get_lib() is not None


def test_pack_leaves_matches_numpy_gather():
    """Native ragged→padded leaf packer must be bit-identical to the
    vectorized NumPy gather (both f32 and f64 variants), including
    zeroed padding and duplicate-free masks."""
    r = np.random.default_rng(7)
    N, D = 3000, 2
    X = r.uniform(0, 1, (N, D))
    y = r.normal(0, 1, N)
    obs = [np.sort(r.choice(N, int(r.integers(3, 200)), replace=False))
           .astype(np.int64) for _ in range(17)]
    nmax = 256
    for dt in (np.float32, np.float64):
        out = native.pack_leaves(obs, nmax, X, y, dt)
        if out is None:
            pytest.skip("native pack_leaves unavailable")
        lens = np.array([o.size for o in obs])
        mb = np.arange(nmax)[None, :] < lens[:, None]
        flat = np.concatenate(obs)
        xb = np.zeros((len(obs), nmax, D), dt); xb[mb] = X[flat]
        yb = np.zeros((len(obs), nmax), dt); yb[mb] = y[flat]
        np.testing.assert_array_equal(out[0], xb)
        np.testing.assert_array_equal(out[1], yb)
        np.testing.assert_array_equal(out[2], mb)
        np.testing.assert_array_equal(out[3], lens.astype(np.int32))


def test_pack_leaves_rejects_oversized_or_out_of_range():
    """The native packer must fail LOUDLY (like the NumPy fallback's
    shape mismatch) instead of writing past its row block when a leaf
    exceeds nmax, or reading out of bounds on a bad observation id."""
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    r = np.random.default_rng(3)
    X = r.uniform(0, 1, (100, 1))
    y = r.normal(0, 1, 100)
    too_big = [np.arange(40, dtype=np.int64), np.arange(80, dtype=np.int64)]
    with pytest.raises(ValueError, match="exceeds nmax"):
        native.pack_leaves(too_big, 64, X, y, np.float32)
    bad_idx = [np.array([0, 99, 100], dtype=np.int64)]  # 100 out of range
    with pytest.raises(ValueError, match="out of range"):
        native.pack_leaves(bad_idx, 8, X, y, np.float64)
    # mismatched y: id 99 is in-bounds for X but one past a 99-row y —
    # the C++ kernel would heap-over-read where the NumPy fallback raises
    ok_idx = [np.array([0, 99], dtype=np.int64)]
    with pytest.raises(ValueError, match="99 rows"):
        native.pack_leaves(ok_idx, 8, X, y[:99], np.float64)
