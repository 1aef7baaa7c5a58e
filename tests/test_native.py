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
