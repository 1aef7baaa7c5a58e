"""Fail-fast guards of ``bench.py --check-mlls``: a wrong/malformed seed
npz must be refused at startup (milliseconds), never after the full TPU
run + CPU baseline completed. Pure host-side logic — no devices touched."""
import types

import numpy as np
import pytest

import bench


def _args(n=1000, depth=4, m_min=30):
    return types.SimpleNamespace(n=n, depth=depth, m_min=m_min,
                                 check_mlls=None)


def _write(tmp_path, name="seed.npz", leaves=None, mlls=None, **stamp):
    p = tmp_path / name
    if leaves is None:
        leaves = np.array([0, 3, 7])
    if mlls is None:
        mlls = np.array([-10.0, -20.0, -30.0])
    np.savez(p, leaves=np.asarray(leaves), mlls=np.asarray(mlls),
             **{k: np.int64(v) for k, v in stamp.items()})
    return str(p)


def test_valid_seed_loads(tmp_path):
    a = _args()
    a.check_mlls = _write(tmp_path, n=1000, depth=4, m=30)
    leaves, mlls, moments = bench._load_check_mlls(a)
    np.testing.assert_array_equal(leaves, [0, 3, 7])
    assert mlls.shape == (3,)


def test_unstamped_legacy_seed_still_loads(tmp_path):
    # npz files seeded before the stamp existed carry no (n, depth, m)
    a = _args()
    a.check_mlls = _write(tmp_path)
    leaves, _, _ = bench._load_check_mlls(a)
    assert leaves.size == 3


def test_wrong_stamp_refused(tmp_path):
    a = _args(n=2000)
    a.check_mlls = _write(tmp_path, n=1000, depth=4, m=30)
    with pytest.raises(SystemExit, match="wrong seed file"):
        bench._load_check_mlls(a)


def test_empty_or_mismatched_arrays_refused(tmp_path):
    a = _args()
    a.check_mlls = _write(tmp_path, leaves=np.zeros(0, np.int64),
                          mlls=np.zeros(0))
    with pytest.raises(SystemExit, match="malformed"):
        bench._load_check_mlls(a)
    a.check_mlls = _write(tmp_path, leaves=[0, 1], mlls=[-1.0])
    with pytest.raises(SystemExit, match="malformed"):
        bench._load_check_mlls(a)


def test_negative_leaf_ids_refused(tmp_path):
    a = _args()
    a.check_mlls = _write(tmp_path, leaves=[-1, 2, 3])
    with pytest.raises(SystemExit, match="negative"):
        bench._load_check_mlls(a)
