"""Checkpoint round-trip and plotting smoke tests."""
import os

import numpy as np
import pytest

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu import checkpoint
from deepstructuredmixtures_tpu.plotting import kernelid_function, plot_gp, plot_model

rng = np.random.default_rng(0)
N = 200
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 4 * np.pi) + rng.normal(0, 0.2, N)
XT = np.linspace(0.1, 0.9, 23).reshape(-1, 1)


def test_checkpoint_roundtrip_dsmgp(tmp_path):
    m = dsm.build_dsmgp(X, Y, V=2, K=2, M=20, kernel=dsm.IsoSE(0.3, 0.1),
                        log_noise=-1.0, seed=3)
    m.update()
    mu0, var0 = map(np.asarray, m.predict(XT))
    p = str(tmp_path / "model.npz")
    checkpoint.save(m, p)
    m2 = checkpoint.load(p)
    assert type(m2).__name__ == "DSMGP"
    np.testing.assert_allclose(np.asarray(m2.theta), np.asarray(m.theta))
    np.testing.assert_allclose(
        np.asarray(m2.logweights), np.asarray(m.logweights)
    )
    mu1, var1 = map(np.asarray, m2.predict(XT))
    np.testing.assert_allclose(mu1, mu0, atol=1e-10)
    np.testing.assert_allclose(var1, var0, atol=1e-10)


def test_checkpoint_roundtrip_untied(tmp_path):
    m = dsm.build_dsmgp(X, Y, V=2, K=2, M=30, kernel=dsm.IsoSE(0.0, 0.0),
                        log_noise=-1.0, seed=4)
    dsm.finetune(m, iterations=2, lam=1e-9)
    assert m.theta.ndim == 2
    p = str(tmp_path / "untied.npz")
    checkpoint.save(m, p)
    m2 = checkpoint.load(p)
    np.testing.assert_allclose(np.asarray(m2.theta), np.asarray(m.theta))
    mu0, _ = map(np.asarray, m.predict(XT))
    mu1, _ = map(np.asarray, m2.predict(XT))
    np.testing.assert_allclose(mu1, mu0, atol=1e-10)


def test_checkpoint_roundtrip_poe(tmp_path):
    m = dsm.build_poe(X, Y, K=3, M=20, generalized=True, seed=5,
                      kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0)
    p = str(tmp_path / "gpoe.npz")
    checkpoint.save(m, p)
    m2 = checkpoint.load(p)
    assert type(m2).__name__ == "GPoE"
    mu0, var0 = map(np.asarray, m.predict(XT))
    mu1, var1 = map(np.asarray, m2.predict(XT))
    np.testing.assert_allclose(mu1, mu0, atol=1e-10)
    np.testing.assert_allclose(var1, var0, atol=1e-10)


def test_plot_model_and_gp(tmp_path):
    pytest.importorskip("matplotlib")
    m = dsm.build_dsmgp(X, Y, V=2, K=2, M=30, seed=6, log_noise=-1.0)
    out = str(tmp_path / "model.png")
    plot_model(m, show_splits=True, path=out)
    assert os.path.getsize(out) > 1000
    gp = dsm.GaussianProcess(X, Y, kernel=dsm.IsoSE(0.0, 0.0), log_noise=-1.0)
    out2 = str(tmp_path / "gp.png")
    plot_gp(gp, path=out2)
    assert os.path.getsize(out2) > 1000


def test_plot_model_2d(tmp_path):
    pytest.importorskip("matplotlib")
    X2 = rng.uniform(0, 1, (150, 2))
    Y2 = np.sin(X2[:, 0] * 5) * np.cos(X2[:, 1] * 5)
    m = dsm.build_dsmgp(X2, Y2, V=2, K=2, M=30, seed=7, log_noise=-1.0)
    out = str(tmp_path / "model2d.png")
    plot_model(m, n_grid=100, path=out)
    assert os.path.getsize(out) > 1000


def test_kernelid_function():
    kernels = [dsm.IsoSE(0.0, 0.0), dsm.IsoLinear(0.0)]
    m = dsm.build_dsmgp(X, Y, V=2, K=2, M=40, kernel=kernels, seed=8,
                        log_noise=-1.0)
    m.update()
    kids = kernelid_function(m, XT)
    assert kids.shape == (len(XT),)
    assert set(np.unique(kids)) <= {0, 1}


def test_orbax_checkpoint_roundtrip(tmp_path):
    """orbax backend stores/restores the identical payload as the npz path
    (async-capable production checkpointing; SURVEY §5)."""
    pytest.importorskip("orbax.checkpoint")
    import numpy as np

    import deepstructuredmixtures_tpu as dsm
    from deepstructuredmixtures_tpu.checkpoint import load_orbax, save_orbax

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 1, 120)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 5) + 0.1 * rng.standard_normal(120)
    m = dsm.build_dsmgp(x, y, V=2, K=2, M=15, kernel=dsm.IsoSE(0.1, -0.2),
                        log_noise=-1.0, seed=3)
    z = m.update()
    path = str(tmp_path / "ckpt_orbax")
    save_orbax(m, path)
    m2 = load_orbax(path)
    assert type(m2) is type(m)
    np.testing.assert_array_equal(np.asarray(m2.theta), np.asarray(m.theta))
    np.testing.assert_array_equal(
        np.asarray(m2.logweights), np.asarray(m.logweights)
    )
    xt = np.linspace(0, 1, 23).reshape(-1, 1)
    mu1, v1 = m.predict(xt)
    mu2, v2 = m2.predict(xt)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-12)
    assert abs(m2.update() - z) < 1e-12


def test_checkpoint_preserves_pad_multiple(tmp_path):
    """Restore recompiles the plan with the SAME leaf-pad quantum: a
    TPU-default build (pad_multiple=128, fused-Pallas-eligible) must not
    come back with the flat default 8 and silently lose kernel
    eligibility."""
    m = dsm.build_dsmgp(X, Y, V=1, K=2, M=20, kernel=dsm.IsoSE(0.3, 0.1),
                        log_noise=-1.0, seed=5, pad_multiple=128)
    assert m.plan.pad_multiple == 128 and m.batch.nmax % 128 == 0
    p = str(tmp_path / "pad128.npz")
    checkpoint.save(m, p)
    m2 = checkpoint.load(p)
    assert m2.plan.pad_multiple == 128
    assert m2.batch.nmax == m.batch.nmax
    np.testing.assert_allclose(
        np.asarray(m2.predict(XT)[0]), np.asarray(m.predict(XT)[0]),
        atol=1e-12,
    )


def test_checkpoint_roundtrip_overlap_false(tmp_path):
    """A model built with overlap=False round-trips WITHOUT re-running the
    O(L^2 N) overlap analysis: the restored plan has no D matrix and no
    schedule, and predictions are bit-identical."""
    from deepstructuredmixtures_tpu.checkpoint import load, save

    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0, 1, 150)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 5) + 0.1 * rng.standard_normal(150)
    m = dsm.build_dsmgp(x, y, V=2, K=2, M=15, kernel=dsm.IsoSE(0.1, -0.2),
                        log_noise=-1.0, seed=4, overlap=False)
    m.update()
    path = str(tmp_path / "ckpt_nooverlap.npz")
    save(m, path)
    m2 = load(path)
    assert m2.D is None and m2.schedule is None
    xt = np.linspace(0, 1, 19).reshape(-1, 1)
    np.testing.assert_array_equal(
        np.asarray(m.predict(xt)[0]), np.asarray(m2.predict(xt)[0])
    )
