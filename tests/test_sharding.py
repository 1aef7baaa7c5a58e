"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY §4 item 5)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.parallel import (
    make_mesh,
    make_sharded_mll_fn,
    make_sharded_routed_predict,
    make_sharded_train_step,
    pad_leaves,
    shard_batch,
    sharded_bucketed_streamed_predict,
    sharded_fit,
)
from deepstructuredmixtures_tpu.train import make_mll_fn

rng = np.random.default_rng(0)
N = 300
X = np.sort(rng.uniform(0, 1, N)).reshape(-1, 1)
Y = np.sin(X[:, 0] * 4 * np.pi) + rng.normal(0, 0.2, N)


def _model(seed=1):
    return dsm.build_dsmgp(X, Y, V=2, K=3, M=20, kernel=dsm.IsoSE(0.0, 0.0),
                           log_noise=-1.0, seed=seed, do_fit=False)


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.shape["experts"] == 8


def test_pad_leaves_noop_semantics():
    m = _model()
    padded = pad_leaves(m.batch, 8)
    assert padded.num_leaves % 8 == 0
    assert not bool(padded.mask[m.num_leaves :].any())


def test_sharded_mll_matches_single_device():
    m = _model()
    mesh = make_mesh(8)
    f_sharded, _ = make_sharded_mll_fn(m.layout, m.plan, m.batch, mesh)
    f_local = make_mll_fn(m.layout, m.plan, m.batch)
    v1 = float(jax.jit(f_sharded)(m.theta))
    v2 = float(f_local(m.theta))
    assert abs(v1 - v2) < 1e-10


def test_sharded_grad_matches_single_device():
    m = _model()
    mesh = make_mesh(8)
    f_sharded, _ = make_sharded_mll_fn(m.layout, m.plan, m.batch, mesh)
    f_local = make_mll_fn(m.layout, m.plan, m.batch)
    g1 = np.asarray(jax.jit(jax.grad(f_sharded))(m.theta))
    g2 = np.asarray(jax.grad(f_local)(m.theta))
    np.testing.assert_allclose(g1, g2, atol=1e-9)


def test_sharded_fit_matches_local():
    m = _model()
    mesh = make_mesh(8)
    post = sharded_fit(m.layout, m.theta, m.batch, mesh)
    m.fit(method="batched")
    L = m.num_leaves
    np.testing.assert_allclose(
        np.asarray(post.mll)[:L], np.asarray(m.posterior.mll), atol=1e-10
    )


def test_sharded_train_step_runs_and_improves():
    m = _model()
    mesh = make_mesh(8)
    step, init, _ = make_sharded_train_step(
        m.layout, m.plan, m.batch, mesh, optax.adam(5e-2)
    )
    theta = m.theta
    opt_state = init(theta)
    v0, theta, opt_state = step(theta, opt_state)
    v_prev = float(v0)
    for _ in range(10):
        v, theta, opt_state = step(theta, opt_state)
    assert float(v) > v_prev


def test_sharded_routed_predict_matches_single_device():
    """The full routed DSMGP prediction pipeline (fit + weight update +
    log-space moment matching) over the 8-device mesh must equal the
    single-device model.predict bit-for-bit tolerances."""
    m = _model()
    mesh = make_mesh(8)
    xt = np.linspace(-0.05, 1.05, 73).reshape(-1, 1)
    tidx, tmask = m._route(xt)

    f, prepare = make_sharded_routed_predict(m.layout, m.plan, m.batch, mesh)
    ti, tm = prepare(tidx, tmask)
    z_s, mean_s, var_s = f(m.theta, jnp.asarray(xt, m.dtype), ti, tm)

    m.fit(method="batched")
    z_l = m.update()
    mean_l, var_l = m.predict(xt)
    assert abs(float(z_s) - z_l) < 1e-10
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_l), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_l), atol=1e-10)


def test_sharded_streamed_bucketed_predict_matches_local():
    """The benchmark path (bucketed + chunked streaming, factors never
    persisted) sharded over the mesh must equal the local bucketed path."""
    from deepstructuredmixtures_tpu import fit as fitlib

    m = _model(seed=3)
    mesh = make_mesh(8)
    xt = np.linspace(-0.05, 1.05, 60).reshape(-1, 1)
    tidx, tmask = m._route(xt)
    args = (m.layout, m.theta, m.bucket_batches, m.bucket_spec.leaf_ids,
            m.num_leaves, jnp.asarray(xt, m.dtype), jnp.asarray(tidx),
            jnp.asarray(tmask))
    mu_l, var_l, mll_l = fitlib.bucketed_streamed_predict(*args)
    mu_s, var_s, mll_s = sharded_bucketed_streamed_predict(*args, mesh=mesh)
    np.testing.assert_allclose(np.asarray(mll_s), np.asarray(mll_l), atol=1e-10)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_l), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_l), atol=1e-10)

    # PoE-family shape (no routing): every leaf predicts all points
    mu_l2, var_l2, _ = fitlib.bucketed_streamed_predict(
        m.layout, m.theta, m.bucket_batches, m.bucket_spec.leaf_ids,
        m.num_leaves, jnp.asarray(xt, m.dtype),
    )
    mu_s2, var_s2, _ = sharded_bucketed_streamed_predict(
        m.layout, m.theta, m.bucket_batches, m.bucket_spec.leaf_ids,
        m.num_leaves, jnp.asarray(xt, m.dtype), None, None, mesh=mesh,
    )
    np.testing.assert_allclose(np.asarray(mu_s2), np.asarray(mu_l2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_s2), np.asarray(var_l2), atol=1e-10)


def test_train_with_mesh_matches_single_device():
    """dsm.train(model, mesh=...) — the high-level training API on the
    expert mesh — must produce the identical optimization trajectory."""
    m1 = _model(seed=9)
    m2 = _model(seed=9)
    mesh = make_mesh(8)
    h1 = dsm.train(m1, optax.adam(5e-2), iterations=6, lam=1e-9,
                   randinit=False, progress=False)
    h2 = dsm.train(m2, optax.adam(5e-2), iterations=6, lam=1e-9,
                   randinit=False, progress=False, mesh=mesh)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(m1.theta), np.asarray(m2.theta),
                               atol=1e-9)


def test_sharded_bucketed_vg_matches_single_device():
    """The chunked multi-chip training gradient (leaf axis sharded,
    per-device streaming) must equal the single-device per-bucket
    value-and-grad exactly — same chain rule, different partitioning."""
    from deepstructuredmixtures_tpu.parallel.mesh import (
        make_sharded_value_and_grad_bucketed,
    )
    from deepstructuredmixtures_tpu.train import make_value_and_grad_bucketed

    m = _model(seed=11)
    mesh = make_mesh(8)
    vg_l = make_value_and_grad_bucketed(
        m.layout, m.plan, m.bucket_batches, m.bucket_spec.leaf_ids
    )
    # small per-device chunk forces the streaming loop to actually chunk
    vg_s = make_sharded_value_and_grad_bucketed(
        m.layout, m.plan, m.bucket_batches, m.bucket_spec.leaf_ids, mesh,
        chunk=1,
    )
    v1, g1 = vg_l(m.theta)
    v2, g2 = vg_s(m.theta)
    assert abs(float(v1) - float(v2)) < 1e-10
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_train_with_mesh_bucketed_trajectory_parity():
    """train(mesh=) now routes bucketed models through the chunked
    sharded path — trajectory must still match single-device exactly."""
    m1 = _model(seed=13)
    m2 = _model(seed=13)
    mesh = make_mesh(8)
    h1 = dsm.train(m1, optax.adam(5e-2), iterations=5, lam=1e-9,
                   randinit=False, progress=False, chunk=1)
    h2 = dsm.train(m2, optax.adam(5e-2), iterations=5, lam=1e-9,
                   randinit=False, progress=False, mesh=mesh, chunk=1)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(m1.theta), np.asarray(m2.theta),
                               atol=1e-9)


def test_finetune_with_mesh_matches_single_device():
    """finetune(mesh=) shards the candidate axis; history and final
    per-leaf hypers must equal the single-device bucketed path."""
    m1 = _model(seed=15)
    m2 = _model(seed=15)
    mesh = make_mesh(8)
    h1 = dsm.finetune(m1, optax.adam(1e-2), iterations=3, lam=1e-9,
                      bucketed=True, progress=False)
    h2 = dsm.finetune(m2, optax.adam(1e-2), iterations=3, lam=1e-9,
                      mesh=mesh, progress=False)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(m1.theta), np.asarray(m2.theta),
                               atol=1e-8)


def test_finetune_with_mesh_fewer_candidates_than_devices():
    """Candidate padding must TILE when the leaf count is below the mesh
    size (3 candidates on 8 devices): slicing H[:pad] under-pads and
    shard_map rejects the non-divisible axis."""
    m1 = dsm.build_dsmgp(X, Y, V=1, K=3, M=80, kernel=dsm.IsoSE(0.0, 0.0),
                         log_noise=-1.0, seed=7, do_fit=False)
    m2 = dsm.build_dsmgp(X, Y, V=1, K=3, M=80, kernel=dsm.IsoSE(0.0, 0.0),
                         log_noise=-1.0, seed=7, do_fit=False)
    assert m1.num_leaves < 8, "test needs fewer leaves than devices"
    mesh = make_mesh(8)
    h1 = dsm.finetune(m1, optax.adam(1e-2), iterations=2, lam=1e-9,
                      bucketed=True, progress=False)
    h2 = dsm.finetune(m2, optax.adam(1e-2), iterations=2, lam=1e-9,
                      mesh=mesh, progress=False)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(m1.theta), np.asarray(m2.theta),
                               atol=1e-8)


def test_batch_actually_sharded():
    m = _model()
    mesh = make_mesh(8)
    sb = shard_batch(m.batch, mesh)
    # each device holds 1/8 of the leaf axis
    shard_sizes = {s.data.shape[0] for s in sb.x.addressable_shards}
    assert shard_sizes == {sb.num_leaves // 8}


def test_finetune_multi_axis_mesh_requires_axis():
    """finetune(mesh=) on a multi-axis mesh must raise without an explicit
    axis (matching fit(mesh=)/gp.fit(mesh=)) and work when one is given."""
    import jax
    from jax.sharding import Mesh

    m1 = _model(seed=31)
    m2 = _model(seed=31)
    multi = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("a", "b"))
    with pytest.raises(ValueError, match="single mesh axis"):
        dsm.finetune(m1, optax.adam(1e-2), iterations=1, lam=1e-9,
                     mesh=multi, progress=False)
    h1 = dsm.finetune(m1, optax.adam(1e-2), iterations=2, lam=1e-9,
                      mesh=multi, axis="b", progress=False)
    h2 = dsm.finetune(m2, optax.adam(1e-2), iterations=2, lam=1e-9,
                      bucketed=True, progress=False)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-8)
