"""Multi-chip DSMGP: expert-parallel training, fitting, and prediction.

Runs on any device mesh — a real TPU slice or a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip.py

The leaf experts shard across the mesh (``NamedSharding(mesh,
P('experts'))``); XLA inserts the ICI collectives for the (tiny) SPN
reductions; the hyper vector stays replicated. A single giant expert can
additionally be row-sharded through the distributed blocked Cholesky
(``GaussianProcess.fit(mesh=...)``).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import deepstructuredmixtures_tpu as dsm
from deepstructuredmixtures_tpu.parallel import (
    make_mesh,
    make_sharded_routed_predict,
    make_sharded_train_step,
)


def main():
    # Honor an explicit JAX_PLATFORMS=cpu even where a sitecustomize pins
    # the platform config (e.g. a single-chip tunnel): the documented
    # virtual-CPU-mesh invocation must actually produce the CPU devices.
    want = os.environ.get("JAX_PLATFORMS", "")
    cfg = str(jax.config.jax_platforms or "")
    if want == "cpu" and cfg and cfg != "cpu":
        try:
            from jax._src import xla_bridge as _xb

            if not _xb.backends_are_initialized():
                jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    ndev = len(jax.devices())
    print(f"{ndev} devices: {jax.devices()[0].platform}")
    mesh = make_mesh(ndev)

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 1, 2000)).reshape(-1, 1)
    y = np.sin(x[:, 0] * 4 * np.pi) + 0.2 * rng.standard_normal(2000)
    model = dsm.build_dsmgp(x, y, V=2, K=4, M=40, kernel=dsm.IsoSE(0.0, 0.0),
                            log_noise=-1.0, seed=0, do_fit=False)
    print(f"{model.num_leaves} experts sharded over {ndev} devices")

    # --- expert-parallel training step ---------------------------------
    step, init, _ = make_sharded_train_step(
        model.layout, model.plan, model.batch, mesh, optax.adam(5e-2)
    )
    theta = model.theta
    state = init(theta)
    for it in range(20):
        mll, theta, state = step(theta, state)
    model.set_params(theta)
    print(f"trained 20 steps, root mll = {float(mll):.3f}")

    # --- sharded routed prediction (fit + update + moment matching) ----
    xt = np.linspace(-0.05, 1.05, 200).reshape(-1, 1)
    tidx, tmask = model._route(xt)
    predict, prepare = make_sharded_routed_predict(
        model.layout, model.plan, model.batch, mesh
    )
    ti, tm = prepare(tidx, tmask)
    z, mean, var = predict(theta, jnp.asarray(xt, model.dtype), ti, tm)
    print(f"log evidence = {float(z):.3f}; "
          f"mean range [{float(mean.min()):.2f}, {float(mean.max()):.2f}]")

    # --- one giant expert across the whole mesh ------------------------
    gp = dsm.GaussianProcess(x, y, kernel=dsm.IsoSE(-1.5, 0.0),
                             log_noise=-1.5).fit(mesh=mesh, block=64)
    mu, v = gp.predict(xt)
    print(f"distributed giant-GP mll = {gp.mll():.3f}, "
          f"mean predictive sd = {float(np.mean(np.sqrt(np.asarray(v)))):.3f}")


if __name__ == "__main__":
    main()
