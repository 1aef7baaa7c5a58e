import os

# Run the test suite on a virtual 8-device CPU mesh with float64 enabled so
# numerics match the float64-LAPACK reference (SURVEY §4: fake-mesh CPU tests
# substitute for multi-chip hardware).
#
# NOTE: jax may already be imported by pytest plugins before this conftest
# runs, so we use jax.config (effective until first backend use) rather than
# environment variables alone.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "test suite must run on CPU"
assert jax.device_count() >= 8, "test suite needs the 8-device fake mesh"
