"""deepstructuredmixtures_tpu — a TPU-native JAX framework for Deep
Structured Mixtures of Gaussian Processes (DSMGP) and product-of-experts GP
baselines (PoE / gPoE / rBCM).

Brand-new implementation with the capabilities of the Julia reference
``trappmartin/DeepStructuredMixtures`` (AISTATS 2020), re-designed TPU-first:
flattened SPN plans, padded batched leaf-GP linear algebra on the MXU,
autodiff hyper-gradients with optax, and jax.sharding for multi-chip scale.
"""

import os as _os

import jax as _jax


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt-out via DSMGP_NO_COMPILE_CACHE).

    Large models compile dozens of per-bucket programs (e.g. 46 programs /
    ~2/3 of the first N=100k finetune iteration, BASELINE.md); the
    persistent cache amortizes that to once per machine instead of once
    per process. Cache location: $DSMGP_COMPILE_CACHE or
    ~/.cache/dsmgp_tpu/xla."""
    # "0"/"false"/"" mean "not disabled" (0/1 toggle templates)
    if _os.environ.get("DSMGP_NO_COMPILE_CACHE", "").lower() not in ("", "0", "false"):
        return
    cache_dir = _os.environ.get(
        "DSMGP_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "dsmgp_tpu", "xla"),
    )
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that takes >=2s to compile (big-bucket Cholesky
        # programs take 20-500s on this class of host)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .config import DSMGPConfig, EPS
from .kernels import IsoSE, ArdSE, IsoLinear, ArdLinear, KernelSpec
from .means import ConstMean
from .metrics import mse, sse, mae, sae, nlpd
from .datasets import nonstationary
from .models import (
    DSMGP,
    PoE,
    GPoE,
    RBCM,
    GaussianProcess,
    build_dsmgp,
    build_poe,
    build_bcm,
)
from .train import train, train_gp, finetune
from .introspect import (
    blockmatrix,
    blockindecies,
    observation_counts,
    get_log_noise,
    left_gp,
    right_gp,
    rand_init,
)
from .plotting import kernelid_function
from . import checkpoint


def prediction(model, xt):
    """Alias for ``model.predict`` (reference README API:
    ``m, s = prediction(model, testx)``)."""
    return model.predict(xt)

__all__ = [
    "DSMGPConfig",
    "EPS",
    "IsoSE",
    "ArdSE",
    "IsoLinear",
    "ArdLinear",
    "KernelSpec",
    "ConstMean",
    "mse",
    "sse",
    "mae",
    "sae",
    "nlpd",
    "nonstationary",
    "DSMGP",
    "PoE",
    "GPoE",
    "RBCM",
    "GaussianProcess",
    "build_dsmgp",
    "build_poe",
    "build_bcm",
    "train",
    "train_gp",
    "finetune",
    "prediction",
    "blockmatrix",
    "blockindecies",
    "observation_counts",
    "get_log_noise",
    "left_gp",
    "right_gp",
    "rand_init",
    "kernelid_function",
    "checkpoint",
]

__version__ = "0.1.0"
