"""deepstructuredmixtures_tpu — a TPU-native JAX framework for Deep
Structured Mixtures of Gaussian Processes (DSMGP) and product-of-experts GP
baselines (PoE / gPoE / rBCM).

Brand-new implementation with the capabilities of the Julia reference
``trappmartin/DeepStructuredMixtures`` (AISTATS 2020), re-designed TPU-first:
flattened SPN plans, padded batched leaf-GP linear algebra on the MXU,
autodiff hyper-gradients with optax, and jax.sharding for multi-chip scale.
"""

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
