"""Global configuration for the TPU-native DSMGP framework.

Mirrors the reference's module constants (reference:
``src/DeepStructuredMixtures.jl:27`` — global jitter ``const ϵ = 1e-8``) and
the single immutable ``DSMGPConfig`` flag struct
(``src/DeepStructuredMixtures.jl:91-101``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

# Global jitter added to the noisy diagonal of every training covariance
# (reference: DeepStructuredMixtures.jl:27 and gaussianprocess.jl:94).
EPS = 1e-8


def default_dtype():
    """float64 when jax x64 is enabled, float32 otherwise.

    The reference is float64-LAPACK throughout; enable ``jax_enable_x64`` to
    reproduce its numerics (parity gate 1e-6). The TPU fast path is float32.
    """
    from jax import config as _c

    return jnp.float64 if _c.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class DSMGPConfig:
    """Structure-builder configuration.

    Field-for-field equivalent of the reference ``DSMGPConfig``
    (``src/DeepStructuredMixtures.jl:91-101``), but with unambiguous names:
    the reference's builder arguments (K, V) are swapped relative to the
    struct fields (see ``src/treeStructure.jl:405-418`` vs. the README) —
    here ``V`` is ALWAYS the number of children per sum node and ``K`` ALWAYS
    the number of splits per split node.
    """

    mean_fun: Optional[object]  # ConstMean or None (per-leaf mean of y)
    kernels: Union[object, Sequence[object]]  # KernelSpec or list thereof
    observation_noise: float  # log noise (reference: logNoise)
    min_data: int  # minimum observations per expert (M)
    K: int  # splits per split node
    V: int  # children per sum node
    depth: int  # maximum depth in sum layers
    bnoise: float  # split-position noise epsilon
    sum_root: bool  # use a sum node as root


def as_2d(x) -> np.ndarray:
    """Coerce inputs to an (N, D) float array (reference assumes matrices)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2:
        raise ValueError(f"expected 1-D or 2-D input array, got shape {x.shape}")
    return x
