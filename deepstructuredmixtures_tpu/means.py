"""Mean functions.

Equivalent of the reference ``src/means.jl`` (only ``ConstMean`` exists):
``apply_subtract!`` centers the targets at construction and ``get(m, N)``
returns the mean vector to re-add at prediction (``src/means.jl:11-18``).
In the functional JAX design a mean is just a scalar carried in the leaf
batch; ``None`` means "per-leaf ConstMean(mean(y))" as in the reference
builder default (``src/treeStructure.jl:271,292``).
"""
from __future__ import annotations

from typing import NamedTuple


class ConstMean(NamedTuple):
    """Constant mean function (reference: ``src/means.jl:7-9``)."""

    m: float


def resolve_mean(mean_fun, y) -> float:
    """Return the constant mean for a leaf's targets.

    ``None`` -> per-leaf empirical mean (reference ``treeStructure.jl:271``),
    otherwise the configured constant.
    """
    if mean_fun is None:
        return float(y.mean())
    if isinstance(mean_fun, ConstMean):
        return float(mean_fun.m)
    raise TypeError(f"unsupported mean function: {mean_fun!r}")
