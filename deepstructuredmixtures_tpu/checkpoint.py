"""Checkpoint / resume.

The reference has no checkpointing (SURVEY §5) — the supported workflow is
manual hyper extraction + re-injection (``README.md:58-71``). Here models
serialize completely: the tree specification (leaf observation sets, boxes,
split structure), the flat hyper vector (tied or per-leaf), the sum-edge
log-weights, and the raw data references. Restoring rebuilds the compiled
plan deterministically from the stored tree — no RNG involved.

Format: a single ``.npz`` archive (portable, dependency-free). ``save`` /
``load`` round-trip every model class (DSMGP/PoE/GPoE/RBCM).
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from .hyper import make_layout
from .kernels import KernelSpec, normalize_kernels
from .plan import build_schedule, compile_tree
from .tree import LeafNode, SplitNode, SumNode


def _tree_to_spec(node):
    if isinstance(node, LeafNode):
        return {
            "t": "leaf",
            "obs": node.obs.tolist(),
            "lb": node.lb.tolist(),
            "ub": node.ub.tolist(),
            "kernelid": int(node.kernelid),
            "mean": float(node.mean),
        }
    if isinstance(node, SplitNode):
        return {
            "t": "split",
            "dim": int(node.dim),
            "thresholds": [float(t) for t in node.thresholds],
            "lb": node.lb.tolist(),
            "ub": node.ub.tolist(),
            "children": [_tree_to_spec(c) for c in node.children],
        }
    return {
        "t": "sum",
        "logweights": np.asarray(node.logweights).tolist(),
        "is_leaf_sum": bool(node.is_leaf_sum),
        "children": [_tree_to_spec(c) for c in node.children],
    }


def _spec_to_tree(spec):
    if spec["t"] == "leaf":
        return LeafNode(
            obs=np.asarray(spec["obs"], dtype=np.int64),
            lb=np.asarray(spec["lb"], dtype=np.float64),
            ub=np.asarray(spec["ub"], dtype=np.float64),
            kernelid=spec["kernelid"],
            mean=spec["mean"],
        )
    children = [_spec_to_tree(c) for c in spec["children"]]
    if spec["t"] == "split":
        return SplitNode(
            children=children,
            dim=spec["dim"],
            thresholds=list(spec["thresholds"]),
            lb=np.asarray(spec["lb"], dtype=np.float64),
            ub=np.asarray(spec["ub"], dtype=np.float64),
        )
    return SumNode(
        children=children,
        logweights=np.asarray(spec["logweights"], dtype=np.float64),
        is_leaf_sum=spec["is_leaf_sum"],
    )


def _meta(model) -> dict:
    kernels = normalize_kernels_from_layout(model)
    return {
        "class": type(model).__name__,
        "tree": _tree_to_spec(model.root),
        "kernels": [
            {"kind": k.kind, "logl": list(k.logl), "logsigma": k.logsigma}
            for k in kernels
        ],
        "dtype": jnp.dtype(model.dtype).name,
        # False for models built with overlap=False (no D matrix /
        # shared schedule) — restore skips the O(L^2 N) analysis too
        "overlap": model.plan.overlap is not None,
        # restore must recompile with the SAME leaf-pad quantum, or a
        # TPU-default build (128 — fused-Pallas-eligible) would silently
        # come back with the flat default 8 and lose kernel eligibility
        "pad_multiple": int(model.plan.pad_multiple),
    }


def save(model, path: str):
    """Serialize a model (tree spec, data, hypers, weights) to ``path``."""
    np.savez_compressed(
        path,
        meta=json.dumps(_meta(model)),
        X=np.asarray(model.X),
        y=np.asarray(model.y),
        theta=np.asarray(model.theta),
        logweights=np.asarray(model.logweights),
    )


def normalize_kernels_from_layout(model):
    """Reconstruct KernelSpecs from the model's layout + current hypers
    (the specs' initial values are irrelevant after training)."""
    theta = np.asarray(model.theta)
    tied = theta if theta.ndim == 1 else theta[0]
    specs = []
    for k, kind in enumerate(model.layout.kinds):
        off, nl = model.layout.blocks[k]
        specs.append(
            KernelSpec(kind, tuple(tied[off : off + nl].tolist()),
                       float(tied[off + nl]))
        )
    return tuple(specs)


def save_orbax(model, path: str):
    """Serialize via orbax (async-capable, multi-host-aware checkpointing —
    the production path for sharded deployments; SURVEY §5). Stores the
    same payload as :func:`save`: tree spec + kernels as JSON metadata,
    arrays as an orbax PyTree checkpoint."""
    import orbax.checkpoint as ocp

    payload = {
        "meta": np.frombuffer(
            json.dumps(_meta(model)).encode(), dtype=np.uint8
        ).copy(),
        "X": np.asarray(model.X),
        "y": np.asarray(model.y),
        "theta": np.asarray(model.theta),
        "logweights": np.asarray(model.logweights),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload)


def load_orbax(path: str, dtype=None):
    """Restore a model saved with :func:`save_orbax`."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        data = ckptr.restore(os.path.abspath(path))
    meta = json.loads(bytes(np.asarray(data["meta"], dtype=np.uint8)).decode())
    return _restore(meta, data, dtype)


def load(path: str, dtype=None):
    """Restore a model saved with :func:`save`."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    return _restore(meta, data, dtype)


def _restore(meta, data, dtype=None):
    from . import models as modelslib

    root = _spec_to_tree(meta["tree"])
    kernels = tuple(
        KernelSpec(k["kind"], tuple(k["logl"]), k["logsigma"])
        for k in meta["kernels"]
    )
    dtype = dtype or jnp.dtype(meta["dtype"])
    X = np.asarray(data["X"])
    y = np.asarray(data["y"])

    overlap = bool(meta.get("overlap", True))
    plan = compile_tree(root, X, overlap=overlap,
                        pad_multiple=int(meta.get("pad_multiple", 8)))
    schedule = build_schedule(plan) if overlap else None
    layout = make_layout(kernels)
    cls = getattr(modelslib, meta["class"])
    model = cls(root, plan, schedule, layout, None,
                jnp.asarray(data["theta"], dtype=dtype), dtype, X=X, y=y)
    model.logweights = jnp.asarray(data["logweights"], dtype=dtype)
    return model
