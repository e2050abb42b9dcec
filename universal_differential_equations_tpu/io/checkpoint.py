"""Checkpointing: pytree saves and keyed, group-appendable archives (C25).

Covers the reference's persistence patterns: JLD2 keyed result saves
(``scenario_1.jl:210-213``), append-mode per-run groups for the 500-run study
(``loop_recoveries.jl:132-140``), BSON model checkpoints
(``Fisher-KPP-CNN.jl:243-248``) and best-loss checkpointing
(``neural_pde_rayleigh_taylor_instability.jl:166-171``).

Format: one ``.npz`` file per group plus a JSON treedef sidecar — dependency-
free, readable by plain numpy, safe for concurrent appends of distinct groups
(each group is its own file, like JLD2 groups).
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "KeyedArchive", "BestCheckpoint"]


def _flatten(tree):
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat = {}
    paths = []
    for i, (path, leaf) in enumerate(leaves_with_path):
        key = f"leaf_{i}"
        flat[key] = np.asarray(leaf)
        paths.append(jax.tree_util.keystr(path))
    return flat, paths


def save_pytree(path, tree):
    """Save any pytree of arrays to ``<path>.npz`` (+ ``.tree.json`` sidecar
    recording the structure for readability/validation)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat, paths = _flatten(tree)
    np.savez(str(path) + ".npz" if not str(path).endswith(".npz") else str(path),
             **flat)
    sidecar = str(path).removesuffix(".npz") + ".tree.json"
    with open(sidecar, "w") as f:
        json.dump({"paths": paths}, f)


def load_pytree(path, like):
    """Load into the structure of ``like`` (leaf order must match the save)."""
    p = str(path)
    if not p.endswith(".npz"):
        p += ".npz"
    data = np.load(p)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class KeyedArchive:
    """Keyed, group-appendable result store (the JLD2 ``jldopen("a+")``
    pattern of ``loop_recoveries.jl:132-140``).

    Each group is a directory entry ``<root>/<group>.npz`` holding named
    arrays; append different groups freely across runs/processes.
    """

    def __init__(self, root):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def save(self, group: str, **arrays):
        flat = {}
        for name, value in arrays.items():
            leaves = jax.tree_util.tree_leaves(value)
            if len(leaves) == 1 and not isinstance(value, (dict, list, tuple)):
                flat[name] = np.asarray(value)
            else:
                for i, leaf in enumerate(leaves):
                    flat[f"{name}__{i}"] = np.asarray(leaf)
        np.savez(self.root / f"{group}.npz", **flat)

    def load(self, group: str) -> Dict[str, np.ndarray]:
        with np.load(self.root / f"{group}.npz") as data:
            return {k: data[k] for k in data.files}

    def groups(self) -> List[str]:
        return sorted(p.stem for p in self.root.glob("*.npz"))

    def __contains__(self, group: str) -> bool:
        return (self.root / f"{group}.npz").exists()


class BestCheckpoint:
    """Best-loss checkpointing hook for ``fit`` callbacks
    (``neural_pde_rayleigh_taylor_instability.jl:166-171``)."""

    def __init__(self, path):
        self.path = Path(path)
        self.best = float("inf")

    def __call__(self, step, loss, params) -> bool:
        if loss < self.best:
            self.best = loss
            save_pytree(self.path, params)
        return False  # never stops training
