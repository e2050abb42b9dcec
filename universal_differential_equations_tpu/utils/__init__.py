"""Flat-parameter utilities (SURVEY.md C13).

TPU-native replacement for the reference's ``ComponentArrays`` named flat
vectors (``scenario_2.jl:87-88``) and Flux ``destructure/restructure``
(``Fisher-KPP-CNN.jl:104-109``): ``jax.flatten_util.ravel_pytree`` plus small
helpers for gradient raveling with non-differentiable leaves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = ["ravel_pytree", "flat_dim", "zeros_like_tree", "tree_where", "tree_add", "tree_scale"]


def flat_dim(tree) -> int:
    """Total number of scalar entries in a pytree."""
    return sum(jnp.size(leaf) for leaf in jax.tree.leaves(tree))


def zeros_like_tree(tree):
    return jax.tree.map(jnp.zeros_like, tree)


def tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_scale(c, a):
    return jax.tree.map(lambda x: c * x, a)
