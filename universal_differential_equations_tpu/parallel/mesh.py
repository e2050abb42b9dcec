"""Device-mesh helpers: ensemble data parallelism over ICI (SURVEY.md §2.4).

The reference has no distributed computing; its concurrency-shaped structures
are trajectory batching and embarrassingly-parallel experiment loops.  The
TPU-native treatment: one first-class mesh axis (``"ensemble"``) over which
trajectory batches, Monte-Carlo recovery runs, multiple-shooting segments and
deep-BSDE paths are sharded with ``jax.sharding`` — XLA inserts the (only
needed) collectives: a ``psum`` for loss/grad reductions, riding ICI.

Models are tiny (SURVEY.md: largest net is 101→110→110→110→100), so
parameters are always replicated; no tensor/pipeline sharding is warranted.
On a single host this validates against a virtual CPU mesh
(``xla_force_host_platform_device_count``); on a pod slice the same code maps
over real chips, and multi-host DCN scaling needs only ``jax.distributed``
initialization up front.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ensemble_mesh", "shard_ensemble", "replicate", "ENSEMBLE_AXIS"]

ENSEMBLE_AXIS = "ensemble"


def ensemble_mesh(n_devices: Optional[int] = None, axis: str = ENSEMBLE_AXIS) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all local devices)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_ensemble(batch, mesh: Mesh, axis: str = ENSEMBLE_AXIS):
    """Shard the leading (run/trajectory) axis of every leaf across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(params, mesh: Mesh):
    """Replicate parameters across the mesh (models are tiny — SURVEY.md §2.4)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)
