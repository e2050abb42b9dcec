"""Multi-host (DCN) initialization for pod-slice ensemble scaling.

The reference is single-process (SURVEY.md §2.4 — its only concurrency is
trajectory batching and the 500-run experiment loop).  The TPU-native
scaling story for those loops beyond one host is: initialize
``jax.distributed`` once per process, then build the same one-axis
``ensemble`` mesh over ALL processes' devices — ``jax.sharding`` makes the
intra-host ICI vs cross-host DCN boundary invisible to the program; the
only collective (the loss/grad ``psum``) is laid out by XLA to ride ICI
within a slice and DCN across slices.

Single-process runs (tests, one chip, CPU meshes) need no initialization:
every helper degrades to the local-device path.

Typical pod-slice launch (same script on every host)::

    from universal_differential_equations_tpu.parallel import (
        initialize_distributed, global_ensemble_mesh, shard_ensemble)

    initialize_distributed()          # no-op on single process
    mesh = global_ensemble_mesh()     # one axis over every chip in the job
    batch = shard_ensemble(batch, mesh)
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import ENSEMBLE_AXIS

__all__ = [
    "initialize_distributed", "global_ensemble_mesh", "is_distributed",
    "process_count", "local_device_count",
]

_INITIALIZED = False

# explicit opt-in: single-chip plugins can leave pod-style metadata in the
# environment, so auto-detection misfires — multi-host jobs set this flag
# (any non-empty value) or pass coordinator_address explicitly
_OPT_IN_ENV = "UDE_DISTRIBUTED"


def is_distributed() -> bool:
    """True once ``jax.distributed`` has been initialized by us."""
    return _INITIALIZED


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` when running multi-process; no-op
    otherwise.

    Returns True if distributed mode is active.  Safe to call more than
    once and from single-process runs: without ``coordinator_address`` or
    the ``UDE_DISTRIBUTED`` environment opt-in it does nothing, so tests
    and one-host examples never pay a handshake or fail on a missing
    coordinator.  Multi-host jobs must call this before any other JAX use
    (the XLA backend must not be initialized yet).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    # any explicit argument expresses multi-process intent — silently
    # no-opping on (num_processes, process_id) alone would leave every host
    # running an independent single-process job
    explicit = any(
        v is not None for v in (coordinator_address, num_processes, process_id)
    )
    opted_in = bool(os.environ.get(_OPT_IN_ENV))
    if not explicit and not opted_in:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def process_count() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()


def global_ensemble_mesh(axis: str = ENSEMBLE_AXIS) -> Mesh:
    """One ``ensemble`` axis over every device in the job (all processes).

    After :func:`initialize_distributed`, ``jax.devices()`` enumerates the
    global device set; on a single process it equals the local set, so the
    same mesh-building code serves both. Device order is kept as JAX
    enumerates it (process-major), which places ICI neighbors adjacent on
    the axis — consecutive ensemble shards stay intra-slice and the psum's
    DCN hops are minimized.
    """
    return Mesh(np.array(jax.devices()), (axis,))
