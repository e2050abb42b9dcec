"""Ensemble / Monte-Carlo experiment runner (SURVEY.md C24, §3.6).

The reference's 500-run noise-robustness study is a *sequential* Julia loop
with ``try/catch`` fault isolation (``run_loops.jl:55-62``).  TPU-native
design: the whole ensemble is one ``vmap`` (optionally sharded over the
``ensemble`` mesh axis), and fault tolerance is *mask-and-continue* — each run
carries a finite-success flag instead of an exception, and failed runs are
excluded from aggregation exactly like the reference marks failures ``Inf``
and skips them (``loop_evaluation.jl:45-53``).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import ENSEMBLE_AXIS, ensemble_mesh, shard_ensemble

__all__ = ["EnsembleResult", "ensemble_run", "noise_schedule"]


@dataclasses.dataclass
class EnsembleResult:
    outputs: object  # pytree with leading run axis
    success: jnp.ndarray  # (n_runs,) bool — finite outputs & run-reported ok

    @property
    def num_success(self):
        return int(self.success.sum())

    def successful(self, leaf):
        """Gather a leaf's successful rows (host-side convenience)."""
        import numpy as np

        return np.asarray(leaf)[np.asarray(self.success)]


def ensemble_run(
    run_fn: Callable,
    batch_args,
    *,
    mesh=None,
    sharded: bool = False,
) -> EnsembleResult:
    """vmap ``run_fn`` over the leading axis of ``batch_args``.

    ``run_fn(args) -> (outputs, ok)`` where ``ok`` is a scalar bool (e.g.
    ``solution.success``).  Success additionally requires all output leaves
    finite (NaN-isolation in place of try/catch, SURVEY.md §5).

    With ``sharded=True`` the batch is split across the ensemble mesh axis —
    the ≥20×-vs-Julia-CPU headline axis (SURVEY.md §2.4).
    """
    if sharded:
        mesh = mesh or ensemble_mesh()
        batch_args = shard_ensemble(batch_args, mesh)

    @jax.jit
    def mapped(batch):
        outs, ok = jax.vmap(run_fn)(batch)
        finite = jax.vmap(
            lambda o: jnp.all(
                jnp.array([jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(o)])
            )
        )(outs)
        return outs, ok & finite

    outputs, success = mapped(batch_args)
    return EnsembleResult(outputs=outputs, success=success)


def noise_schedule(i, levels=(1e-3, 5e-3, 1e-2, 2.5e-2, 5e-2), runs_per_level=100):
    """The reference's escalating noise schedule: level changes every
    ``runs_per_level`` runs (``run_loops.jl:40-46``)."""
    idx = jnp.clip(i // runs_per_level, 0, len(levels) - 1)
    return jnp.asarray(levels)[idx]
