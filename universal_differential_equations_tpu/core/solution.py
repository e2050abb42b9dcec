"""Solution containers and on-device dense output.

Covers the reference's ``ODESolution`` usage surface: ``Array(solution)`` on a
``saveat`` grid (``LotkaVolterra/scenario_1.jl:41-44``), continuous evaluation
``sol(t)`` and derivative interpolation ``sol(t, Val{1})`` used as ideal SINDy
targets (``scenario_1.jl:46``, SURVEY.md C2).

Dense output is a fixed-capacity buffer of accepted steps ``(t_i, y_i, f_i)``
with cubic-Hermite interpolation between them — static shapes throughout so the
whole thing lives on device, vmaps, and evaluates as one gathered, fused
computation (no host round-trips).  Hermite interpolation on the accepted-step
grid is 4th-order accurate, matching the order of Tsit5's free interpolant.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["DenseInterpolation", "Solution"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseInterpolation:
    """Cubic-Hermite dense output over the accepted-step grid.

    Buffers have static capacity ``max_steps + 1``; ``num_points`` (a traced
    int) gives the number of valid entries.  Entries past ``num_points`` hold
    ``t = +inf`` so that ``searchsorted`` lands queries in the last valid
    interval.
    """

    ts: jnp.ndarray  # (cap,)
    ys: jnp.ndarray  # (cap, dim)
    fs: jnp.ndarray  # (cap, dim)  RHS values at ts
    num_points: jnp.ndarray  # scalar int32
    direction: jnp.ndarray  # scalar, +1.0 or -1.0

    @property
    def t0(self):
        return self.ts[0] * self.direction

    @property
    def t1(self):
        cap = self.ts.shape[0]
        idx = jnp.clip(self.num_points - 1, 0, cap - 1)
        return self.ts[idx] * self.direction

    def _interval(self, t):
        """Locate the interval index for internal (direction-scaled) time t."""
        cap = self.ts.shape[0]
        hi = jnp.clip(self.num_points - 1, 1, cap - 1)
        idx = jnp.searchsorted(self.ts, t, side="right") - 1
        return jnp.clip(idx, 0, hi - 1)

    def _hermite(self, t, derivative: bool):
        t = t * self.direction
        # Clamp to the covered range: a failed/truncated solve (divergence,
        # step-budget exhaustion) holds its last valid state instead of
        # extrapolating the local cubic to astronomical values — the analogue
        # of the reference's truncated solution arrays on failure, and what
        # keeps ensemble fault-masking losses finite (SURVEY.md §5).
        cap = self.ts.shape[0]
        last = self.ts[jnp.clip(self.num_points - 1, 0, cap - 1)]
        t = jnp.clip(t, self.ts[0], last)
        i = self._interval(t)
        t0, t1 = self.ts[i], self.ts[i + 1]
        y0, y1 = self.ys[i], self.ys[i + 1]
        f0, f1 = self.fs[i], self.fs[i + 1]
        h = t1 - t0
        h = jnp.where(h == 0, jnp.ones_like(h), h)
        s = (t - t0) / h
        if not derivative:
            h00 = (1 + 2 * s) * (1 - s) ** 2
            h10 = s * (1 - s) ** 2
            h01 = s * s * (3 - 2 * s)
            h11 = s * s * (s - 1)
            return h00 * y0 + (h10 * f0 + h11 * f1) * h + h01 * y1
        # d/dt of the Hermite basis (chain rule through s = (t - t0)/h);
        # an extra `direction` factor converts back to user time.
        dh00 = 6 * s * (s - 1) / h
        dh10 = (3 * s * s - 4 * s + 1) / h
        dh01 = -6 * s * (s - 1) / h
        dh11 = (3 * s * s - 2 * s) / h
        val = dh00 * y0 + (dh10 * f0 + dh11 * f1) * h + dh01 * y1
        return val * self.direction

    def evaluate(self, t):
        """y(t) for scalar or array ``t`` (vectorized via vmap)."""
        t = jnp.asarray(t)
        if t.ndim == 0:
            return self._hermite(t, derivative=False)
        return jax.vmap(lambda tt: self._hermite(tt, derivative=False))(t)

    def derivative(self, t):
        """dy/dt(t) — the reference's ``sol(t, Val{1})`` (SURVEY.md C2)."""
        t = jnp.asarray(t)
        if t.ndim == 0:
            return self._hermite(t, derivative=True)
        return jax.vmap(lambda tt: self._hermite(tt, derivative=True))(t)

    def __call__(self, t, nu: int = 0):
        if nu == 0:
            return self.evaluate(t)
        if nu == 1:
            return self.derivative(t)
        raise ValueError("only nu in (0, 1) supported")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Solution:
    """Result of ``solve``.

    ``ts``/``ys`` are the ``saveat`` grid (or ``(t0, t1)`` endpoints when no
    ``saveat`` was given).  ``ys`` leaves have shape ``(len(ts), *state)``.
    ``success`` is False where the integrator hit ``max_steps`` or a dt
    underflow (the per-run fault signal used by the ensemble layer in place of
    the reference's try/catch — ``run_loops.jl:57-61``).
    """

    ts: jnp.ndarray
    ys: Any
    t_final: jnp.ndarray
    y_final: Any
    success: jnp.ndarray
    num_accepted: jnp.ndarray
    num_rejected: jnp.ndarray
    num_rhs_evals: jnp.ndarray
    dense: Optional[DenseInterpolation] = None
    _unravel: Optional[Callable] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    def __call__(self, t, nu: int = 0):
        if self.dense is None:
            raise ValueError("solve(..., dense=True) required for interpolation")
        flat = self.dense(t, nu)
        if self._unravel is None:
            return flat
        if flat.ndim == 1:
            return self._unravel(flat)
        return jax.vmap(self._unravel)(flat)

    @property
    def stats(self):
        return dict(
            num_accepted=self.num_accepted,
            num_rejected=self.num_rejected,
            num_rhs_evals=self.num_rhs_evals,
        )
