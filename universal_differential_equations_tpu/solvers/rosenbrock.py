"""Rosenbrock stiff ODE solver (SURVEY.md §7 M5, C4 family).

``Rosenbrock23`` — the Shampine-Reichelt 2(3) linearly-implicit pair (the
``ode23s`` / OrdinaryDiffEq ``Rosenbrock23`` method): one Jacobian and one LU
factorization per step, three triangular solves, no Newton iteration.  The
workhorse for stiff UDEs where RKC's real-axis stability is not enough
(non-normal/oscillatory stiffness).

TPU-native shape: the Jacobian comes from ``jax.jacfwd`` of the (flat) RHS —
for the reference's problem sizes (≤ O(100) states) a dense (n, n) factor
is a single fused MXU/LU kernel, far cheaper than host round-trips to a
sparse library.  Plugs into the same adaptive drivers as the explicit
solvers via the uniform ``step`` interface.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = ["Rosenbrock23"]

_D = 1.0 / (2.0 + math.sqrt(2.0))
_E32 = 6.0 + math.sqrt(2.0)


@dataclasses.dataclass(frozen=True)
class Rosenbrock23:
    """L-stable 2nd-order Rosenbrock-W pair with 3rd-order error companion.

    ``autodiff_time=True`` also differentiates the RHS in ``t`` (needed for
    non-autonomous stiffness; costs one extra JVP per step).
    """

    autodiff_time: bool = True

    order: int = dataclasses.field(default=2, init=False)
    error_order: int = dataclasses.field(default=3, init=False)

    @property
    def name(self):
        return "Rosenbrock23"

    def step(self, f, t, y, f0, dt, args):
        n = y.shape[0]
        J = jax.jacfwd(lambda yy: f(t, yy, args))(y)
        if self.autodiff_time:
            ft = jax.jvp(lambda tt: f(tt, y, args), (t,), (jnp.ones_like(t),))[1]
        else:
            ft = jnp.zeros_like(y)

        W = jnp.eye(n, dtype=y.dtype) - (dt * _D) * J
        lu, piv = jax.scipy.linalg.lu_factor(W)
        solve = lambda b: jax.scipy.linalg.lu_solve((lu, piv), b)

        k1 = solve(f0 + (dt * _D) * ft)
        f1 = f(t + 0.5 * dt, y + 0.5 * dt * k1, args)
        k2 = solve(f1 - k1) + k1
        y1 = y + dt * k2
        f2 = f(t + dt, y1, args)
        k3 = solve(f2 - _E32 * (k2 - f1) - 2.0 * (k1 - f0) + (dt * _D) * ft)
        y_err = (dt / 6.0) * (k1 - 2.0 * k2 + k3)
        return y1, y_err, f2, 2  # f1, f2 fresh evals (J/JVP counted separately)
