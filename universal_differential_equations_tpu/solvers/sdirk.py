"""SDIRK3: L-stable singly-diagonally-implicit stiff ODE solver (C4 family).

Fills the implicit-RK slot of the build plan (SURVEY.md §7 M5,
"Rosenbrock/Kvaerno") with a 3rd-order companion to ``Rosenbrock23``:
Alexander's 3-stage stiffly-accurate SDIRK (R. Alexander, SINUM 14, 1977),
the same family as OrdinaryDiffEq's ``Kvaerno``/``KenCarp`` methods.

The diagonal ``γ`` is the root of ``x³ - 3x² + 3x/2 - 1/6`` in (1/6, 1/2)
(computed here by Newton, not tabulated), which makes the stability function
L-stable; the last stage row equals ``b`` (stiff accuracy), so ``k₃`` is the
end-point derivative for free (FSAL-like) and stiff components are damped in
the solution, not just the error test.  All three stage solves share ONE
``I - γhJ`` LU factorization (``jax.jacfwd`` Jacobian, dense — MXU-friendly
at the reference's sizes) with a fixed-length Newton scan — static shapes
throughout, so the method plugs into the same adaptive drivers and adjoints
as every explicit solver.

Embedded 2nd-order companion ``b̂`` (the unique choice with ``b̂₃ = 0``)
provides the O(h³) error estimate.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["SDIRK3"]


def _gamma():
    # root of x^3 - 3x^2 + 1.5x - 1/6 in (1/6, 1/2), by Newton in f64 host
    g = 0.44
    for _ in range(60):
        fval = g**3 - 3.0 * g**2 + 1.5 * g - 1.0 / 6.0
        dval = 3.0 * g**2 - 6.0 * g + 1.5
        g_new = g - fval / dval
        if abs(g_new - g) < 1e-17:
            return g_new
        g = g_new
    return g


_G = _gamma()
_C = (_G, (1.0 + _G) / 2.0, 1.0)
_A21 = (1.0 - _G) / 2.0
_B = (-1.5 * _G**2 + 4.0 * _G - 0.25, 1.5 * _G**2 - 5.0 * _G + 1.25, _G)
# embedded order-2 weights with b̂₃ = 0: Σb̂ = 1, Σb̂c = 1/2
_BH2 = (1.0 - 2.0 * _G) / (1.0 - _G)
_BH = (1.0 - _BH2, _BH2, 0.0)

_NEWTON_ITERS = 6


@dataclasses.dataclass(frozen=True)
class SDIRK3:
    """Alexander's L-stable, stiffly-accurate 3-stage SDIRK of order 3."""

    order: int = dataclasses.field(default=3, init=False)
    error_order: int = dataclasses.field(default=3, init=False)

    @property
    def name(self):
        return "SDIRK3"

    def step(self, f, t, y, f0, dt, args):
        n = y.shape[0]
        dtype = y.dtype
        g = jnp.asarray(_G, dtype)
        J = jax.jacfwd(lambda yy: f(t, yy, args))(y)
        W = jnp.eye(n, dtype=dtype) - (dt * g) * J
        lu, piv = jax.scipy.linalg.lu_factor(W)

        def stage(t_i, base, k_init):
            # solve k = f(t_i, base + γ·dt·k) by modified Newton on one LU
            def newton(k, _):
                r = k - f(t_i, base + (dt * g) * k, args)
                dk = jax.scipy.linalg.lu_solve((lu, piv), r)
                return k - dk, None

            k, _ = jax.lax.scan(newton, k_init, None, length=_NEWTON_ITERS)
            return k

        k1 = stage(t + _C[0] * dt, y, f0)
        k2 = stage(t + _C[1] * dt, y + dt * _A21 * k1, k1)
        k3 = stage(
            t + dt, y + dt * (_B[0] * k1 + _B[1] * k2), k2
        )
        y1 = y + dt * (_B[0] * k1 + _B[1] * k2 + _B[2] * k3)
        y_err = dt * (
            (_B[0] - _BH[0]) * k1 + (_B[1] - _BH[1]) * k2 + (_B[2] - _BH[2]) * k3
        )
        # stiff accuracy: k3 = f(t+dt, y1) at Newton convergence
        nfe = 3 * _NEWTON_ITERS
        return y1, y_err, k3, nfe
