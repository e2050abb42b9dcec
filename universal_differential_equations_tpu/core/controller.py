"""Adaptive step-size control (PI controller + Hairer initial-dt heuristic).

Equivalent of the error control inside the reference's ``solve(...; abstol,
reltol)`` calls (``LotkaVolterra/scenario_1.jl:41``, SURVEY.md §3.1).  Pure
scalar arithmetic — runs entirely on device inside the stepping loop.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["PIController", "hairer_norm", "initial_step_size"]


def hairer_norm(err, y0, y1, rtol, atol, weights=None):
    """Scaled RMS error norm: sqrt(mean((err / (atol + rtol*max|y|))^2)).

    ``weights`` (optional, same shape as the state) turns this into a
    *seminorm*: components with weight 0 are excluded from step control.
    Used by the continuous adjoints to drop the parameter-quadrature rows
    from the backward error test — they are passively integrated (never fed
    back into the dynamics), so controlling them only shrinks steps
    ("Hey, that's not an ODE": Faster ODE Adjoints via Seminorms,
    arXiv:2009.09457).
    """
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    ratio = err / scale
    if weights is None:
        norm = jnp.sqrt(jnp.mean(ratio * ratio))
    else:
        w = weights.astype(ratio.dtype)
        norm = jnp.sqrt(jnp.sum(w * ratio * ratio) / jnp.maximum(w.sum(), 1.0))
    # Map non-finite errors (NaN blowups) to a huge-but-finite value so the
    # controller rejects and shrinks instead of poisoning dt with NaN.
    return jnp.where(jnp.isfinite(norm), norm, jnp.full_like(norm, 1e10))


@dataclasses.dataclass(frozen=True)
class PIController:
    """Proportional–integral step controller (Hairer & Wanner II.4).

    On acceptance: ``dt *= clip(safety * err^-alpha * err_prev^beta)`` with
    ``alpha = 1/k - 0.75*beta``, ``beta = 0.4/k``, ``k`` the solver's error
    order.  On rejection: pure P shrink, capped at factor 1.
    """

    safety: float = 0.9
    factor_min: float = 0.2
    factor_max: float = 10.0
    err_floor: float = 1e-10
    err_prev_init: float = 1e-4

    def next_dt(self, dt, err, err_prev, accept, error_order):
        k = float(error_order)
        beta = 0.4 / k
        alpha = 1.0 / k - 0.75 * beta
        e = jnp.maximum(err, self.err_floor)
        fac_acc = jnp.clip(
            self.safety * e ** (-alpha) * err_prev**beta,
            self.factor_min,
            self.factor_max,
        )
        fac_rej = jnp.clip(self.safety * e ** (-1.0 / k), self.factor_min, 1.0)
        factor = jnp.where(accept, fac_acc, fac_rej)
        err_prev_new = jnp.where(accept, jnp.maximum(err, self.err_prev_init), err_prev)
        return dt * factor, err_prev_new


def initial_step_size(f, t0, y0, f0, error_order, rtol, atol, args):
    """Hairer's automatic initial step selection (Hairer I.II.4, HINIT)."""
    dtype = y0.dtype
    scale = atol + rtol * jnp.abs(y0)
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(small, jnp.asarray(1e-6, dtype), 0.01 * d0 / jnp.maximum(d1, 1e-30))
    y1 = y0 + h0 * f0
    f1 = f(t0 + h0, y1, args)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2)) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(jnp.asarray(1e-6, dtype), h0 * 1e-3),
        (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / float(error_order)),
    )
    return jnp.minimum(100.0 * h0, h1)
