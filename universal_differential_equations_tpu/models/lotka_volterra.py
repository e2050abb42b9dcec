"""Lotka-Volterra UDE model family (reference ``LotkaVolterra/`` case studies).

The flagship pipeline (SURVEY.md §7 M1 / BASELINE north star): generate LV
truth at tight tolerance, corrupt with mean-proportional noise, train a UDE
whose MLP learns the missing interaction terms, recover their closed form
with SINDy, and extrapolate (``scenario_1.jl`` end-to-end).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..api import solve
from ..adjoint.sensitivity import NoAdjoint
from ..core.problem import ODEProblem
from ..nn.layers import MLP
from ..solvers.runge_kutta import Vern7

__all__ = [
    "lotka_rhs",
    "generate_data",
    "make_ude",
    "make_recovered_rhs",
    "P_TRUE",
    "U0",
]

# reference parameters and initial condition (``scenario_1.jl:37-39``).
# Created lazily (PEP 562) and cached: importing the package must not
# initialize the XLA backend, or multi-host jobs could never call
# jax.distributed.initialize() after `import universal_differential_equations_tpu`.
_LAZY_CONSTS = {
    "P_TRUE": (1.3, 0.9, 0.8, 1.8),
    "U0": (0.44249296, 4.6280594),
}


def __getattr__(name):
    if name in _LAZY_CONSTS:
        val = globals().get(name)
        if val is None:
            val = jnp.array(_LAZY_CONSTS[name])
            globals()[name] = val  # cache: later accesses skip __getattr__
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def lotka_rhs(t, u, p):
    """du1 = α u1 - β u1 u2 ; du2 = γ u1 u2 - δ u2 (``scenario_1.jl:30-35``)."""
    x, y = u[0], u[1]
    alpha, beta, gamma, delta = p[0], p[1], p[2], p[3]
    return jnp.array([alpha * x - beta * x * y, gamma * x * y - delta * y])


def generate_data(
    key,
    tspan: Tuple[float, float] = (0.0, 3.0),
    dt_save: float = 0.1,
    noise_magnitude: float = 5e-3,
    u0=None,
    p=None,
    rtol: float = 1e-12,
    atol: float = 1e-12,
):
    """Truth at Vern7/1e-12 on a 0.1-grid over the reference's (0, 3)
    training window plus mean-proportional noise (``scenario_1.jl:36-53``).
    Returns (ts, X_clean, X_noisy)."""
    u0 = __getattr__("U0") if u0 is None else u0
    p = __getattr__("P_TRUE") if p is None else p
    fdtype = jnp.result_type(float)  # honors jax_enable_x64 at call time
    ts = jnp.arange(tspan[0], tspan[1] + dt_save / 2, dt_save, dtype=fdtype)
    prob = ODEProblem(lotka_rhs, jnp.asarray(u0, fdtype), tspan,
                      jnp.asarray(p, fdtype))
    sol = solve(prob, Vern7(), saveat=ts, rtol=rtol, atol=atol,
                adjoint=NoAdjoint(), step_to_saveat=True)
    assert bool(sol.success), (
        f"truth generation failed at rtol={rtol} (f32 cannot reach "
        "1e-12-class tolerances — lower them or enable x64)")
    X = sol.ys
    x_mean = jnp.mean(X, axis=0)
    noise = noise_magnitude * x_mean * jax.random.normal(key, X.shape, X.dtype)
    return ts, X, X + noise


def make_ude(key, hidden: int = 5, depth: int = 3, activation="rbf",
             p_known=None, dtype=None):
    """Scenario-1 hybrid model: known linear physics + MLP interactions.

    ``du1 = α u1 + NN1(u)``, ``du2 = -δ u2 + NN2(u)`` with the 2→5→5→5→2
    Gaussian-RBF net (``scenario_1.jl:59-73``).  Returns ``(rhs, params0, net)``
    with ``params`` the bare NN pytree.
    """
    p_known = __getattr__("P_TRUE") if p_known is None else p_known
    sizes = [2] + [hidden] * depth + [2]
    net = MLP(sizes, activation=activation)
    if dtype is None:
        dtype = jnp.zeros(()).dtype  # follow jax_enable_x64
    params0 = net.init(key, dtype)
    alpha = float(p_known[0])
    delta = float(p_known[3])

    def rhs(t, u, params):
        nn = net.apply(params, u)
        return jnp.array([alpha * u[0] + nn[0], -delta * u[1] + nn[1]])

    return rhs, params0, net


def make_recovered_rhs(sindy_result, p_known=None):
    """Hybrid RHS with the SINDy-recovered interactions in place of the NN
    (``scenario_1.jl:183-191``): parameters are the active SINDy coefficients,
    refittable by gradient descent (C21)."""
    p_known = __getattr__("P_TRUE") if p_known is None else p_known
    interaction = sindy_result.rhs()
    alpha = float(p_known[0])
    delta = float(p_known[3])

    def rhs(t, u, p):
        term = interaction(t, u, p)
        return jnp.array([alpha * u[0] + term[0], -delta * u[1] + term[1]])

    return rhs
