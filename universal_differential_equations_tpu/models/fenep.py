"""FENE-P non-Newtonian rheology UDE (``NonNewtonianFluids/FENEP.jl``).

Ground truth: the 6-equation FENE-P constitutive model — 3 differential
stress equations + 3 algebraic conformation relations — an index-1 DAE solved
natively by the BDF solver with a ``differential_vars`` mask (the reference
uses Sundials IDA, ``FENEP.jl:24-39``; SURVEY.md C4).

Surrogate: a 1-state UDE whose RHS is a tiny NN ``f1([σ̃, γ̇(t)])`` with a
second NN ``f0([σ̃, γ̇(t)])`` as the stress observation map
(``FENEP.jl:41-62``), trained across a family of oscillatory strain rates and
tested on a held-out frequency against the exact DAE solution.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..core.problem import DAEProblem
from ..nn.layers import MLP
from ..solvers.bdf import daeint

__all__ = ["fenep_residual", "fenep_stiff_rhs", "find_sigma_exact",
           "find_sigma_exact_ode", "make_surrogate", "P_FENEP"]

P_FENEP = (2.0, 4.0, 2.0)  # λ, η, L (FENEP.jl:27-29)


def fenep_residual(gamma_d: Callable, p=P_FENEP):
    """DAE residual F(t, u, du) for states (θ11, θ22, θ12, τ11, τ22, τ12)
    (``FENEP.jl:9-22``)."""
    lam, eta, L = p

    def F(t, u, du, args):
        th11, th22, th12, t11, t22, t12 = u
        a = L**2 / (L**2 - 3.0)
        f_lam = (L**2 + (lam / eta / a) * (t22 + t11)) / (L**2 - 3.0)
        gd = gamma_d(t)
        return jnp.array([
            t11 + du[0] - 2.0 * lam * gd * t12 / f_lam,
            t22 + du[1],
            t12 + du[2] - lam * gd * t22 / f_lam - eta / f_lam * gd,
            th11 - lam * t11 / f_lam,
            th22 - lam * t22 / f_lam,
            th12 - lam * t12 / f_lam,
        ])

    return F


def find_sigma_exact(tsave, gamma_d, p=P_FENEP, rtol=1e-7, atol=1e-9,
                     max_steps=16384, x64_host: bool = True):
    """Exact shear stress τ12(t) from the native DAE solve
    (``find_σ_exact``, ``FENEP.jl:24-39``).

    ``x64_host=True`` runs the truth solve in float64 on the host CPU when
    the session is float32 — tight-tolerance truth generation is exactly the
    C27 case where f32 Newton cannot meet the error test; training stays in
    the session dtype.
    """
    import numpy as np

    def _solve():
        lam, eta, L = p
        u0 = jnp.zeros(6)
        du0 = jnp.zeros(6).at[2].set(eta * gamma_d(0.0) * (L**2 - 3.0) / L**2)
        prob = DAEProblem(
            f=fenep_residual(gamma_d, p),
            u0=u0, du0=du0,
            tspan=(float(tsave[0]), float(tsave[-1])),
            differential_vars=jnp.array([True, True, True, False, False, False]),
        )
        sol = daeint(prob, saveat=jnp.asarray(tsave, jnp.zeros(()).dtype),
                     rtol=rtol, atol=atol, max_steps=max_steps)
        return sol.ys[:, 5], sol.success  # τ12 column

    session_dtype = jnp.zeros(()).dtype
    if x64_host and session_dtype == jnp.float32:
        with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
            ys, ok = _solve()
            ys, ok = np.asarray(ys), bool(ok)
        return jnp.asarray(ys, session_dtype), ok
    return _solve()


def fenep_stiff_rhs(gamma_d: Callable, p=P_FENEP):
    """Explicit stiff-ODE form of the FENE-P model in the conformation
    variables θ = (θ11, θ22, θ12).

    The algebraic half of the DAE (``FENEP.jl:9-22``) is index-1 —
    ``θij = λ·τij/f(τ)`` with ``f`` depending only on ``τ11+τ22`` — so it
    inverts in closed form: ``f(θ) = L² / ((L²−3) − (θ11+θ22)/(η·a))`` and
    ``τij = θij·f/λ``.  The three differential equations then close as an
    explicit stiff ODE, the consumer path for the ESDIRK solvers
    (Kvaerno3/SDIRK4): solving it must reproduce the BDF DAE's τ12.

    Returns ``(rhs, tau_of_theta)``: the ODE rhs over θ and the readout
    mapping θ → (τ11, τ22, τ12).
    """
    lam, eta, L = p
    a = L**2 / (L**2 - 3.0)

    def f_of_theta(theta):
        return L**2 / ((L**2 - 3.0) - (theta[0] + theta[1]) / (eta * a))

    def tau_of_theta(theta):
        return theta * f_of_theta(theta) / lam

    def rhs(t, theta, args):
        f = f_of_theta(theta)
        t11, t22, t12 = theta * f / lam
        gd = gamma_d(t)
        return jnp.array([
            -t11 + 2.0 * lam * gd * t12 / f,
            -t22,
            -t12 + lam * gd * t22 / f + eta * gd / f,
        ])

    return rhs, tau_of_theta


def find_sigma_exact_ode(tsave, gamma_d, solver, p=P_FENEP, rtol=1e-7,
                         atol=1e-9, max_steps=16384, x64_host: bool = True):
    """Exact τ12(t) via the index-1-reduced stiff ODE and an implicit solver
    (Kvaerno3/SDIRK4/Rosenbrock23) — the cross-validation path for the BDF
    DAE truth of :func:`find_sigma_exact` (``FENEP.jl:35-39`` role)."""
    import numpy as np

    from ..adjoint.sensitivity import NoAdjoint
    from ..api import solve
    from ..core.problem import ODEProblem

    def _solve():
        rhs, tau_of_theta = fenep_stiff_rhs(gamma_d, p)
        theta0 = jnp.zeros(3)
        prob = ODEProblem(rhs, theta0,
                          (float(tsave[0]), float(tsave[-1])), None)
        sol = solve(prob, solver,
                    saveat=jnp.asarray(tsave, jnp.zeros(()).dtype),
                    rtol=rtol, atol=atol, adjoint=NoAdjoint(),
                    max_steps=max_steps)
        tau12 = jax.vmap(tau_of_theta)(sol.ys)[:, 2]
        return tau12, sol.success

    session_dtype = jnp.zeros(()).dtype
    if x64_host and session_dtype == jnp.float32:
        with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
            ys, ok = _solve()
            ys, ok = np.asarray(ys), bool(ok)
        return jnp.asarray(ys, session_dtype), ok
    return _solve()


def make_surrogate(key, hidden: int = 4, linear: bool = False, dtype=None):
    """The reference's two tiny nets: ``f1`` (latent dynamics) and ``f0``
    (stress readout), 2→4→1 tanh, or the linear baseline (``FENEP.jl:83-86``).
    Returns (f1_net, f0_net, params0)."""
    if dtype is None:
        dtype = jnp.zeros(()).dtype
    if linear:
        f1 = MLP([2, 1], activation="identity")
        f0 = MLP([2, 1], activation="identity")
    else:
        f1 = MLP([2, hidden, 1], activation="tanh")
        f0 = MLP([2, hidden, 1], activation="tanh")
    k1, k2 = jax.random.split(key)
    params0 = {"f1": f1.init(k1, dtype), "f0": f0.init(k2, dtype)}
    return f1, f0, params0
