"""SEIR exposure case study (``SEIR_exposure/seir_exposure.jl``).

7-state COVID model (S, E, I, R, N, D, C) with a quarantine-responsive
transmission rate β(t) (``seir_exposure.jl:16-30``), plus the two learned
variants: (a) the black-box neural ODE replacing 5 of 7 equations
(``:52-64``) and (b) the UDE replacing only the exposure term with an MLP on
the physics-restricted inputs ``[S/N, I, D/N]`` (``:114-130``).

TPU note: the reference works at population scale 1.4e7 in float64.  The
system is homogeneous of degree 1 in the state, so all states here are
normalized by S0 — identical dynamics with the same parameters, and f32-safe
(relative precision is what matters on the MXU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import MLP

__all__ = ["P_SEIR", "U0_NORM", "corona_rhs", "beta_t", "make_neural_ode",
           "make_exposure_ude", "true_exposure", "make_recovered_rhs"]

_S0 = 14e6
# Lazily-created device constants (PEP 562; see lotka_volterra.py — package
# import must not initialize the XLA backend, for jax.distributed):
#   P_SEIR: F, β0, α, κ, μ, σ, γ, d, λ (seir_exposure.jl:34)
#   U0_NORM: normalized by S0 — u0 = [0.9·S0, 0, 0, 0, S0, 0, 0] / S0; F is
#   an absolute import-rate parameter, so it is rescaled too (F/S0) inside
#   the RHS.
_LAZY_CONSTS = {
    "P_SEIR": (10.0, 0.5944, 0.4239, 1117.3, 0.02, 1 / 3, 1 / 5, 0.2,
               1 / 11.2),
    "U0_NORM": (0.9, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0),
}


def __getattr__(name):
    if name in _LAZY_CONSTS:
        val = globals().get(name)
        if val is None:
            val = jnp.array(_LAZY_CONSTS[name])
            globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def beta_t(t, D, N, p=None):
    """Quarantine-responsive transmission β = β0(1−α)(1−D/N)^κ
    (``seir_exposure.jl:30``)."""
    p = __getattr__("P_SEIR") if p is None else p
    beta0, alpha, kappa = p[1], p[2], p[3]
    return beta0 * (1.0 - alpha) * (1.0 - D / N) ** kappa


def corona_rhs(t, u, p):
    """Ground-truth 7-state model in normalized population units
    (``corona!``, ``seir_exposure.jl:16-29``)."""
    S, E, I, R, N, D, C = u
    F, beta0, alpha, kappa, mu, sigma, gamma, d, lam = p
    F = F / _S0  # imported-cases rate in normalized units
    bt = beta_t(t, D, N, p)
    exposure = beta0 * S * F / N + bt * S * I / N
    dS = -exposure - mu * S
    dE = exposure - (sigma + mu) * E
    dI = sigma * E - (gamma + mu) * I
    dR = gamma * I - mu * R
    dN = -mu * N
    dD = d * gamma * I - lam * D
    dC = sigma * E
    return jnp.stack([dS, dE, dI, dR, dN, dD, dC])


def true_exposure(u, p=None):
    """The quarantine-driven part of the exposure the UDE must learn:
    z = β(t)·S·I/N (``seir_exposure.jl:210``)."""
    p = __getattr__("P_SEIR") if p is None else p
    S, E, I, R, N, D, C = u
    return beta_t(0.0, D, N, p) * S * I / N


def make_neural_ode(key, width: int = 64, dtype=None, output_scale: float = 1e-5):
    """Black-box neural ODE: MLP 7→64→64→64→5 replaces (dS,dE,dI,dR,dD);
    dN and dC stay physical (``dudt_node``, ``seir_exposure.jl:55-64``).

    ``output_scale`` maps the O(1) net outputs onto the magnitude of the
    normalized derivatives (E,I,R ~1e-5/day): in the reference's raw units
    the untrained net is accidentally small relative to the states; in
    normalized units that must be explicit or early solves blow up.
    """
    if dtype is None:
        dtype = jnp.zeros(()).dtype
    net = MLP([7, width, width, width, 5], activation="tanh")
    params0 = net.init(key, dtype)
    _p = __getattr__("P_SEIR")
    mu, sigma = float(_p[4]), float(_p[5])

    def rhs(t, u, params):
        S, E, I, R, N, D, C = u
        feats = jnp.stack([S / N, E * 1e5, I * 1e5, R * 1e5, N, D / N * 1e5, C * 1e5])
        dS, dE, dI, dR, dD = output_scale * net.apply(params, feats)
        return jnp.stack([dS, dE, dI, dR, -mu * N, dD, sigma * E])

    return rhs, params0, net


def make_exposure_ude(key, width: int = 64, dtype=None):
    """UDE: MLP 3→64→64→1 on the physics-restricted features [S/N, I, D/N]
    replaces only the exposure term (``dudt_``, ``seir_exposure.jl:117-130``)."""
    if dtype is None:
        dtype = jnp.zeros(()).dtype
    net = MLP([3, width, width, 1], activation="tanh")
    params0 = net.init(key, dtype)
    p_ = __getattr__("P_SEIR")
    output_scale = 1e-5

    def rhs(t, u, params):
        S, E, I, R, N, D, C = u
        F, beta0, alpha, kappa, mu, sigma, gamma, d, lam = p_
        F = F / _S0
        z = output_scale * net.apply(
            params, jnp.stack([S / N, I * 1e5, D / N * 1e5])
        )[0]
        imported = beta0 * S * F / N
        dS = -imported - z - mu * S
        dE = imported + z - (sigma + mu) * E
        dI = sigma * E - (gamma + mu) * I
        dR = gamma * I - mu * R
        dN = -mu * N
        dD = d * gamma * I - lam * D
        dC = sigma * E
        return jnp.stack([dS, dE, dI, dR, dN, dD, dC])

    return rhs, params0, net


def make_recovered_rhs(sindy_result):
    """Swap the recovered symbolic exposure for the NN
    (``approx``, ``seir_exposure.jl:232-246``)."""
    rec = sindy_result.rhs()
    p_ = __getattr__("P_SEIR")

    def rhs(t, u, coeffs):
        S, E, I, R, N, D, C = u
        F, beta0, alpha, kappa, mu, sigma, gamma, d, lam = p_
        F = F / _S0
        z = 1e-5 * rec(t, jnp.stack([S / N, I * 1e5, D / N * 1e5]), coeffs)[0]
        imported = beta0 * S * F / N
        dS = -imported - z - mu * S
        dE = imported + z - (sigma + mu) * E
        dI = sigma * E - (gamma + mu) * I
        dR = gamma * I - mu * R
        dN = -mu * N
        dD = d * gamma * I - lam * D
        dC = sigma * E
        return jnp.stack([dS, dE, dI, dR, dN, dD, dC])

    return rhs
