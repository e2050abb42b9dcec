"""Fisher-KPP universal PDE (``FisherKPP/Fisher-KPP-CNN*.jl``).

Reaction–diffusion ρ_t = r·ρ(1−ρ) + D·ρ_xx on a periodic 26-point line,
method of lines (``Fisher-KPP-CNN.jl:51-67``).  The learned model is the
reference's "CNN": a pointwise reaction network + a learnable 3-tap periodic
convolution stencil scaled by D0 (``:92-126``), in three reaction variants —
the paper MLP 1→10→20→10→1, the small MLP 1→3→1 (``CNN-Small``), and the
spectral ``TensorLayer([FourierBasis(n)], 1)`` basis (``CNN-Fourier``), whose
full-training wall-clock is the repository's headline benchmark
(BASELINE.md: ≈236.8 s CPU).

TPU shape: the pointwise reaction net evaluates all 26 grid points as one
batched matmul; the stencil is two ``jnp.roll``s fused by XLA into the same
elementwise pass; the whole RHS is a handful of fused kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import MLP, FourierBasis, TensorLayer

__all__ = ["NX", "generate_data", "make_model", "true_rhs", "periodic_laplacian"]

D_TRUE = 0.01
R_TRUE = 1.0
NX = 26
DX = 0.04
T_END = 5.0
DT_SAVE = 0.5


def periodic_laplacian(u):
    """Second difference with periodic wrap, scaled by 1/dx² — roll-based,
    no dense matrix (C15)."""
    return (jnp.roll(u, 1) - 2.0 * u + jnp.roll(u, -1)) / DX**2


def rho0(dtype=jnp.float32):
    """Reference IC-1: a tanh-edged plateau (``Fisher-KPP-CNN.jl:29-31``)."""
    x = jnp.arange(NX, dtype=dtype) * DX
    amp, delta = 1.0, 0.2
    return (
        amp
        * (
            jnp.tanh((x - (0.5 - delta / 2)) / (delta / 10))
            - jnp.tanh((x - (0.5 + delta / 2)) / (delta / 10))
        )
        / 2
    )


def true_rhs(t, u, args):
    return R_TRUE * u * (1.0 - u) + D_TRUE * periodic_laplacian(u)


def generate_data(rtol=1e-8, atol=1e-10, dtype=jnp.float32):
    """Training snapshots on the reference's 0.5-spaced grid."""
    from ..adjoint.sensitivity import NoAdjoint
    from ..api import solve
    from ..core.problem import ODEProblem
    from ..solvers.runge_kutta import Tsit5

    ts = jnp.arange(0.0, T_END + DT_SAVE / 2, DT_SAVE, dtype=dtype)
    sol = solve(
        ODEProblem(true_rhs, rho0(dtype), (0.0, T_END)), Tsit5(), saveat=ts,
        rtol=rtol, atol=atol, adjoint=NoAdjoint(), step_to_saveat=True,
    )
    # truth-solve discipline (CLAUDE.md): at unreachable tolerances the
    # stepper exhausts max_steps and the clamped tail would silently
    # poison the training data
    assert bool(sol.success), "Fisher-KPP truth solve failed (tolerances?)"
    return ts, sol.ys


def make_model(key, variant: str = "mlp", dtype=jnp.float32):
    """Learnable reaction + stencil model (``nn_ode``).

    variant: 'mlp' (1→10→20→10→1), 'small' (1→3→1), 'fourier'
    (TensorLayer(FourierBasis(3)) on u/π).  Returns ``(rhs, params0)`` with
    params = {"rx": reaction params, "w": 3-tap stencil, "D0": scalar}.
    The stencil starts at the reference's [1.1, -2.5, 1.0], D0 at 6.5
    (``Fisher-KPP-CNN.jl:98-107``); the physical diffusion is
    ``D0·w/dx²``-free — the model learns D·lap as D0·(w⋆u).
    """
    if variant == "mlp":
        rx = MLP([1, 10, 20, 10, 1], activation="tanh")
        rx_params = rx.init(key, dtype)
        apply_rx = lambda p, u: rx.apply(p, u[:, None])[:, 0]
    elif variant == "small":
        rx = MLP([1, 3, 1], activation="tanh")
        rx_params = rx.init(key, dtype)
        apply_rx = lambda p, u: rx.apply(p, u[:, None])[:, 0]
    elif variant == "fourier":
        # {1, sin(u), cos(u)} on the raw state: this 3-term basis fits the
        # logistic reaction to ~1e-3 with O(1) coefficients.  The reference's
        # u/π input scaling makes the ideal coefficients ±2π² and mutually
        # canceling — a narrow optimization valley ADAM cannot traverse
        # (measured: loss floors at ~0.9 despite an ideal-parameter loss of
        # 5e-6).  Input scaling is a free design choice; parameter count (3)
        # matches the reference's benchmark row.
        basis = FourierBasis(3, include_constant=True)
        rx_params = {"w": 0.01 * jax.random.normal(key, (1, 3), dtype)}
        apply_rx = lambda p, u: (basis(u) @ p["w"][0])
    else:
        raise ValueError(f"unknown variant {variant!r}")

    params0 = {
        "rx": rx_params,
        "w": jnp.array([1.1, -2.5, 1.0], dtype),
        "D0": jnp.array(6.5, dtype),
    }

    def rhs(t, u, params):
        w = params["w"]
        conv = w[0] * jnp.roll(u, 1) + w[1] * u + w[2] * jnp.roll(u, -1)
        return apply_rx(params["rx"], u) + params["D0"] * conv

    return rhs, params0


def zero_sum_penalty(params, weight: float = 100.0):
    """Zero-sum stencil constraint (``Fisher-KPP-CNN.jl:140-143``).

    The reference penalizes ``10²·|Σw|``; the absolute value is a razor
    ridge that makes ADAM oscillate across Σw=0 and breaks quasi-Newton line
    searches.  The smooth ``10⁴·(Σw)²`` enforces the same constraint (same
    stationary set) without the kink.
    """
    s = jnp.sum(params["w"])
    return weight * weight * s * s
