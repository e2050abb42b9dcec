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


# Reaction-MLP widths for the reference's wall-clock study
# (Fisher-KPP-CNN-Small.jl:88-94 with n_weights ∈ {3, 2, 1}; the study rows
# at :311-391 are labeled by parameter count — "15" counts the full p vector
# of the n_weights=3 run (10 reaction + 4 conv + 1 D0), "7"/"4" count the
# n_weights=2/1 reaction nets (3w+1 params)).
_MLP_VARIANTS = {
    "mlp": [1, 10, 20, 10, 1],  # the paper version (Fisher-KPP-CNN.jl:92-96)
    "small": [1, 3, 1],    # the "15 parameters" study row
    "small7": [1, 2, 1],   # the "7 parameters" study row
    "small4": [1, 1, 1],   # the "4 parameters" row — reference never converges
}
_FOURIER_VARIANTS = {"fourier": 3, "fourier5": 5, "fourier7": 7}


def make_model(key, variant: str = "mlp", dtype=jnp.float32):
    """Learnable reaction + stencil model (``nn_ode``).

    variant: 'mlp' (1→10→20→10→1), 'small'/'small7'/'small4' (1→w→1 with
    w = 3/2/1 — the reference study's 15/7/4-parameter rows,
    ``Fisher-KPP-CNN-Small.jl:311-391``), 'fourier'/'fourier5'/'fourier7'
    (n-term spectral reaction basis — the ``TensorLayer([FourierBasis(n)],1)``
    rows, ``Fisher-KPP-CNN-Fourier.jl:305-395``).  Returns ``(rhs, params0)``
    with params = {"rx": reaction params, "w": 3-tap stencil, "D0": scalar}.
    The stencil starts at the reference's [1.1, -2.5, 1.0], D0 at 6.5
    (``Fisher-KPP-CNN.jl:98-107``); the physical diffusion is
    ``D0·w/dx²``-free — the model learns D·lap as D0·(w⋆u).

    On grids with ``N % 1024 == 0`` the MLP variants' RHS dispatches to the
    fused Pallas reaction+stencil kernel (:mod:`..ops.pallas_stencil`) when
    running on a TPU backend — one VMEM-resident pass instead of an HBM
    round-trip per layer; the XLA path is the fallback everywhere else and
    the two agree to f32 rounding (tested in ``test_ops_misc.py``).
    """
    mlp_rx = None
    if variant in _MLP_VARIANTS:
        rx = mlp_rx = MLP(_MLP_VARIANTS[variant], activation="tanh")
        rx_params = rx.init(key, dtype)
        apply_rx = lambda p, u: rx.apply(p, u[:, None])[:, 0]
    elif variant in _FOURIER_VARIANTS:
        # {1, sin(k·u), cos(k·u)} on the raw state: the 3-term basis fits the
        # logistic reaction to ~1e-3 with O(1) coefficients.  The reference's
        # u/π input scaling makes the ideal coefficients ±2π² and mutually
        # canceling — a narrow optimization valley ADAM cannot traverse
        # (measured: loss floors at ~0.9 despite an ideal-parameter loss of
        # 5e-6).  Input scaling is a free design choice; parameter counts
        # (3/5/7) match the reference's benchmark rows.
        n = _FOURIER_VARIANTS[variant]
        basis = FourierBasis(n, include_constant=True)
        rx_params = {"w": 0.01 * jax.random.normal(key, (1, n), dtype)}
        apply_rx = lambda p, u: (basis(u) @ p["w"][0])
    else:
        raise ValueError(f"unknown variant {variant!r}")

    params0 = {
        "rx": rx_params,
        "w": jnp.array([1.1, -2.5, 1.0], dtype),
        "D0": jnp.array(6.5, dtype),
    }

    def rhs(t, u, params):
        if mlp_rx is not None and _use_fused(u):
            # the _diff wrapper keeps the RHS trainable: Pallas primal,
            # XLA-path custom_jvp for jacfwd/grad/adjoints
            from ..ops.pallas_stencil import fused_updet_rhs_diff

            return fused_updet_rhs_diff(
                u, params["w"], params["D0"],
                mlp_rx.as_matmul_params(params["rx"]),
                _FUSED_INTERPRET)
        w = params["w"]
        conv = w[0] * jnp.roll(u, 1) + w[1] * u + w[2] * jnp.roll(u, -1)
        return apply_rx(params["rx"], u) + params["D0"] * conv

    return rhs, params0


# test hook: force the fused path in Pallas interpret mode on CPU
_FUSED_INTERPRET = False


def _use_fused(u) -> bool:
    """Fused-kernel dispatch predicate: qualifying f32 grid on a TPU backend.

    ``u.shape``/``dtype`` are static under trace, so this is a Python-level
    branch — the compiled program contains exactly one of the two paths.
    The kernel assumes f32 tiles, so x64 paths fall back to XLA; and a
    ``jax.default_device(cpu)`` override (the x64-host refinement pattern)
    must win over the process-global TPU backend — ``jax.default_backend()``
    ignores it (measured), so the config default device is checked first.
    """
    if u.ndim != 1 or u.shape[0] % 1024 != 0 or u.dtype != jnp.float32:
        return False
    if _FUSED_INTERPRET:
        return True
    default_dev = jax.config.jax_default_device
    if default_dev is not None:
        # jax accepts either a Device object or a platform string here
        # (jax.config.update("jax_default_device", "cpu"))
        return getattr(default_dev, "platform", default_dev) == "tpu"
    return jax.default_backend() == "tpu"


def zero_sum_penalty(params, weight: float = 100.0):
    """Zero-sum stencil constraint (``Fisher-KPP-CNN.jl:140-143``).

    The reference penalizes ``10²·|Σw|``; the absolute value is a razor
    ridge that makes ADAM oscillate across Σw=0 and breaks quasi-Newton line
    searches.  The smooth ``10⁴·(Σw)²`` enforces the same constraint (same
    stationary set) without the kink.
    """
    s = jnp.sum(params["w"])
    return weight * weight * s * s
