"""Problem abstractions: ODE / SDE / DAE problems and ``remake``.

TPU-native equivalents of the SciML problem types the reference scripts build:
``ODEProblem`` (reference ``LotkaVolterra/scenario_1.jl:40``), ``DAEProblem`` with a
``differential_vars`` mask (``NonNewtonianFluids/FENEP.jl:35-37``) and SDE problems
(``highdim_pde/lambaem.jl:33-34``).  Problems are immutable pytree dataclasses; the
right-hand-side callables are static (hashable) leaves so a problem can be passed
straight through ``jax.jit`` boundaries.  ``remake`` (reference ``scenario_1.jl:83``)
is a functional update.

All state handling is pytree-based: ``u0`` may be any pytree of arrays; solvers
internally ravel it to a flat vector (the TPU-friendly layout for dense-output
buffers) and unravel on the way out.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax

__all__ = ["ODEProblem", "SDEProblem", "DAEProblem", "remake"]


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@dataclasses.dataclass(frozen=True)
class ODEProblem:
    """An initial value problem ``du/dt = f(t, u, args)`` over ``tspan``.

    ``f`` is out-of-place (functional): it returns ``du`` as a pytree matching
    ``u``.  The reference's in-place ``lotka!(du, u, p, t)`` style has no JAX
    analogue; capability parity is the out-of-place form (SURVEY.md C6).
    """

    f: Callable[[Any, Any, Any], Any]
    u0: Any
    tspan: Tuple[Any, Any]
    args: Any = None

    def __post_init__(self):
        if not callable(self.f):
            raise TypeError("ODEProblem.f must be callable f(t, u, args) -> du")


_register(ODEProblem, data_fields=("u0", "tspan", "args"), meta_fields=("f",))


@dataclasses.dataclass(frozen=True)
class SDEProblem:
    """``du = f(t, u, args) dt + g(t, u, args) dW`` over ``tspan``.

    ``g`` returns either a pytree matching ``u`` (diagonal noise) or, for the
    flat-vector case, a ``(dim, m)`` matrix (general noise with ``m`` Brownian
    motions).  ``noise_dim`` declares ``m`` for general noise; ``None`` means
    diagonal.
    """

    f: Callable[[Any, Any, Any], Any]
    g: Callable[[Any, Any, Any], Any]
    u0: Any
    tspan: Tuple[Any, Any]
    args: Any = None
    noise_dim: Optional[int] = None


_register(SDEProblem, data_fields=("u0", "tspan", "args"), meta_fields=("f", "g", "noise_dim"))


@dataclasses.dataclass(frozen=True)
class DAEProblem:
    """Implicit DAE ``F(t, u, du, args) = 0`` with a differential-variables mask.

    Mirrors the reference's Sundials ``DAEProblem(FENEP!, du0, u0, tspan, p;
    differential_vars=...)`` (``NonNewtonianFluids/FENEP.jl:35-37``).  Solved by
    the native BDF solver (no C library underneath — SURVEY.md §2.3).
    ``differential_vars`` is a boolean pytree matching ``u0``: True entries are
    differential states, False entries algebraic constraints.
    """

    f: Callable[[Any, Any, Any, Any], Any]  # F(t, u, du, args) -> residual
    u0: Any
    du0: Any
    tspan: Tuple[Any, Any]
    args: Any = None
    differential_vars: Any = None


_register(
    DAEProblem,
    data_fields=("u0", "du0", "tspan", "args"),
    meta_fields=("f", "differential_vars"),
)


def remake(problem, **updates):
    """Functional update of any problem type (reference ``scenario_1.jl:83``)."""
    return dataclasses.replace(problem, **updates)
