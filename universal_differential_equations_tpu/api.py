"""``solve`` — the single AD-dispatching front-end (SURVEY.md C11).

The analogue of the reference's ``solve``/``concrete_solve``
(``LotkaVolterra/scenario_1.jl:40-41``, ``SEIR_exposure/seir_exposure.jl:66``):
one entry point that takes a problem, a solver, tolerances, a ``saveat`` grid
and a sensitivity algorithm, and returns a ``Solution`` whose save-grid values
are differentiable according to the chosen adjoint.

States may be arbitrary pytrees; they are raveled to flat vectors internally
(the TPU layout for dense-output buffers) and unraveled on output.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .adjoint.sensitivity import AbstractAdjoint, InterpolatingAdjoint
from .core.controller import PIController
from .core.problem import DAEProblem, ODEProblem, SDEProblem
from .core.solution import Solution
from .solvers.runge_kutta import Tsit5

__all__ = ["solve"]


def _check_saveat_in_tspan(ts, t0, t1):
    """Reject concrete saveat values outside tspan up front.

    The dense-output fill clamps to the integrated interval, so an out-of-
    range save time would otherwise return the endpoint value silently — a
    wrong answer, not an error.  Skipped when times are tracers (a jit-
    abstracted tspan is the caller's contract to keep consistent).
    """
    import numpy as np

    try:
        ts_c, t0_c, t1_c = np.asarray(ts), float(t0), float(t1)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError, TypeError):
        return
    lo, hi = min(t0_c, t1_c), max(t0_c, t1_c)
    slack = 1e-6 * max(1.0, hi - lo)  # f32 rounding of user-computed grids
    if ts_c.size and (ts_c.min() < lo - slack or ts_c.max() > hi + slack):
        raise ValueError(
            f"saveat times span [{ts_c.min()}, {ts_c.max()}] but tspan is "
            f"({t0_c}, {t1_c}): values outside tspan would be clamped to the "
            f"endpoint by dense output. Extend tspan or trim saveat.")


def solve(
    problem,
    solver=None,
    *,
    saveat=None,
    rtol: float = 1e-3,
    atol: float = 1e-6,
    dt0: Optional[float] = None,
    max_steps: Optional[int] = None,
    adjoint: Optional[AbstractAdjoint] = None,
    dense: bool = False,
    controller: Optional[PIController] = None,
    step_to_saveat: bool = False,
):
    """Solve an initial value problem on device.

    Args:
      problem: ``ODEProblem`` (``SDEProblem``/``DAEProblem`` dispatch to their
        dedicated drivers in ``solvers/``).
      solver: step method; defaults to ``Tsit5()``.
      saveat: 1-D array of output times within ``tspan`` (ascending for
        forward solves).  ``None`` saves the two endpoints.  Values off the
        step grid are filled by dense-output interpolation (C1).
      rtol / atol: PI-controller tolerances (reference's ``reltol``/``abstol``).
      dt0: initial step; ``None`` uses Hairer's automatic selection.
      max_steps: step budget (static).  Defaults to the adjoint's preference —
        4096 for while-loop paths, 512 for the bounded-scan discrete adjoint.
      adjoint: sensitivity algorithm (``sensealg``); defaults to
        ``InterpolatingAdjoint()``.
      dense: attach continuous output so ``sol(t)`` / ``sol(t, nu=1)`` work
        (C2).  Dense evaluations are not differentiated under the continuous
        adjoints — differentiate the ``saveat`` values instead.
      controller: step-size controller.
      step_to_saveat: force accepted steps to land exactly on the ``saveat``
        points (tstops-style), so saved values are solver *step* values with
        no interpolation at all — used for truth generation at 1e-12
        tolerances (C27).  Off-grid saves use the solver-order-matched dense
        output (cubic/quintic/septic Hermite windows per ``dense_nodes``).

    Returns:
      ``Solution`` with ``ts``/``ys`` on the save grid.
    """
    if isinstance(problem, SDEProblem):
        raise TypeError(
            "SDE problems need a Brownian key: use "
            "universal_differential_equations_tpu.solvers.sde.sdeint(problem, key=...)"
        )
    if isinstance(problem, DAEProblem):
        # unified front-end dispatch (C11): DAEs go to the native BDF solver
        from .solvers.bdf import daeint

        return daeint(problem, saveat=saveat, rtol=rtol, atol=atol, dt0=dt0,
                      max_steps=max_steps or 4096, dense=dense)
    if not isinstance(problem, ODEProblem):
        raise TypeError(f"unsupported problem type {type(problem)}")

    solver = Tsit5() if solver is None else solver
    adjoint = InterpolatingAdjoint() if adjoint is None else adjoint
    controller = PIController() if controller is None else controller
    if max_steps is None:
        max_steps = adjoint.default_max_steps

    t0, t1 = problem.tspan
    y0_flat, unravel = ravel_pytree(problem.u0)
    dtype = y0_flat.dtype
    user_f = problem.f

    def f_flat(t, y, args):
        du = user_f(t, unravel(y), args)
        return ravel_pytree(du)[0]

    if saveat is None:
        ts = jnp.asarray([t0, t1], dtype)
    else:
        ts = jnp.asarray(saveat, dtype)
        if ts.ndim != 1:
            raise ValueError("saveat must be a 1-D array of times")
        _check_saveat_in_tspan(ts, t0, t1)

    # Trace the RHS once on the initial state (shape-only, zero FLOPs) so a
    # u0/args/f mismatch surfaces as a named error at the solve() boundary
    # instead of a broadcasting failure deep inside the stepper.
    try:
        du_shape = jax.eval_shape(f_flat, jnp.asarray(t0, dtype), y0_flat,
                                  problem.args)
    except Exception as e:
        raise TypeError(
            f"problem.f failed when evaluated on the initial state "
            f"(u0 ravels to shape {y0_flat.shape}): {type(e).__name__}: {e}"
        ) from e
    if du_shape.shape != y0_flat.shape:
        raise ValueError(
            f"problem.f returned a pytree that ravels to shape "
            f"{du_shape.shape}, but u0 ravels to {y0_flat.shape} — du must "
            f"match the state (check remake(...) updates for shape drift)")

    tstops = ts if step_to_saveat else None
    ys_flat, res = adjoint.run(
        f_flat, y0_flat, t0, t1, problem.args, ts, solver, controller,
        rtol, atol, dt0, max_steps, tstops,
    )
    ys = jax.vmap(unravel)(ys_flat)
    return Solution(
        ts=ts,
        ys=ys,
        t_final=res.t_final,
        y_final=unravel(res.y_final),
        success=res.success,
        num_accepted=res.n_acc,
        num_rejected=res.n_rej,
        num_rhs_evals=res.nfe,
        dense=res.dense if dense else None,
        error_sum=getattr(res, "err_sum", None),
        _unravel=unravel,
    )
