"""Native BDF solver for implicit DAEs ``F(t, u, u') = 0`` (SURVEY.md C4).

The one native-code component in the reference's stack is Sundials **IDA**
(C library) solving the FENE-P constitutive DAE with a ``differential_vars``
mask (``NonNewtonianFluids/FENEP.jl:35-39``).  This module is the TPU-native
equivalent — the solver itself, not a wrapper: variable-step BDF1/2 with a
modified-Newton corrector whose Jacobian ``∂F/∂u + (α/h)·∂F/∂u'`` comes from
``jax.jacfwd`` and factorizes as one dense LU per step (MXU-friendly at the
reference's problem sizes), all inside a ``lax.while_loop`` with static
shapes.

IDA-parity semantics implemented:
* index-1 DAEs with a boolean ``differential_vars`` mask,
* algebraic variables excluded from the local error test (IDA's
  ``suppressalg``),
* consistent initialization (IDA ``calcIC``): given differential ``u0``,
  solve for the algebraic components of ``u0`` and the differential
  components of ``du0`` (``initialize_dae``),
* adaptive step control on the BDF2 predictor-corrector difference.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..core.controller import PIController
from ..core.problem import DAEProblem
from ..core.solution import DenseInterpolation, Solution

__all__ = ["daeint", "initialize_dae"]

_NEWTON_ITERS = 8
_NEWTON_TOL_FACTOR = 0.33


def initialize_dae(problem: DAEProblem, newton_iters: int = 20):
    """Consistent initialization (IDA ``calcIC``).

    Holds the differential components of ``u0`` fixed and solves
    ``F(t0, u0, du0) = 0`` for the algebraic components of ``u0`` plus the
    differential components of ``du0`` (algebraic ``du0`` components are
    irrelevant for index-1 systems and left untouched).
    """
    u0, unravel_u = ravel_pytree(problem.u0)
    du0, _ = ravel_pytree(problem.du0)
    if problem.differential_vars is None:
        diff_mask = jnp.ones_like(u0, dtype=bool)
    else:
        dv, _ = ravel_pytree(problem.differential_vars)
        diff_mask = jnp.asarray(dv, bool)
    F = problem.f
    t0 = problem.tspan[0]
    mask_f = diff_mask.astype(u0.dtype)

    def residual(z):
        u = jnp.where(diff_mask, u0, z)  # algebraic u from z
        du = jnp.where(diff_mask, z, du0)  # differential du from z
        r = ravel_pytree(F(t0, unravel_u(u), unravel_u(du), problem.args))[0]
        return r

    z = jnp.where(diff_mask, du0, u0)

    def body(z, _):
        r = residual(z)
        J = jax.jacfwd(residual)(z)
        dz = jnp.linalg.solve(J, r)
        return z - dz, None

    z, _ = jax.lax.scan(body, z, None, length=newton_iters)
    u0_new = jnp.where(diff_mask, u0, z)
    du0_new = jnp.where(diff_mask, z, du0)
    res_norm = jnp.max(jnp.abs(residual(z)))
    return unravel_u(u0_new), unravel_u(du0_new), res_norm


class _DAEState(NamedTuple):
    t: jnp.ndarray
    u: jnp.ndarray  # u_n
    u_prev: jnp.ndarray  # u_{n-1}
    du: jnp.ndarray  # derivative at u_n (for dense output)
    dt: jnp.ndarray
    dt_prev: jnp.ndarray
    err_prev: jnp.ndarray
    have_two: jnp.ndarray  # BDF2 active (False on first step)
    n_acc: jnp.ndarray
    n_rej: jnp.ndarray
    done: jnp.ndarray
    failed: jnp.ndarray


def daeint(
    problem: DAEProblem,
    *,
    saveat=None,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    dt0: Optional[float] = None,
    max_steps: int = 4096,
    controller: Optional[PIController] = None,
    initialize: bool = True,
    dense: bool = False,
    x64_host: str = "auto",
) -> Solution:
    """Solve an index-1 DAE; returns a ``Solution`` on the ``saveat`` grid.

    ``x64_host="auto"``: stiff-DAE Newton needs double precision (Sundials
    IDA is double-only for the same reason) — when the session is float32 and
    the inputs are concrete (not inside a trace), the solve runs in float64
    on the host CPU and casts back.  Pass ``x64_host="never"`` to force the
    session dtype (e.g. inside a jitted f32 training loop you accept looser
    tolerances).
    """
    controller = PIController() if controller is None else controller
    if x64_host == "auto" and jnp.zeros(()).dtype == jnp.float32:
        leaves = jax.tree.leaves((problem.u0, problem.du0, problem.args))
        traced = any(isinstance(l, jax.core.Tracer) for l in leaves)
        if not traced:
            import numpy as np

            with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
                import dataclasses as _dc

                to64 = lambda tree: jax.tree.map(
                    lambda a: jnp.asarray(np.asarray(a), jnp.float64)
                    if np.issubdtype(np.asarray(a).dtype, np.floating)
                    else jnp.asarray(np.asarray(a)),
                    tree,
                )
                prob64 = _dc.replace(
                    problem, u0=to64(problem.u0), du0=to64(problem.du0),
                    args=to64(problem.args) if problem.args is not None else None,
                )
                sol64 = daeint(
                    prob64, saveat=saveat, rtol=rtol, atol=atol, dt0=dt0,
                    max_steps=max_steps, controller=controller,
                    initialize=initialize, dense=dense, x64_host="never",
                )
                host = jax.tree.map(
                    lambda x: np.asarray(x), (sol64.ts, sol64.ys, sol64.t_final,
                                              sol64.y_final, sol64.success,
                                              sol64.num_accepted, sol64.num_rejected,
                                              sol64.num_rhs_evals),
                )
            ts_h, ys_h, tf_h, yf_h, ok_h, na, nr, ne = host
            f32 = lambda x: jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float32)
                if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
                x,
            )
            return Solution(
                ts=f32(ts_h), ys=f32(ys_h), t_final=f32(tf_h), y_final=f32(yf_h),
                success=jnp.asarray(ok_h), num_accepted=jnp.asarray(na),
                num_rejected=jnp.asarray(nr), num_rhs_evals=jnp.asarray(ne),
                dense=None, _unravel=None,
            )
    u0_tree, du0_tree = problem.u0, problem.du0
    res0 = None
    if initialize:
        u0_tree, du0_tree, res0 = initialize_dae(problem)
    u0, unravel = ravel_pytree(u0_tree)
    du0, _ = ravel_pytree(du0_tree)
    dtype = u0.dtype
    dim = u0.shape[0]
    t0, t1 = problem.tspan
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    if problem.differential_vars is None:
        diff_mask = jnp.ones((dim,), bool)
    else:
        dv, _ = ravel_pytree(problem.differential_vars)
        diff_mask = jnp.asarray(dv, bool)
    err_mask = diff_mask.astype(dtype)  # suppressalg: exclude algebraic vars
    F = problem.f
    args = problem.args

    def res_flat(t, u, du):
        return ravel_pytree(F(t, unravel(u), unravel(du), args))[0]

    if dt0 is None:
        scale0 = atol + rtol * jnp.abs(u0)
        d1 = jnp.sqrt(jnp.mean((du0 / scale0) ** 2))
        dt_init = jnp.clip(0.01 / jnp.maximum(d1, 1e-8), 1e-8, (t1 - t0) * 0.1)
    else:
        dt_init = jnp.asarray(dt0, dtype)

    cap = max_steps + 1
    inf = jnp.asarray(jnp.inf, dtype)
    buf_t = jnp.full((cap,), inf, dtype).at[0].set(t0)
    buf_y = jnp.zeros((cap, dim), dtype).at[0].set(u0)
    buf_f = jnp.zeros((cap, dim), dtype).at[0].set(du0)

    def attempt(s):
        dt = jnp.minimum(s.dt, t1 - s.t)
        clamped = s.dt >= (t1 - s.t)
        t_new = jnp.where(clamped, t1, s.t + dt)
        r = dt / jnp.maximum(s.dt_prev, 1e-30)

        # variable-step BDF2 alpha coefficients (BDF1 on the first step):
        # du ≈ (a0·u_new + rest)/dt
        a0_2 = (1.0 + 2.0 * r) / (1.0 + r)
        rest_2 = (-(1.0 + r) * s.u + (r * r / (1.0 + r)) * s.u_prev)
        a0 = jnp.where(s.have_two, a0_2, 1.0)
        rest = jnp.where(s.have_two, rest_2, -s.u)

        # predictor: quadratic Hermite extrapolation through (u_prev, u, du) —
        # O(dt³) accurate, so the predictor-corrector difference measures the
        # BDF2 LTE rather than the predictor's own error
        slope_prev = (s.u - s.u_prev) / jnp.maximum(s.dt_prev, 1e-30)
        u2nd = 2.0 * (s.du - slope_prev) / jnp.maximum(s.dt_prev, 1e-30)
        u_pred2 = s.u + dt * s.du + 0.5 * dt * dt * u2nd
        u_pred = jnp.where(s.have_two, u_pred2, s.u + dt * s.du)

        def G(v):
            return res_flat(t_new, v, (a0 * v + rest) / dt)

        J = jax.jacfwd(G)(u_pred)
        lu, piv = jax.scipy.linalg.lu_factor(J)
        scale = atol + rtol * jnp.abs(s.u)

        def newton(carry, _):
            v, rate_ok = carry
            g = G(v)
            dv = jax.scipy.linalg.lu_solve((lu, piv), g)
            v_new = v - dv
            step_norm = jnp.sqrt(jnp.mean((dv / scale) ** 2))
            return (v_new, rate_ok & jnp.isfinite(step_norm)), step_norm

        (u_new, newton_finite), step_norms = jax.lax.scan(
            newton, (u_pred, jnp.asarray(True)), None, length=_NEWTON_ITERS
        )
        newton_ok = newton_finite & (step_norms[-1] < _NEWTON_TOL_FACTOR)

        # local error: predictor-corrector difference, algebraic suppressed
        err_vec = (u_new - u_pred) * err_mask
        lte_scale = jnp.where(s.have_two, 1.0 / 6.0, 0.5)
        err = jnp.sqrt(jnp.mean((lte_scale * err_vec / scale) ** 2))
        err = jnp.where(jnp.isfinite(err) & newton_ok, err, 1e10)
        accept = err <= 1.0
        order_k = jnp.where(s.have_two, 3.0, 2.0)
        dt_next, err_prev = controller.next_dt(dt, err, s.err_prev, accept, 3)
        dt_next = jnp.where(clamped & accept, jnp.maximum(dt_next, s.dt), dt_next)
        du_new = (a0 * u_new + rest) / dt

        eps = jnp.finfo(dtype).eps
        underflow = (dt_next < 16.0 * eps * jnp.maximum(jnp.abs(s.t), jnp.abs(t1))) & ~(
            accept & clamped
        )
        new = _DAEState(
            t=jnp.where(accept, t_new, s.t),
            u=jnp.where(accept, u_new, s.u),
            u_prev=jnp.where(accept, s.u, s.u_prev),
            du=jnp.where(accept, du_new, s.du),
            dt=jnp.maximum(dt_next, jnp.finfo(dtype).tiny),
            dt_prev=jnp.where(accept, dt, s.dt_prev),
            err_prev=err_prev,
            have_two=s.have_two | accept,
            n_acc=s.n_acc + accept.astype(jnp.int32),
            n_rej=s.n_rej + (~accept).astype(jnp.int32),
            done=s.done | (accept & clamped) | underflow,
            failed=s.failed | underflow,
        )
        return new, accept, t_new, u_new, du_new

    def cond(carry):
        s, *_ = carry
        return ~s.done & (s.n_acc + s.n_rej < max_steps)

    def body(carry):
        s, bt, by, bf = carry
        new, accept, t_new, u_new, du_new = attempt(s)
        idx = s.n_acc + 1
        bt = bt.at[idx].set(jnp.where(accept, t_new, inf))
        by = by.at[idx].set(u_new)
        bf = bf.at[idx].set(du_new)
        return new, bt, by, bf

    init = _DAEState(
        t=t0, u=u0, u_prev=u0, du=du0, dt=dt_init, dt_prev=dt_init,
        err_prev=jnp.asarray(1e-4, dtype),
        have_two=jnp.asarray(False),
        n_acc=jnp.asarray(0, jnp.int32), n_rej=jnp.asarray(0, jnp.int32),
        done=t1 <= t0, failed=jnp.asarray(False),
    )
    s, buf_t, buf_y, buf_f = jax.lax.while_loop(cond, body, (init, buf_t, buf_y, buf_f))
    failed = s.failed | ~s.done

    interp = DenseInterpolation(
        ts=buf_t, ys=buf_y, fs=buf_f, num_points=s.n_acc + 1,
        direction=jnp.ones((), dtype),
    )
    if saveat is None:
        ts = jnp.stack([t0, t1])
    else:
        ts = jnp.asarray(saveat, dtype)
    ys_flat = interp.evaluate(ts)
    return Solution(
        ts=ts,
        ys=jax.vmap(unravel)(ys_flat),
        t_final=s.t,
        y_final=unravel(s.u),
        success=~failed,
        num_accepted=s.n_acc,
        num_rejected=s.n_rej,
        num_rhs_evals=(s.n_acc + s.n_rej) * jnp.asarray(_NEWTON_ITERS, jnp.int32),
        dense=interp if dense else None,
        _unravel=unravel,
    )
