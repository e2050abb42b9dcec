"""Pure-JAX BFGS with strong-Wolfe line search — on-device quasi-Newton.

The reference finishes every training run with ``BFGS`` after ADAM
(``scenario_1.jl:114-118``, ``hudson_bay.jl:144-148``; Optim.jl's
implementation with ``initial_stepnorm``).  SURVEY.md C16 ranks an on-device,
jit-compatible BFGS among the hard parts: the whole minimization — line
search included — runs inside one ``lax.while_loop`` with zero host
round-trips, so an entire ADAM→BFGS training stage is a single XLA program.

Works on pytrees (raveled internally).  Dense inverse-Hessian (models here are
tiny, n ≲ 10⁴); curvature-guarded update with automatic reset on indefinite
directions; Nocedal & Wright Alg. 3.5/3.6 bracketing + zoom line search.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = ["bfgs_minimize", "BFGSResult"]


class BFGSResult(NamedTuple):
    params: object
    value: jnp.ndarray
    grad_norm: jnp.ndarray
    iterations: jnp.ndarray
    num_evals: jnp.ndarray
    converged: jnp.ndarray
    loss_history: jnp.ndarray  # (maxiters,), +inf past convergence


class _LSState(NamedTuple):
    i: jnp.ndarray
    stage: jnp.ndarray  # 0 bracket, 1 zoom, 2 done
    a_prev: jnp.ndarray
    f_prev: jnp.ndarray
    dg_prev: jnp.ndarray
    a_cur: jnp.ndarray
    a_lo: jnp.ndarray
    f_lo: jnp.ndarray
    dg_lo: jnp.ndarray
    a_hi: jnp.ndarray
    star_a: jnp.ndarray
    star_f: jnp.ndarray
    star_g: jnp.ndarray
    nfev: jnp.ndarray


def _wolfe_line_search(fg, x, p, f0, g0, alpha0, c1=1e-4, c2=0.9, maxiter=25):
    """Strong-Wolfe line search. Returns (alpha, f, g, nfev, ok)."""
    dg0 = g0 @ p
    dtype = f0.dtype

    def phi(a):
        f, g = fg(x + a * p)
        return f, g, g @ p

    init = _LSState(
        i=jnp.asarray(0, jnp.int32),
        stage=jnp.asarray(0, jnp.int32),
        a_prev=jnp.asarray(0.0, dtype),
        f_prev=f0,
        dg_prev=dg0,
        a_cur=jnp.asarray(alpha0, dtype),
        a_lo=jnp.asarray(0.0, dtype),
        f_lo=f0,
        dg_lo=dg0,
        a_hi=jnp.asarray(0.0, dtype),
        star_a=jnp.asarray(0.0, dtype),
        star_f=f0,
        star_g=g0,
        nfev=jnp.asarray(0, jnp.int32),
    )

    def cond(s):
        return (s.stage < 2) & (s.i < maxiter)

    def body(s):
        a = jnp.where(s.stage == 0, s.a_cur, 0.5 * (s.a_lo + s.a_hi))
        f, g, dg = phi(a)
        armijo_fail = (f > f0 + c1 * a * dg0)
        curv_ok = jnp.abs(dg) <= -c2 * dg0

        def bracket(s):
            hi_found = armijo_fail | ((f >= s.f_prev) & (s.i > 0))
            to_zoom_hi = hi_found
            to_done = (~hi_found) & curv_ok
            to_zoom_rev = (~hi_found) & (~curv_ok) & (dg >= 0)
            # default: extend the bracket
            s2 = s._replace(
                a_prev=a, f_prev=f, dg_prev=dg, a_cur=2.0 * a,
                i=s.i + 1, nfev=s.nfev + 1,
            )
            s2 = s2._replace(
                stage=jnp.where(
                    to_done, jnp.int32(2),
                    jnp.where(to_zoom_hi | to_zoom_rev, jnp.int32(1), jnp.int32(0)),
                ),
                a_lo=jnp.where(to_zoom_hi, s.a_prev, jnp.where(to_zoom_rev, a, s.a_lo)),
                f_lo=jnp.where(to_zoom_hi, s.f_prev, jnp.where(to_zoom_rev, f, s.f_lo)),
                dg_lo=jnp.where(to_zoom_hi, s.dg_prev, jnp.where(to_zoom_rev, dg, s.dg_lo)),
                a_hi=jnp.where(to_zoom_hi, a, jnp.where(to_zoom_rev, s.a_prev, s.a_hi)),
                star_a=jnp.where(to_done, a, s.star_a),
                star_f=jnp.where(to_done, f, s.star_f),
                star_g=jnp.where(to_done, g, s.star_g),
            )
            return s2

        def zoom(s):
            shrink_hi = armijo_fail | (f >= s.f_lo)
            done = (~shrink_hi) & curv_ok
            flip = (~shrink_hi) & (~curv_ok) & (dg * (s.a_hi - s.a_lo) >= 0)
            new_lo = (~shrink_hi) & (~done)
            s2 = s._replace(i=s.i + 1, nfev=s.nfev + 1)
            s2 = s2._replace(
                a_hi=jnp.where(shrink_hi, a, jnp.where(flip, s.a_lo, s.a_hi)),
                a_lo=jnp.where(new_lo, a, s.a_lo),
                f_lo=jnp.where(new_lo, f, s.f_lo),
                dg_lo=jnp.where(new_lo, dg, s.dg_lo),
                stage=jnp.where(done, jnp.int32(2), jnp.int32(1)),
                star_a=jnp.where(done, a, s.star_a),
                star_f=jnp.where(done, f, s.star_f),
                star_g=jnp.where(done, g, s.star_g),
            )
            # keep best-so-far in case zoom exhausts its budget
            better = (~done) & (f < s.star_f) & ~armijo_fail
            s2 = s2._replace(
                star_a=jnp.where(better, a, s2.star_a),
                star_f=jnp.where(better, f, s2.star_f),
                star_g=jnp.where(better, g, s2.star_g),
            )
            return s2

        return jax.lax.cond(s.stage == 0, bracket, zoom, s)

    s = jax.lax.while_loop(cond, body, init)
    ok = s.stage == 2
    # Fallback when the search exhausted its budget without satisfying Wolfe:
    # use the best Armijo point found (or a_lo).
    alpha = jnp.where(ok | (s.star_a > 0), s.star_a, s.a_lo)
    return alpha, s.star_f, s.star_g, s.nfev, ok | (s.star_a > 0)


class _BFGSState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    hinv: jnp.ndarray
    k: jnp.ndarray
    nfev: jnp.ndarray
    done: jnp.ndarray
    converged: jnp.ndarray
    fails: jnp.ndarray  # consecutive line-search failures
    history: jnp.ndarray


def bfgs_minimize(
    fun: Callable,
    params0,
    *,
    maxiters: int = 1000,
    gtol: float = 1e-8,
    ftol: float = 0.0,
    initial_stepnorm: float = None,
    allow_f_increases: bool = True,
) -> BFGSResult:
    """Minimize ``fun(params)`` (scalar) over a pytree of parameters.

    ``initial_stepnorm`` scales the very first step like Optim.jl's
    ``BFGS(initial_stepnorm=0.01)`` (``scenario_1.jl:117``): the first search
    direction is rescaled to that norm.  ``allow_f_increases`` mirrors the
    reference's option (``hudson_bay.jl:147``): when False, a line-search
    failure terminates the run.

    Jit-cached on the identity of ``fun`` (and the static options): reuse
    one function object across calls to avoid retracing — eager ``lax``
    dispatch otherwise dominates small-model runs by ~20×.
    """
    return _bfgs_core(
        fun, maxiters, initial_stepnorm, allow_f_increases,
        params0, gtol, ftol,
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _bfgs_core(fun, maxiters, initial_stepnorm, allow_f_increases,
               params0, gtol, ftol):
    x0_flat, unravel = ravel_pytree(params0)
    n = x0_flat.shape[0]
    dtype = x0_flat.dtype

    _vg = jax.value_and_grad(lambda x: fun(unravel(x)))

    def fg(x):
        # pin the loss value to the parameter dtype: with x64 enabled an f32
        # model's loss can promote to f64 through Python time scalars, and a
        # mixed-dtype line-search state fails lax.cond's type check
        f, g = _vg(x.astype(dtype))
        return f.astype(dtype), g

    f0, g0 = fg(x0_flat)
    eye = jnp.eye(n, dtype=dtype)
    history0 = jnp.full((maxiters,), jnp.inf, dtype)

    init = _BFGSState(
        x=x0_flat, f=f0, g=g0, hinv=eye,
        k=jnp.asarray(0, jnp.int32), nfev=jnp.asarray(1, jnp.int32),
        done=jnp.asarray(False), converged=jnp.asarray(False),
        fails=jnp.asarray(0, jnp.int32),
        history=history0,
    )

    def cond(s):
        return ~s.done & (s.k < maxiters)

    def body(s):
        p = -(s.hinv @ s.g)
        dg0 = p @ s.g
        # reset to steepest descent on an ascent/indefinite direction
        bad = dg0 >= 0
        p = jnp.where(bad, -s.g, p)
        if initial_stepnorm is not None:
            pnorm = jnp.linalg.norm(p)
            scale = jnp.where(
                s.k == 0, initial_stepnorm / jnp.maximum(pnorm, 1e-30), 1.0
            )
            p = p * scale
        alpha, f_new, g_new, nfev_ls, ls_ok = _wolfe_line_search(
            fg, s.x, p, s.f, s.g, jnp.asarray(1.0, dtype)
        )
        x_new = s.x + alpha * p
        sk = x_new - s.x
        yk = g_new - s.g
        sy = sk @ yk
        # first-step inverse-Hessian scaling (Nocedal 6.20)
        hinv = jnp.where(
            (s.k == 0) & (sy > 0), (sy / jnp.maximum(yk @ yk, 1e-30)) * eye, s.hinv
        )
        rho = 1.0 / jnp.where(sy > 1e-12, sy, 1.0)
        v = eye - rho * jnp.outer(sk, yk)
        hinv_upd = v @ hinv @ v.T + rho * jnp.outer(sk, sk)
        hinv_new = jnp.where(sy > 1e-12, hinv_upd, hinv)

        progressed = ls_ok & (allow_f_increases | (f_new <= s.f))
        x_new = jnp.where(progressed, x_new, s.x)
        f_keep = jnp.where(progressed, f_new, s.f)
        g_keep = jnp.where(progressed, g_new, s.g)
        gnorm = jnp.max(jnp.abs(g_keep))
        # the ftol clause only counts on a *successful* step: a failed line
        # search leaves f_new == s.f and would otherwise report a stalled
        # run as converged instead of taking the reset-Hessian retry below
        conv = (gnorm < gtol) | (
            progressed & (ftol > 0)
            & (jnp.abs(f_new - s.f) <= ftol * jnp.abs(s.f))
        )
        # A failed line search gets one retry from a reset (identity-scaled)
        # inverse Hessian before terminating — quasi-Newton curvature can go
        # stale on stiff UDE loss surfaces.
        fails = jnp.where(progressed, 0, s.fails + 1).astype(jnp.int32)
        return _BFGSState(
            x=x_new, f=f_keep, g=g_keep,
            hinv=jnp.where(progressed, hinv_new, eye),
            k=s.k + 1, nfev=s.nfev + nfev_ls,
            done=conv | (fails >= 2),
            converged=conv,
            fails=fails,
            history=s.history.at[s.k].set(f_keep),
        )

    s = jax.lax.while_loop(cond, body, init)
    return BFGSResult(
        params=unravel(s.x),
        value=s.f,
        grad_norm=jnp.max(jnp.abs(s.g)),
        iterations=s.k,
        num_evals=s.nfev,
        converged=s.converged,
        loss_history=s.history,
    )
