"""Adaptive integration drivers: the on-device stepping loops.

Two drivers share one attempt-step core (solver-agnostic, SURVEY.md §3.1):

* ``integrate_while`` — ``lax.while_loop`` stepping with in-carry dense-output
  buffers.  Fastest forward path (runs exactly as many iterations as the
  controller takes); not reverse-differentiable by itself — the continuous
  adjoints in ``adjoint/`` wrap it in ``jax.custom_vjp``.
* ``integrate_scan`` — bounded ``lax.scan`` over ``max_steps`` with done-flag
  masking.  Reverse- and forward-mode differentiable (discrete adjoint /
  forward sensitivity, SURVEY.md C7/C10); per-step remat keeps memory at one
  carry per step.

Both integrate in *internal time* ``τ = direction · t`` so backwards solves
(adjoint passes, reference's reverse integration) reuse the same monotone
machinery.  Everything is static-shape: rejected steps write ``+inf`` into the
time buffer, so the Hermite dense output's ``searchsorted`` sees a sorted grid.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .controller import PIController, hairer_norm, initial_step_size
from .solution import DenseInterpolation

__all__ = ["integrate_while", "integrate_scan", "integrate_fixed", "IntegrateResult"]


class _State(NamedTuple):
    t: jnp.ndarray  # internal time τ
    y: jnp.ndarray
    f: jnp.ndarray  # RHS at (t, y), internal time
    dt: jnp.ndarray  # proposed next step (positive, internal)
    err_prev: jnp.ndarray
    n_acc: jnp.ndarray
    n_rej: jnp.ndarray
    nfe: jnp.ndarray
    done: jnp.ndarray
    failed: jnp.ndarray


class IntegrateResult(NamedTuple):
    dense: DenseInterpolation
    t_final: jnp.ndarray  # user time
    y_final: jnp.ndarray
    success: jnp.ndarray
    n_acc: jnp.ndarray
    n_rej: jnp.ndarray
    nfe: jnp.ndarray
    # Σ over step attempts of the tolerance-normalized local error norm,
    # kept DIFFERENTIABLE (unlike the stop-gradient controller input) so a
    # training loss can regularize it — learning dynamics that are cheap to
    # integrate (arXiv:2105.03918).  Tracked on the scan driver; None on
    # the while-loop paths (their gradients don't flow anyway).
    err_sum: jnp.ndarray = None


def _setup(f, y0, t0, t1, args, solver, rtol, atol, dt0):
    y0 = jnp.asarray(y0)
    # Probe the RHS dtype: mixed-precision problems (e.g. f32 state with f64
    # parameters) integrate in the promoted dtype so the loop carry is stable.
    f_probe = f(jnp.asarray(t0, y0.dtype), y0, args)
    dtype = jnp.result_type(y0.dtype, jnp.asarray(f_probe).dtype)
    y0 = y0.astype(dtype)
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    direction = jnp.where(t1 >= t0, jnp.ones((), dtype), -jnp.ones((), dtype))

    def f_int(tau, y, a):
        return (direction * f(direction * tau, y, a)).astype(dtype)

    tau0 = direction * t0
    tau1 = direction * t1
    f0 = f_int(tau0, y0, args)
    if dt0 is None:
        dt_init = initial_step_size(
            f_int, tau0, y0, f0, solver.error_order, rtol, atol, args
        )
        nfe0 = jnp.asarray(3, jnp.int32)
    else:
        dt_init = jnp.abs(jnp.asarray(dt0, dtype))
        nfe0 = jnp.asarray(1, jnp.int32)
    # Step-size control is non-differentiable by design: gradients through
    # dt choices are sub-tolerance artifacts, and the Hairer heuristic hits
    # sqrt(0) for zero initial states whose untaken where-branch poisons
    # reverse AD with 0·inf = NaN.
    dt_init = jax.lax.stop_gradient(dt_init)
    dt_init = jnp.minimum(dt_init, jnp.maximum(tau1 - tau0, jnp.finfo(dtype).tiny))
    state = _State(
        t=tau0,
        y=y0,
        f=f0,
        dt=dt_init,
        err_prev=jnp.asarray(1e-4, dtype),
        n_acc=jnp.asarray(0, jnp.int32),
        n_rej=jnp.asarray(0, jnp.int32),
        nfe=nfe0,
        done=tau1 <= tau0,
        failed=jnp.asarray(False),
    )
    return f_int, state, tau0, tau1, direction, dtype


def _attempt(f_int, solver, controller, rtol, atol, tau1, state, args, dtype,
             tstops=None, err_weights=None):
    """One controller-supervised step attempt. Returns (state', accept, t_new).

    ``tstops`` (internal-time, ascending) forces accepted steps to land
    exactly on those points — the high-accuracy ``saveat`` mode matching the
    reference's solver-order interpolants (C1) without a host round-trip.
    """
    dt_stab = getattr(solver, "dt_stab", None)
    if dt_stab is not None:
        # stabilized explicit solvers (RKC/ROCK family) cap dt at their
        # stability interval (C3)
        state = state._replace(dt=jnp.minimum(state.dt, jnp.asarray(dt_stab, dtype)))
    if tstops is None:
        next_stop = tau1
    else:
        n_stop = tstops.shape[0]
        idx = jnp.searchsorted(tstops, state.t, side="right")
        next_ts = tstops[jnp.clip(idx, 0, n_stop - 1)]
        next_stop = jnp.where(idx >= n_stop, tau1, jnp.minimum(next_ts, tau1))
    dt_cap = next_stop - state.t
    clamped = state.dt >= dt_cap
    dt = jnp.where(clamped, dt_cap, state.dt)
    y1, y_err, f1, nfe = solver.step(f_int, state.t, state.y, state.f, dt, args)
    # controller scalars are non-differentiable (see dt_init note in _setup)
    err = jax.lax.stop_gradient(
        hairer_norm(y_err, state.y, y1, rtol, atol, err_weights)
    )
    # Differentiable error accumulator (arXiv:2105.03918) — NOT the
    # controller's copy: ε-smoothed scaled norm (bare sqrt'(0) = inf would
    # NaN gradients at exactly-zero local error, e.g. a zero-initialized
    # missing-term net; the chain rule through mean(ratio²)'s zero gradient
    # makes the smoothed form's gradient exactly 0 there), with non-finite
    # ratios zeroed so rejected blow-up attempts contribute nothing instead
    # of hairer_norm's gradient-free 1e10 clamp.
    scale = atol + rtol * jax.lax.stop_gradient(
        jnp.maximum(jnp.abs(state.y), jnp.abs(y1))
    )
    ratio = y_err / scale
    ratio = jnp.where(jnp.isfinite(ratio), ratio, 0.0)
    err_diff = jnp.sqrt(jnp.mean(ratio * ratio) + 1e-12)
    accept = err <= 1.0
    dt_next, err_prev = controller.next_dt(
        dt, err, state.err_prev, accept, solver.error_order
    )
    # A step artificially shortened to hit a stop must not shrink the
    # controller's running proposal.
    dt_next = jnp.where(clamped & accept, jnp.maximum(dt_next, state.dt), dt_next)
    t_new = jnp.where(clamped, next_stop, state.t + dt)
    reached = accept & (t_new >= tau1)
    eps = jnp.finfo(dtype).eps
    dt_min = 16.0 * eps * jnp.maximum(jnp.abs(state.t), jnp.abs(tau1))
    underflow = (dt_next < dt_min) & ~reached
    new = _State(
        t=jnp.where(accept, t_new, state.t),
        y=jnp.where(accept, y1, state.y),
        f=jnp.where(accept, f1, state.f),
        dt=jnp.maximum(dt_next, jnp.finfo(dtype).tiny),
        err_prev=err_prev,
        n_acc=state.n_acc + accept.astype(jnp.int32),
        n_rej=state.n_rej + (~accept).astype(jnp.int32),
        nfe=state.nfe + jnp.asarray(nfe, jnp.int32),
        done=state.done | reached | underflow,
        failed=state.failed | underflow,
    )
    return new, accept, t_new, y1, f1, err_diff


def _result(buf_t, buf_y, buf_f, state, direction, tau1, nodes=2):
    num_points = state.n_acc + 1
    success = ~state.failed & state.done
    dense = DenseInterpolation(
        ts=buf_t, ys=buf_y, fs=buf_f, num_points=num_points,
        direction=direction, nodes=nodes,
    )
    return IntegrateResult(
        dense=dense,
        t_final=direction * state.t,
        y_final=state.y,
        success=success,
        n_acc=state.n_acc,
        n_rej=state.n_rej,
        nfe=state.nfe,
    )


def integrate_while(
    f, y0, t0, t1, args, solver, rtol, atol, dt0=None, max_steps=4096,
    controller=PIController(), tstops=None, err_weights=None,
):
    f_int, state, tau0, tau1, direction, dtype = _setup(
        f, y0, t0, t1, args, solver, rtol, atol, dt0
    )
    if tstops is not None:
        tstops = jnp.sort(direction * jnp.asarray(tstops, dtype))
    dim = state.y.shape[0]
    cap = max_steps + 1
    inf = jnp.asarray(jnp.inf, dtype)
    buf_t = jnp.full((cap,), inf, dtype).at[0].set(tau0)
    buf_y = jnp.zeros((cap, dim), dtype).at[0].set(state.y)
    buf_f = jnp.zeros((cap, dim), dtype).at[0].set(state.f)

    def cond(carry):
        state, *_ = carry
        return ~state.done & (state.n_acc + state.n_rej < max_steps)

    def body(carry):
        state, buf_t, buf_y, buf_f = carry
        new, accept, t_new, y1, f1, _ = _attempt(
            f_int, solver, controller, rtol, atol, tau1, state, args, dtype,
            tstops, err_weights,
        )
        idx = state.n_acc + 1  # rejected attempts rewrite the same slot
        buf_t = buf_t.at[idx].set(jnp.where(accept, t_new, inf))
        buf_y = buf_y.at[idx].set(y1)
        buf_f = buf_f.at[idx].set(f1)
        return new, buf_t, buf_y, buf_f

    state, buf_t, buf_y, buf_f = jax.lax.while_loop(
        cond, body, (state, buf_t, buf_y, buf_f)
    )
    state = state._replace(failed=state.failed | ~state.done)
    return _result(buf_t, buf_y, buf_f, state, direction, tau1,
                   nodes=getattr(solver, "dense_nodes", 2))


def integrate_scan(
    f, y0, t0, t1, args, solver, rtol, atol, dt0=None, max_steps=1024,
    controller=PIController(), checkpoint=True, tstops=None,
):
    f_int, state, tau0, tau1, direction, dtype = _setup(
        f, y0, t0, t1, args, solver, rtol, atol, dt0
    )
    if tstops is not None:
        tstops = jnp.sort(direction * jax.lax.stop_gradient(jnp.asarray(tstops, dtype)))
    y0_arr, f0 = state.y, state.f
    inf = jnp.asarray(jnp.inf, dtype)

    zero = jnp.zeros((), dtype)

    def body(state, _):
        def stepped(state):
            new, accept, t_new, y1, f1, err_diff = _attempt(
                f_int, solver, controller, rtol, atol, tau1, state, args, dtype,
                tstops,
            )
            out_t = jnp.where(accept, t_new, inf)
            return new, (out_t, y1, f1, err_diff)

        def passthrough(state):
            return state, (inf, state.y, state.f, zero)

        return jax.lax.cond(state.done, passthrough, stepped, state)

    if checkpoint:
        body = jax.checkpoint(body)
    state, (out_t, out_y, out_f, out_err) = jax.lax.scan(
        body, state, None, length=max_steps
    )
    state = state._replace(failed=state.failed | ~state.done)
    err_sum = jnp.sum(out_err)

    # Prepend the initial point, then sort: accepted times are increasing and
    # rejected/idle slots hold +inf, so a stable argsort compacts the valid
    # prefix while leaving invalid entries past ``num_points``.
    buf_t = jnp.concatenate([tau0[None], out_t])
    buf_y = jnp.concatenate([y0_arr[None], out_y])
    buf_f = jnp.concatenate([f0[None], out_f])
    order = jnp.argsort(buf_t, stable=True)
    res = _result(buf_t[order], buf_y[order], buf_f[order], state, direction,
                  tau1, nodes=getattr(solver, "dense_nodes", 2))
    return res._replace(err_sum=err_sum)


def integrate_fixed(f, y0, t0, t1, args, solver, n_steps):
    """Fixed-step integration over ``n_steps`` equal steps (no controller).

    Used by the convergence-order test suite (the empirical checksum on every
    tableau) and as the drift stepper baseline for SDE methods.  Differentiable
    in both modes (plain ``lax.scan``).  Returns ``(ts, ys)`` including the
    initial point: shapes ``(n_steps+1,)`` and ``(n_steps+1, dim)``.
    """
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    dt = (t1 - t0) / n_steps

    def body(carry, i):
        t, y, fval = carry
        y1, _, f1, _ = solver.step(f, t, y, fval, dt, args)
        t_new = t0 + (i + 1) * dt
        return (t_new, y1, f1), (t_new, y1)

    f0 = f(t0, y0, args)
    _, (ts, ys) = jax.lax.scan(body, (t0, y0, f0), jnp.arange(n_steps))
    return jnp.concatenate([t0[None], ts]), jnp.concatenate([y0[None], ys])
