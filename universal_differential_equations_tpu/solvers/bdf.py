"""Native variable-order BDF solver for implicit DAEs ``F(t, u, u') = 0`` (C4).

The one native-code component in the reference's stack is Sundials **IDA**
(C library) solving the FENE-P constitutive DAE with a ``differential_vars``
mask (``NonNewtonianFluids/FENEP.jl:35-39``).  This module is the TPU-native
equivalent — the solver itself, not a wrapper: **variable-step,
variable-order BDF (orders 1-5)**, matching IDA's method family, with a
modified-Newton corrector whose iteration matrix ``∂F/∂u + (α₀/h)·∂F/∂u'``
comes from ``jax.jacfwd`` and factorizes as one dense LU per step attempt
(MXU-friendly at the reference's problem sizes), all inside a
``lax.while_loop`` with static shapes.

Method construction (all on-device, no tabulated history interpolation):

* the BDF-k derivative formula on *actual* past times — weights are the
  derivative of the Lagrange interpolant through ``{t_{n+1}, t_n, …,
  t_{n+1-k}}`` evaluated at ``t_{n+1}`` (the fully variable-coefficient form;
  IDA's fixed-leading-coefficient form approximates the same formula),
* local truncation error from Newton divided differences of the corrected
  solution against the stored history: ``LTE_q ≈ dd[t_{n+1},…,t_{n-q}] ·
  ∏(t_{n+1}-t_j) / (q+1)`` — at constant step this reduces exactly to the
  classical BDF-q error constant ``h^{q+1} u^{(q+1)} / (q+1)``,
* DASSL-style order selection: error estimates at orders k-1, k, k+1 are
  converted to step-size factors and the order with the largest permissible
  next step wins; order is capped by available history so the startup ramps
  1→5 one order per accepted step.

IDA-parity semantics implemented:

* index-1 DAEs with a boolean ``differential_vars`` mask,
* algebraic variables excluded from the local error test (IDA's
  ``suppressalg``),
* consistent initialization (IDA ``calcIC``): given differential ``u0``,
  solve for the algebraic components of ``u0`` and the differential
  components of ``du0`` (``initialize_dae``),
* variable order 1-5 with per-step order/step adaptation (``max_order``
  trims the family, e.g. ``max_order=2`` for the A-stable subset).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..core.problem import DAEProblem
from ..core.solution import DenseInterpolation, Solution

__all__ = ["daeint", "initialize_dae"]

_NEWTON_ITERS = 8
_NEWTON_TOL_FACTOR = 0.33
_MAX_ORDER = 5
_HIST = _MAX_ORDER + 1  # history slots: u_n … u_{n-5}


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


def _bdf_weights(nodes):
    """First-derivative Lagrange weights at ``nodes[0]`` for all ``nodes``.

    ``w[j] = l_j'(nodes[0])`` so that ``u'(nodes[0]) ≈ Σ w[j]·u(nodes[j])``.
    Closed form: ``w[0] = Σ_{m≠0} 1/(x0-x_m)``;
    ``w[j≠0] = ∏_{m≠j,0}(x0-x_m) / ∏_{m≠j}(x_j-x_m)``.
    """
    x0 = nodes[0]
    n = nodes.shape[0]
    w = []
    w0 = jnp.zeros((), nodes.dtype)
    for m in range(1, n):
        w0 = w0 + 1.0 / (x0 - nodes[m])
    for j in range(1, n):
        num = jnp.ones((), nodes.dtype)
        den = nodes[j] - x0
        for m in range(1, n):
            if m == j:
                continue
            num = num * (x0 - nodes[m])
            den = den * (nodes[j] - nodes[m])
        w.append(num / den)
    return jnp.stack([w0] + w)


def _lagrange_eval_weights(xs, x):
    """Lagrange basis values at ``x`` for nodes ``xs`` (extrapolation)."""
    n = xs.shape[0]
    out = []
    for j in range(n):
        num = jnp.ones((), xs.dtype)
        den = jnp.ones((), xs.dtype)
        for m in range(n):
            if m == j:
                continue
            num = num * (x - xs[m])
            den = den * (xs[j] - xs[m])
        out.append(num / den)
    return jnp.stack(out)


class _DAEState(NamedTuple):
    t_hist: jnp.ndarray  # (HIST,) accepted times, slot 0 newest
    u_hist: jnp.ndarray  # (HIST, dim)
    du: jnp.ndarray  # derivative at the newest point (dense output, k=1 pred)
    k: jnp.ndarray  # current BDF order (int32, 1..max_order)
    n_pts: jnp.ndarray  # valid history points (int32, ≥1)
    dt: jnp.ndarray
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
    max_order: int = _MAX_ORDER,
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
    max_order = int(max_order)
    if not 1 <= max_order <= _MAX_ORDER:
        raise ValueError(f"max_order must be 1..{_MAX_ORDER}, got {max_order}")
    if x64_host == "auto" and jnp.zeros(()).dtype == jnp.float32:
        leaves = jax.tree.leaves(
            (problem.u0, problem.du0, problem.args, problem.tspan)
        )
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
                    max_steps=max_steps, max_order=max_order,
                    initialize=initialize, dense=dense, x64_host="never",
                )
                host = jax.tree.map(
                    lambda x: np.asarray(x), (sol64.ts, sol64.ys, sol64.t_final,
                                              sol64.y_final, sol64.success,
                                              sol64.num_accepted, sol64.num_rejected,
                                              sol64.num_rhs_evals),
                )
                dense_h = None
                if dense and sol64.dense is not None:
                    dense_h = jax.tree.map(
                        lambda x: np.asarray(x),
                        (sol64.dense.ts, sol64.dense.ys, sol64.dense.fs,
                         sol64.dense.num_points, sol64.dense.direction),
                    )
            ts_h, ys_h, tf_h, yf_h, ok_h, na, nr, ne = host
            f32 = lambda x: jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float32)
                if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
                x,
            )
            interp = None
            unravel32 = None
            if dense_h is not None:
                dts, dys, dfs, dnpts, ddir = dense_h
                interp = DenseInterpolation(
                    ts=f32(dts), ys=f32(dys), fs=f32(dfs),
                    num_points=jnp.asarray(dnpts), direction=f32(ddir),
                    nodes=sol64.dense.nodes,
                )
                unravel32 = ravel_pytree(problem.u0)[1]
            return Solution(
                ts=f32(ts_h), ys=f32(ys_h), t_final=f32(tf_h), y_final=f32(yf_h),
                success=jnp.asarray(ok_h), num_accepted=jnp.asarray(na),
                num_rejected=jnp.asarray(nr), num_rhs_evals=jnp.asarray(ne),
                dense=interp, _unravel=unravel32,
            )
    u0_tree, du0_tree = problem.u0, problem.du0
    if initialize:
        u0_tree, du0_tree, _ = initialize_dae(problem)
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

    # Unused history slots get distinct fake times (never selected, but they
    # flow through all per-order weight computations — keep them NaN-free).
    t_hist0 = t0 - dt_init * jnp.arange(_HIST, dtype=dtype)
    u_hist0 = jnp.tile(u0[None, :], (_HIST, 1))

    def attempt(s):
        dt = jnp.minimum(s.dt, t1 - s.t_hist[0])
        clamped = s.dt >= (t1 - s.t_hist[0])
        t_new = jnp.where(clamped, t1, s.t_hist[0] + dt)
        nodes = jnp.concatenate([t_new[None], s.t_hist])  # (HIST+1,)

        # BDF-q derivative weights and predictors for every candidate order;
        # the live order selects by take (scalars/rows — negligible cost).
        w0s, rests, preds = [], [], []
        for q in range(1, max_order + 1):
            w = _bdf_weights(jnp.concatenate([t_new[None], s.t_hist[:q]]))
            w0s.append(w[0])
            rests.append(w[1:] @ s.u_hist[:q])
            pw = _lagrange_eval_weights(s.t_hist[: q + 1], t_new)
            preds.append(pw @ s.u_hist[: q + 1])
        w0 = jnp.take(jnp.stack(w0s), s.k - 1)
        rest = jnp.take(jnp.stack(rests), s.k - 1, axis=0)
        u_pred = jnp.take(jnp.stack(preds), s.k - 1, axis=0)
        # order 1: Hermite predictor using the known derivative
        u_pred = jnp.where(s.k == 1, s.u_hist[0] + dt * s.du, u_pred)

        def G(v):
            return res_flat(t_new, v, w0 * v + rest)

        J = jax.jacfwd(G)(u_pred)
        lu, piv = jax.scipy.linalg.lu_factor(J)
        scale = atol + rtol * jnp.abs(s.u_hist[0])

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

        # Divided-difference table over {t_new, history}: dd[L] = L-th order
        # divided difference over nodes[0..L] after level L.
        vals = jnp.concatenate([u_new[None], s.u_hist])  # (HIST+1, dim)
        dd_levels = [vals[0]]  # level 0 (unused)
        d = vals
        for L in range(1, _HIST + 1):
            d = (d[:-1] - d[1:]) / (nodes[: _HIST + 1 - L] - nodes[L:])[:, None]
            dd_levels.append(d[0])

        # LTE estimate at order q: dd_{q+1} · ∏_{j=0}^{q}(t_new - t_hist[j])
        # / (q+1); valid when q+1 history points exist.
        def err_norm_at(q):
            prod = jnp.prod(t_new - s.t_hist[: q + 1])
            est = dd_levels[q + 1] * prod / (q + 1.0)
            e = jnp.sqrt(jnp.mean((est * err_mask / scale) ** 2))
            return jnp.where(jnp.isfinite(e), e, jnp.full_like(e, 1e10))

        errs_all = jnp.stack([err_norm_at(q) for q in range(1, max_order + 1)])
        # first step: no second history point — Hermite-predictor difference
        est0 = 0.5 * (u_new - u_pred) * err_mask
        err_first = jnp.sqrt(jnp.mean((est0 / scale) ** 2))
        err_first = jnp.where(jnp.isfinite(err_first), err_first, 1e10)
        first = s.n_pts == 1
        err_k = jnp.where(first, err_first, jnp.take(errs_all, s.k - 1))
        err_k = jnp.where(newton_ok, err_k, jnp.full_like(err_k, 1e10))
        accept = err_k <= 1.0

        # ---- order & step selection (DASSL-style): candidate orders
        # {k-1, k, k+1} → step factors; the largest permissible step wins.
        qs = jnp.arange(1, max_order + 1, dtype=jnp.int32)
        facs = 0.9 * jnp.maximum(errs_all, 1e-10) ** (-1.0 / (qs + 1.0))
        n_pts_new = jnp.minimum(s.n_pts + accept.astype(jnp.int32), _HIST)
        # validity: order q's divided-difference error estimate reads q+1
        # real history points (so the startup ramps one order per accepted
        # step), and only neighbours of the current order are eligible.
        valid = (qs <= s.n_pts - 1) & (jnp.abs(qs - s.k) <= 1)
        facs = jnp.where(valid, facs, -jnp.inf)
        k_best = jnp.argmax(facs).astype(jnp.int32) + 1
        fac_best = jnp.clip(jnp.take(facs, k_best - 1), 0.2, 2.5)
        fac_first = jnp.clip(0.9 * jnp.maximum(err_first, 1e-10) ** (-0.5), 0.2, 2.5)
        k_next = jnp.where(first, jnp.asarray(1, jnp.int32), k_best)
        fac = jnp.where(first, fac_first, fac_best)
        # rejection: shrink on the current order, drop an order if it helps
        err_down = jnp.take(errs_all, jnp.maximum(s.k - 2, 0))
        drop = (~first) & (s.k > 1) & (err_down < err_k)
        k_rej = jnp.where(drop, s.k - 1, s.k)
        fac_rej = jnp.clip(0.9 * jnp.maximum(err_k, 1e-10) ** (-1.0 / (s.k + 1.0)),
                           0.1, 0.9)
        k_new = jnp.where(accept, k_next, k_rej)
        dt_next = dt * jnp.where(accept, fac, fac_rej)
        dt_next = jnp.where(clamped & accept, jnp.maximum(dt_next, s.dt), dt_next)

        du_new = w0 * u_new + rest
        du_new = jnp.where(first, (u_new - s.u_hist[0]) / dt, du_new)

        eps = jnp.finfo(dtype).eps
        underflow = (dt_next < 16.0 * eps * jnp.maximum(jnp.abs(s.t_hist[0]),
                                                        jnp.abs(t1))) & ~(
            accept & clamped
        )
        t_hist_acc = jnp.concatenate([t_new[None], s.t_hist[:-1]])
        u_hist_acc = jnp.concatenate([u_new[None], s.u_hist[:-1]])
        new = _DAEState(
            t_hist=jnp.where(accept, t_hist_acc, s.t_hist),
            u_hist=jnp.where(accept, u_hist_acc, s.u_hist),
            du=jnp.where(accept, du_new, s.du),
            k=k_new,
            n_pts=jnp.where(accept, n_pts_new, s.n_pts),
            dt=jnp.maximum(dt_next, jnp.finfo(dtype).tiny),
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
        t_hist=t_hist0, u_hist=u_hist0, du=du0,
        k=jnp.asarray(1, jnp.int32), n_pts=jnp.asarray(1, jnp.int32),
        dt=dt_init,
        n_acc=jnp.asarray(0, jnp.int32), n_rej=jnp.asarray(0, jnp.int32),
        done=t1 <= t0, failed=jnp.asarray(False),
    )
    s, buf_t, buf_y, buf_f = jax.lax.while_loop(cond, body, (init, buf_t, buf_y, buf_f))
    failed = s.failed | ~s.done

    # nodes=3: quintic Hermite windows over (t, u, u') — u' is the consistent
    # DAE derivative the Newton solve produces for every component, so the
    # window is a true Hermite interpolant; O(h^6) covers BDF's max order 5.
    interp = DenseInterpolation(
        ts=buf_t, ys=buf_y, fs=buf_f, num_points=s.n_acc + 1,
        direction=jnp.ones((), dtype), nodes=3,
    )
    if saveat is None:
        ts = jnp.stack([t0, t1])
    else:
        ts = jnp.asarray(saveat, dtype)
    ys_flat = interp.evaluate(ts)
    return Solution(
        ts=ts,
        ys=jax.vmap(unravel)(ys_flat),
        t_final=s.t_hist[0],
        y_final=unravel(s.u_hist[0]),
        success=~failed,
        num_accepted=s.n_acc,
        num_rejected=s.n_rej,
        num_rhs_evals=(s.n_acc + s.n_rej) * jnp.asarray(_NEWTON_ITERS, jnp.int32),
        dense=interp if dense else None,
        _unravel=unravel,
    )
