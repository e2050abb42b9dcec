"""Sensitivity algorithms: differentiating through ``solve`` (SURVEY.md L3).

TPU-native equivalents of the reference's ``sensealg`` choices:

* ``DiscreteAdjoint`` — plain reverse/forward AD through the bounded-scan
  stepper; the analogue of Tracker's ``diffeq_rd`` discrete adjoint
  (``NonNewtonianFluids/FENEP.jl:56``, SURVEY.md C10).  Also the forward-mode
  path: ``jax.jacfwd``/``jax.jvp`` flow straight through it, covering
  ``ForwardDiffSensitivity`` (``scenario_1.jl:86``, C7).
* ``InterpolatingAdjoint`` — continuous adjoint with the forward pass run as a
  fast ``while_loop`` retaining dense output; the backward pass integrates
  ``λ' = -(∂f/∂u)ᵀλ, μ' = -(∂f/∂p)ᵀλ`` between save points, reading ``u(t)``
  from the interpolant and computing vector-Jacobian products with ``jax.vjp``
  — the analogue of ``InterpolatingAdjoint(autojacvec=ReverseDiffVJP())``
  (``SEIR_exposure/seir_exposure.jl:71``, C8).  Because every accepted step is
  stored, this is simultaneously the ``quad=false, backsolve=false``
  checkpointed scheme of ``Climate/NeuralPDE/npde_data.jl:82`` (C9).
* ``BacksolveAdjoint`` — classic neural-ODE backsolve re-integrating the state
  backwards, with stability resets to the stored forward state at each save
  point.
* ``NoAdjoint`` — forward-only while-loop solve (truth generation at tight
  tolerances, ``scenario_1.jl:41``).

``solve`` (in ``api.py``) dispatches on these, mirroring ``concrete_solve``'s
sensealg dispatch (``seir_exposure.jl:66``, C11).

Constraint: under the continuous adjoints, ``args`` must be a pytree of
floating-point arrays (static configuration belongs in the RHS closure).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..core.controller import PIController
from ..core.integrate import IntegrateResult, integrate_scan, integrate_while
from ..core.solution import DenseInterpolation

__all__ = [
    "AbstractAdjoint",
    "NoAdjoint",
    "DiscreteAdjoint",
    "ForwardSensitivity",
    "InterpolatingAdjoint",
    "BacksolveAdjoint",
    "QuadratureAdjoint",
]


def _leggauss(order):
    """Gauss–Legendre nodes/weights on [-1, 1] (host-side, trace-time)."""
    import numpy as np

    return np.polynomial.legendre.leggauss(order)


class AbstractAdjoint:
    default_max_steps: int = 4096

    def run(self, f, y0, t0, t1, args, ts_save, solver, controller, rtol, atol,
            dt0, max_steps, tstops=None):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class NoAdjoint(AbstractAdjoint):
    """Forward-only while-loop solve. Fastest; gradients unavailable."""

    default_max_steps: int = 4096

    def run(self, f, y0, t0, t1, args, ts_save, solver, controller, rtol, atol,
            dt0, max_steps, tstops=None):
        res = integrate_while(
            f, y0, t0, t1, args, solver, rtol, atol, dt0, max_steps, controller,
            tstops,
        )
        ys = res.dense.evaluate(ts_save)
        return ys, res


@dataclasses.dataclass(frozen=True)
class DiscreteAdjoint(AbstractAdjoint):
    """Reverse/forward AD straight through the bounded-scan stepper (C10/C7).

    ``checkpoint=True`` remats each step, keeping reverse-mode memory at one
    carry per step instead of all RK stages.

    Caveat: if a *rejected* attempt overflows to inf/NaN (the controller
    recovers the primal, mapping the error to a huge-but-finite value), the
    backward pass still evaluates that attempt's partials, and the masked
    zero cotangent times a NaN partial is NaN — the whole gradient poisons
    even though the forward loss is finite (IEEE, not fixable by output
    masking).  If training hits this, use ``InterpolatingAdjoint``: its
    backward pass reads only the accepted trajectory's interpolant and
    never differentiates rejected attempts.
    """

    checkpoint: bool = True
    default_max_steps: int = 512

    def run(self, f, y0, t0, t1, args, ts_save, solver, controller, rtol, atol,
            dt0, max_steps, tstops=None):
        res = integrate_scan(
            f, y0, t0, t1, args, solver, rtol, atol, dt0, max_steps, controller,
            checkpoint=self.checkpoint, tstops=tstops,
        )
        ys = res.dense.evaluate(ts_save)
        return ys, res


@dataclasses.dataclass(frozen=True)
class ForwardSensitivity(DiscreteAdjoint):
    """Forward-mode sensitivity (``ForwardDiffSensitivity``, C7).

    Identical machinery to ``DiscreteAdjoint`` without per-step remat (remat
    buys nothing in forward mode); use with ``jax.jacfwd``/``jax.jvp``.
    """

    checkpoint: bool = False


@dataclasses.dataclass(frozen=True)
class _ContinuousAdjoint(AbstractAdjoint):
    rtol: Optional[float] = None  # backward-pass tolerances; None = forward's
    atol: Optional[float] = None
    segment_max_steps: int = 1024
    default_max_steps: int = 4096
    # adjoint seminorm (arXiv:2009.09457): exclude the passively-integrated
    # parameter-quadrature rows from the backward error test — λ (and the
    # backsolved state) stay fully controlled, μ rides along.  Gradients
    # match to ~8 digits either way (tested).  Measured with this package's
    # RMS-mean norm the effect is roughly neutral (LV UDE: 28→33 backward
    # steps; 5k-param stiff MLP: 139→168) because thousands of small
    # quadrature ratios *dilute* the full norm rather than constrain it —
    # hence default False; enable when quadrature rows dominate step
    # control (large fast-varying λᵀ∂f/∂p with tight atol).
    seminorm: bool = False
    # Hermite-window size for the backward pass's u(t) reads; None = the
    # solver's order-matched ``dense_nodes``.  The wider window costs ~10-15%
    # of adjoint wall-clock (measured, climate_adjoint_bench) — set 2 to
    # trade interpolation order for speed when backward tolerances are loose.
    interp_nodes: Optional[int] = None

    kind = "interp"

    def run(self, f, y0, t0, t1, args, ts_save, solver, controller, rtol, atol,
            dt0, max_steps, tstops=None):
        # The custom_vjp machinery ravels ``args`` into the adjoint state, so
        # every leaf must be inexact (the module-docstring constraint).  Catch
        # it here with a named error instead of a tracer stack from ravel.
        bad = [f"{jax.tree_util.keystr(path)} (dtype {jnp.asarray(leaf).dtype})"
               for path, leaf in jax.tree_util.tree_leaves_with_path(args)
               if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact)]
        if bad:
            raise TypeError(
                f"{type(self).__name__} requires problem.args to be a pytree "
                f"of floating-point (inexact) arrays, but got: "
                f"{', '.join(bad)}. Cast the leaves to float, or move static "
                f"integer configuration into the RHS closure, or use "
                f"DiscreteAdjoint (which differentiates through the stepper "
                f"and leaves non-inexact args alone).")
        out = _cont_solve(
            f, solver, controller, rtol, atol, dt0, max_steps, self,
            y0, t0, t1, args, ts_save, tstops,
        )
        (ys, y_final, buf_t, buf_y, buf_f, num_points, direction, t_final,
         success, n_acc, n_rej, nfe) = out
        dense = DenseInterpolation(buf_t, buf_y, buf_f, num_points, direction,
                                   nodes=getattr(solver, "dense_nodes", 2))
        res = IntegrateResult(dense, t_final, y_final, success, n_acc, n_rej, nfe)
        return ys, res


@dataclasses.dataclass(frozen=True)
class InterpolatingAdjoint(_ContinuousAdjoint):
    kind = "interp"


@dataclasses.dataclass(frozen=True)
class BacksolveAdjoint(_ContinuousAdjoint):
    kind = "backsolve"


@dataclasses.dataclass(frozen=True)
class QuadratureAdjoint(_ContinuousAdjoint):
    """Continuous adjoint with Gauss–Legendre parameter quadrature.

    The ``quad=true`` counterpart of the reference's
    ``SensitivityAlg(quad=false, backsolve=false)`` (``npde_data.jl:82``,
    C9) and the method of arXiv:2308.10644: the backward pass integrates
    only ``λ' = -(∂f/∂u)ᵀλ`` — state-dimension many rows instead of
    state+parameter — and the parameter gradient
    ``μ = ∫ λᵀ ∂f/∂p dt`` is evaluated afterwards by ``quad_order``-point
    Gauss–Legendre panels per save segment, reading ``λ(t)`` from the
    backward solve's dense output and ``u(t)`` from the forward's.  The
    backward error control never sees quadrature rows, and the integration
    state stays state-sized regardless of parameter count.  Measured on
    TPU (climate neural PDE, 30 states, 518 and 81k params) wall-clock is
    neutral vs ``InterpolatingAdjoint`` — one ``jax.vjp`` yields λᵀ∂f/∂u
    and λᵀ∂f/∂p together, so the interpolating adjoint's quadrature rows
    are nearly free — but gradients match the discrete adjoint to ~1e-9
    and the λ-only backward is the memory-light choice for very large
    parameter pytrees.  ``seminorm`` is moot here (no quadrature rows).

    Accuracy caveat: the integrand λᵀ∂f/∂p is only *piecewise* smooth —
    its interpolants have knots at the forward and backward solver steps —
    so a single ``quad_order``-point panel per saveat segment loses
    accuracy when one segment spans many solver steps (coarse ``saveat``).
    ``quad_subpanels`` splits every segment into that many equal Gauss–
    Legendre panels (cost: ``quad_subpanels × quad_order`` VJP nodes per
    segment); raise it until the gradient stops moving, or keep saveat
    segments comparable to solver step sizes.
    """

    kind = "quadrature"
    quad_order: int = 12
    quad_subpanels: int = 1


# ---------------------------------------------------------------------------
# custom_vjp core shared by the continuous adjoints
# ---------------------------------------------------------------------------


def _primal(f, solver, controller, rtol, atol, dt0, max_steps, y0, t0, t1,
            args, ts_save, tstops):
    res = integrate_while(
        f, y0, t0, t1, args, solver, rtol, atol, dt0, max_steps,
        PIController() if controller is None else controller, tstops,
    )
    ys = res.dense.evaluate(ts_save)
    d = res.dense
    return (ys, res.y_final, d.ts, d.ys, d.fs, d.num_points, d.direction,
            res.t_final, res.success, res.n_acc, res.n_rej, res.nfe)


def _cont_solve_impl(f, solver, controller, rtol, atol, dt0, max_steps, cfg,
                     y0, t0, t1, args, ts_save, tstops):
    return _primal(f, solver, controller, rtol, atol, dt0, max_steps,
                   y0, t0, t1, args, ts_save, tstops)


# nondiff: f, solver, controller, rtol, atol, dt0, max_steps, cfg
_cont_solve = jax.custom_vjp(_cont_solve_impl, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))


def _cont_fwd(f, solver, controller, rtol, atol, dt0, max_steps, cfg,
              y0, t0, t1, args, ts_save, tstops):
    out = _primal(f, solver, controller, rtol, atol, dt0, max_steps,
                  y0, t0, t1, args, ts_save, tstops)
    (ys, y_final, buf_t, buf_y, buf_f, num_points, direction, t_final,
     success, *_rest) = out
    residuals = (buf_t, buf_y, buf_f, num_points, direction, ys,
                 y0, t0, t1, args, ts_save, tstops, success)
    return out, residuals


def _cont_bwd(f, solver, controller, rtol, atol, dt0, max_steps, cfg,
              residuals, cts):
    (buf_t, buf_y, buf_f, num_points, direction, ys_save,
     y0, t0, t1, args, ts_save, tstops, fwd_success) = residuals
    g_ys, g_yfin = cts[0], cts[1]  # remaining outputs are non-differentiable

    # A failed or NaN-poisoned forward must never reach the backward
    # integrators: adaptive while_loops fed NaN dynamics have been observed
    # to fault the TPU runtime outright (worker crash at the 128-level
    # climate net, reproducible) rather than merely return garbage.  Gate on
    # forward success AND finite cotangents; when the gate fails, every
    # state/cotangent buffer is zeroed so the backward integrates benign
    # trivial dynamics (λ≡0, cheap and finite), and the returned gradient is
    # NaN-poisoned below exactly as for a failed backward segment.
    fwd_ok = (fwd_success
              & jnp.all(jnp.isfinite(g_yfin))
              & jnp.all(jnp.isfinite(g_ys)))
    _san = lambda x: jnp.where(fwd_ok, x, jnp.zeros_like(x))
    buf_y, buf_f, ys_save = _san(buf_y), _san(buf_f), _san(ys_save)
    g_ys, g_yfin = _san(g_ys), _san(g_yfin)
    # the time buffer needs the canonical single-point layout, not zeros: a
    # diverged forward leaves NaN step times, and NaN window widths would
    # re-poison the Hermite weights the backward reads u(t) through
    buf_t = jnp.where(
        fwd_ok, buf_t,
        jnp.full_like(buf_t, jnp.inf).at[0].set(
            jnp.asarray(t0, buf_t.dtype)))
    num_points = jnp.where(fwd_ok, num_points, 1)

    nodes = cfg.interp_nodes
    if nodes is None:
        nodes = getattr(solver, "dense_nodes", 2)
    dense = DenseInterpolation(buf_t, buf_y, buf_f, num_points, direction,
                               nodes=nodes)
    dim = y0.shape[0]
    mu0_tree = jax.tree.map(jnp.zeros_like, args)
    mu0_flat, unravel_mu = ravel_pytree(mu0_tree)
    n_p = mu0_flat.shape[0]
    a_rtol = rtol if cfg.rtol is None else cfg.rtol
    a_atol = atol if cfg.atol is None else cfg.atol
    ctrl = PIController() if controller is None else controller

    if cfg.kind == "quadrature":
        # λ-only backward solve + Gauss–Legendre parameter quadrature
        # (QuadratureAdjoint; arXiv:2308.10644).  λ(t) comes from each
        # backward segment's own dense output, u(t) from the forward's.
        gl_x, gl_w = _leggauss(cfg.quad_order)
        gl_x = jnp.asarray(gl_x, y0.dtype)
        gl_w = jnp.asarray(gl_w, y0.dtype)

        def adj_rhs(t, lam, _):
            u = dense.evaluate(t)
            _, vjp_fn = jax.vjp(lambda yy: f(t, yy, args), u)
            return -vjp_fn(lam)[0]

        n_sub = max(int(getattr(cfg, "quad_subpanels", 1)), 1)

        def seg_mu(lam_dense, t_lo, t_hi):
            # ∫_{t_lo}^{t_hi} λᵀ ∂f/∂p dt (forward orientation), split into
            # ``quad_subpanels`` equal GL panels — the integrand is only
            # piecewise smooth (knots at solver steps), so sub-paneling
            # controls the error when saveat segments span many steps
            frac = jnp.arange(n_sub + 1, dtype=gl_x.dtype) / n_sub
            edges = t_lo + (t_hi - t_lo) * frac

            def node(tq):
                u = dense.evaluate(tq)
                lam = lam_dense.evaluate(tq)
                _, vjp_fn = jax.vjp(lambda aa: f(tq, u, aa), args)
                return ravel_pytree(vjp_fn(lam)[0])[0]

            def panel(lo, hi):
                half = 0.5 * (hi - lo)
                tk = 0.5 * (hi + lo) + half * gl_x
                return half * (gl_w @ jax.vmap(node)(tk))

            return jax.vmap(panel)(edges[:-1], edges[1:]).sum(axis=0)

        def q_segment(carry, i):
            z, t_hi, mu = carry
            t_lo = ts_save[i]
            res = integrate_while(
                adj_rhs, z, t_hi, t_lo, None, solver, a_rtol, a_atol, None,
                cfg.segment_max_steps, ctrl,
            )
            mu = mu + seg_mu(res.dense, t_lo, t_hi)
            z = res.y_final + g_ys[i]
            return (z, t_lo, mu), res.success

        n_seg = ts_save.shape[0]

        def _run_quad(_):
            (z, t_hi, mu), seg_ok = jax.lax.scan(
                q_segment, (g_yfin, t1, mu0_flat),
                jnp.arange(n_seg - 1, -1, -1)
            )
            res = integrate_while(
                adj_rhs, z, t_hi, t0, None, solver, a_rtol, a_atol, None,
                cfg.segment_max_steps, ctrl,
            )
            return (res.y_final, mu + seg_mu(res.dense, t0, t_hi),
                    jnp.all(seg_ok) & res.success)

        def _skip_quad(_):
            return (jnp.full_like(g_yfin, jnp.nan),
                    jnp.full_like(mu0_flat, jnp.nan), jnp.asarray(False))

        # lax.cond: the backward integrators never EXECUTE on a failed
        # forward (stabilized solvers have been observed to fault the TPU
        # runtime when stepped through a gated-but-failed pass; cond
        # executes one branch, unlike where).  Caveat: under vmap, cond
        # lowers to select and both branches run — batched continuous
        # adjoints still rely on the buffer sanitization above.
        y_fin_b, mu, ok = jax.lax.cond(fwd_ok, _run_quad, _skip_quad, None)
        # A failed λ segment would feed its clamped dense tail into the
        # quadrature and return a silently wrong gradient — poison instead
        # (see the shared note at the end of this function).
        poison = lambda x: jnp.where(ok, x, jnp.full_like(x, jnp.nan))
        zero = lambda x: jnp.zeros_like(jnp.asarray(x))
        return (poison(y_fin_b), zero(t0), zero(t1),
                jax.tree.map(poison, unravel_mu(mu)),
                jnp.zeros_like(ts_save), jax.tree.map(jnp.zeros_like, tstops))

    if cfg.kind == "interp":

        def adj_rhs(t, z, _):
            lam = z[:dim]
            u = dense.evaluate(t)
            _, vjp_fn = jax.vjp(lambda yy, aa: f(t, yy, aa), u, args)
            y_bar, a_bar = vjp_fn(lam)
            return -jnp.concatenate([y_bar, ravel_pytree(a_bar)[0]])

        z_init = jnp.concatenate([g_yfin, mu0_flat])

        def at_boundary(z, i):
            return z.at[:dim].add(g_ys[i])

    else:  # backsolve: re-integrate the state backwards alongside the adjoint

        def adj_rhs(t, z, _):
            y = z[:dim]
            lam = z[dim : 2 * dim]
            fval, vjp_fn = jax.vjp(lambda yy, aa: f(t, yy, aa), y, args)
            y_bar, a_bar = vjp_fn(lam)
            return jnp.concatenate([fval, -y_bar, -ravel_pytree(a_bar)[0]])

        y_final = buf_y[jnp.clip(num_points - 1, 0, buf_y.shape[0] - 1)]
        z_init = jnp.concatenate([y_final, g_yfin, mu0_flat])

        def at_boundary(z, i):
            # reset the backsolved state to the stored forward value for
            # stability, and apply the loss jump to λ
            z = z.at[:dim].set(ys_save[i])
            return z.at[dim : 2 * dim].add(g_ys[i])

    n_seg = ts_save.shape[0]

    if cfg.seminorm:
        # controlled rows: λ (+ backsolved y); quadrature rows μ are free
        n_ctrl = dim if cfg.kind == "interp" else 2 * dim
        err_w = jnp.concatenate([
            jnp.ones((n_ctrl,), z_init.dtype),
            jnp.zeros((n_p,), z_init.dtype),
        ])
    else:
        err_w = None

    def segment(carry, i):
        z, t_hi = carry
        t_lo = ts_save[i]
        res = integrate_while(
            adj_rhs, z, t_hi, t_lo, None, solver, a_rtol, a_atol, None,
            cfg.segment_max_steps, ctrl, err_weights=err_w,
        )
        z = at_boundary(res.y_final, i)
        return (z, t_lo), res.success

    def _run_bwd(_):
        (z, t_hi), seg_ok = jax.lax.scan(
            segment, (z_init, t1), jnp.arange(n_seg - 1, -1, -1)
        )
        res = integrate_while(
            adj_rhs, z, t_hi, t0, None, solver, a_rtol, a_atol, None,
            cfg.segment_max_steps, ctrl, err_weights=err_w,
        )
        return res.y_final, jnp.all(seg_ok) & res.success

    def _skip_bwd(_):
        return jnp.full_like(z_init, jnp.nan), jnp.asarray(False)

    # lax.cond: see the quadrature branch — the backward solves never
    # execute on a failed forward (device-fault prevention); under vmap
    # this lowers to select, where the sanitized buffers are the guard.
    z, ok = jax.lax.cond(fwd_ok, _run_bwd, _skip_bwd, None)

    if cfg.kind == "interp":
        y0_bar = z[:dim]
        mu = z[dim:]
    else:
        y0_bar = z[dim : 2 * dim]
        mu = z[2 * dim :]
    # Backward-segment failure (segment_max_steps exhausted, dt underflow)
    # would otherwise return a silently wrong gradient built from the last
    # reached adjoint state.  Raising is impossible under jit; NaN-poisoning
    # is the loud equivalent, and the ensemble layer already masks NaN
    # lanes (the vectorized try/catch, SURVEY.md §5).
    poison = lambda x: jnp.where(ok, x, jnp.full_like(x, jnp.nan))
    args_bar = jax.tree.map(poison, unravel_mu(mu))
    zero = lambda x: jnp.zeros_like(jnp.asarray(x))
    return (poison(y0_bar), zero(t0), zero(t1), args_bar,
            jnp.zeros_like(ts_save), jax.tree.map(jnp.zeros_like, tstops))


_cont_solve.defvjp(_cont_fwd, _cont_bwd)
