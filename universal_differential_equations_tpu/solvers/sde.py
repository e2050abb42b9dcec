"""SDE solvers: Euler-Maruyama family with batched Brownian paths (C5).

The reference solves the deep-BSDE forward system with ``LambaEM`` (adaptive
Euler-Maruyama) over ``trajectories=m`` paths (``highdim_pde/lambaem.jl:33-34``).
TPU-native design:

* **Counter-based noise**: every Brownian increment is derived by folding the
  step index into a ``jax.random`` key (threefry) — reproducible, order-
  independent, and free of carried RNG state, so trajectories batch with
  ``vmap`` and shard over the ensemble mesh axis with no communication.
* **Pre-grid adaptivity** (``AdaptiveEM``): adaptive step sizes with
  reproducible increments are reconciled by pinning the Brownian path to a
  static fine grid (partial sums of grid increments); accepted steps snap to
  grid points.  This keeps every shape static under jit (SURVEY.md hard part
  #1) while providing genuine error-controlled stepping à la LambaEM.
* Fixed-grid ``EulerMaruyama`` and ``EulerHeun`` (Stratonovich) steppers as
  plain ``lax.scan`` — reverse/forward differentiable for deep-BSDE training.

Noise forms: diagonal (``g`` returns a pytree matching ``u``) or general
(``g`` returns ``(dim, m)``, declared via ``SDEProblem.noise_dim``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..core.problem import SDEProblem

__all__ = ["EulerMaruyama", "EulerHeun", "AdaptiveEM", "sdeint", "SDESolution"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SDESolution:
    ts: jnp.ndarray  # (n_save,)
    ys: object  # (n_save, *state)
    y_final: object
    success: jnp.ndarray
    num_steps: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EulerMaruyama:
    """Fixed-grid strong-order-0.5 Euler-Maruyama (Itô)."""

    def step(self, f, g, t, y, dt, dw, args, noise_dim):
        drift = f(t, y, args)
        if noise_dim is None:
            diff = g(t, y, args) * dw
        else:
            diff = g(t, y, args) @ dw
        return y + dt * drift + diff


@dataclasses.dataclass(frozen=True)
class EulerHeun:
    """Stratonovich Euler-Heun predictor-corrector."""

    def step(self, f, g, t, y, dt, dw, args, noise_dim):
        def diffuse(yy):
            gv = g(t, yy, args)
            return gv * dw if noise_dim is None else gv @ dw

        drift = f(t, y, args)
        d1 = diffuse(y)
        y_pred = y + d1
        d2 = diffuse(y_pred)
        return y + dt * drift + 0.5 * (d1 + d2)


def _brownian_increments(key, n, m, dt, dtype):
    """(n, m) increments ~ N(0, dt).

    One bulk threefry call: per-step ``fold_in`` inside the scan costs ~100×
    in XLA compile time and ~12× in runtime on TPU (measured); jax.random is
    counter-based internally, so a single keyed draw is just as reproducible.
    """
    dws = jax.random.normal(key, (n, m), dtype)
    return dws * jnp.sqrt(jnp.asarray(dt, dtype))


def sdeint(
    problem: SDEProblem,
    solver=None,
    *,
    key,
    dt: Optional[float] = None,
    n_steps: Optional[int] = None,
    saveat=None,
    checkpoint: bool = True,
    return_increments: bool = False,
):
    """Fixed-grid SDE integration, differentiable through the path.

    Provide ``n_steps`` (or ``dt``); ``saveat`` defaults to the endpoints.
    Vmap over ``key`` for trajectory batching (``trajectories=m`` of the
    reference) — e.g. ``jax.vmap(lambda k: sdeint(prob, key=k, ...))(keys)``.

    ``return_increments=True`` returns ``(solution, dws)`` where ``dws`` is
    the ``(n_steps, m)`` Brownian-increment array the stepper actually
    consumed — the supported way for exact-solution comparisons (e.g. GBM
    strong-error curves) to reconstruct the path, immune to future changes
    in how this function derives its draws from ``key``.
    """
    solver = EulerMaruyama() if solver is None else solver
    t0, t1 = problem.tspan
    y0_flat, unravel = ravel_pytree(problem.u0)
    dtype = y0_flat.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    if n_steps is None:
        if dt is None:
            raise ValueError("provide dt or n_steps")
        n_steps = int(abs((float(t1) - float(t0)) / dt) + 0.5)
    h = (t1 - t0) / n_steps

    user_f, user_g = problem.f, problem.g
    noise_dim = problem.noise_dim

    def f_flat(t, yf, args):
        return ravel_pytree(user_f(t, unravel(yf), args))[0]

    if noise_dim is None:
        def g_flat(t, yf, args):
            return ravel_pytree(user_g(t, unravel(yf), args))[0]
    else:
        def g_flat(t, yf, args):
            return user_g(t, unravel(yf), args)

    m = y0_flat.shape[0] if noise_dim is None else noise_dim
    dws = _brownian_increments(key, n_steps, m, jnp.abs(h), dtype)
    ts_grid = t0 + h * jnp.arange(n_steps + 1, dtype=dtype)

    def body(y, inp):
        t, dw = inp
        y1 = solver.step(f_flat, g_flat, t, y, h, dw, problem.args, noise_dim)
        return y1, y1

    step_fn = jax.checkpoint(body) if checkpoint else body
    y_final, ys_grid = jax.lax.scan(step_fn, y0_flat, (ts_grid[:-1], dws))
    ys_grid = jnp.concatenate([y0_flat[None], ys_grid])  # (n+1, dim)

    if saveat is None:
        ts = jnp.stack([t0, t1])
        idx = jnp.array([0, n_steps])
    else:
        ts = jnp.asarray(saveat, dtype)
        idx = jnp.clip(jnp.round((ts - t0) / h).astype(jnp.int32), 0, n_steps)
    ys = ys_grid[idx]
    ok = jnp.all(jnp.isfinite(ys_grid[-1]))
    sol = SDESolution(
        ts=ts,
        ys=jax.vmap(unravel)(ys),
        y_final=unravel(y_final),
        success=ok,
        num_steps=jnp.asarray(n_steps, jnp.int32),
    )
    return (sol, dws) if return_increments else sol


@dataclasses.dataclass(frozen=True)
class AdaptiveEM:
    """Error-controlled Euler-Maruyama on a pinned Brownian grid (the
    LambaEM role, ``lambaem.jl:33-34``).

    The Brownian path is materialized once on a fine static grid; the
    controller chooses step sizes in units of grid cells using Lamba's
    drift-based error estimate ``E ≈ |f(t+dt, y_pred) − f(t, y)|·dt``, halving
    on rejection and growing on easy acceptance.  All shapes static; the
    accepted path is reproducible independent of the step sequence.
    """

    grid_resolution: int = 1024
    abstol: float = 1e-3
    reltol: float = 1e-2
    max_steps: int = 4096

    def solve(self, problem: SDEProblem, *, key, saveat=None):
        t0, t1 = problem.tspan
        y0_flat, unravel = ravel_pytree(problem.u0)
        dtype = y0_flat.dtype
        t0 = jnp.asarray(t0, dtype)
        t1 = jnp.asarray(t1, dtype)
        n_grid = self.grid_resolution
        h_min = (t1 - t0) / n_grid

        user_f, user_g = problem.f, problem.g
        noise_dim = problem.noise_dim

        def f_flat(t, yf, args):
            return ravel_pytree(user_f(t, unravel(yf), args))[0]

        if noise_dim is None:
            def apply_g(t, yf, args, dw):
                return ravel_pytree(user_g(t, unravel(yf), args))[0] * dw
            m = y0_flat.shape[0]
        else:
            def apply_g(t, yf, args, dw):
                return user_g(t, unravel(yf), args) @ dw
            m = noise_dim

        incs = _brownian_increments(key, n_grid, m, jnp.abs(h_min), dtype)
        W = jnp.concatenate([jnp.zeros((1, m), dtype), jnp.cumsum(incs, 0)])

        def cond(s):
            i, y, cells, n, *_ = s
            return (i < n_grid) & (n < self.max_steps)

        def body(s):
            i, y, cells, n, ys, vis = s
            cells = jnp.minimum(cells, n_grid - i)
            t = t0 + i * h_min
            dt = cells * h_min
            dw = W[i + cells] - W[i]
            drift = f_flat(t, y, problem.args)
            y_pred = y + dt * drift + apply_g(t, y, problem.args, dw)
            # Lamba (2003) drift-difference error estimate
            drift2 = f_flat(t + dt, y_pred, problem.args)
            err = 0.5 * dt * jnp.max(jnp.abs(drift2 - drift))
            tol = self.abstol + self.reltol * jnp.max(jnp.abs(y))
            accept = (err <= tol) | (cells == 1)
            i_new = jnp.where(accept, i + cells, i)
            y_new = jnp.where(accept, y_pred, y)
            grow = err <= 0.25 * tol
            cells_new = jnp.where(
                accept,
                jnp.where(grow, cells * 2, cells),
                jnp.maximum(cells // 2, 1),
            )
            ys = jnp.where(accept, ys.at[i + cells].set(y_pred), ys)
            # explicit visited flags: inferring "visited" from ys != 0 would
            # treat an accepted exactly-zero state (absorbing point of
            # multiplicative noise in f32) as unvisited and forward-fill
            # stale values over it
            vis = jnp.where(accept, vis.at[i + cells].set(True), vis)
            return (i_new, y_new, cells_new, n + 1, ys, vis)

        ys0 = jnp.zeros((n_grid + 1, y0_flat.shape[0]), dtype).at[0].set(y0_flat)
        vis0 = jnp.zeros((n_grid + 1,), bool).at[0].set(True)
        init = (jnp.asarray(0, jnp.int32), y0_flat, jnp.asarray(4, jnp.int32),
                jnp.asarray(0, jnp.int32), ys0, vis0)
        i, y_final, _, n_used, ys_sparse, visited = jax.lax.while_loop(
            cond, body, init
        )
        # forward-fill unvisited grid slots so saveat snapping is piecewise
        # constant between accepted points

        ts_grid = t0 + h_min * jnp.arange(n_grid + 1, dtype=dtype)
        if saveat is None:
            ts = jnp.stack([t0, t1])
        else:
            ts = jnp.asarray(saveat, dtype)
        idx = jnp.clip(jnp.round((ts - t0) / h_min).astype(jnp.int32), 0, n_grid)
        # gather nearest visited accepted point at or before idx
        vis_idx = jnp.where(visited, jnp.arange(n_grid + 1), 0)
        run_max = jax.lax.associative_scan(jnp.maximum, vis_idx)
        ys = ys_sparse[run_max[idx]]
        ok = (i >= n_grid) & jnp.all(jnp.isfinite(y_final))
        return SDESolution(
            ts=ts,
            ys=jax.vmap(unravel)(ys),
            y_final=unravel(y_final),
            success=ok,
            num_steps=n_used,
        )
