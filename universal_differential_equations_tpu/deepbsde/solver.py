"""Deep-BSDE solver for terminal-value semilinear PDEs (SURVEY.md C22, L7).

TPU-native equivalent of ``TerminalPDEProblem`` + ``NNPDENS``
(``highdim_pde/lambaem.jl:14-34``; Han, Jentzen & E 2018): the PDE solution at
``x0`` is learned by simulating the coupled forward-backward SDE

    dX = μ(t,X) dt + σ(t,X) dW
    du = -f(t, X, u, σᵀ∇u) dt + (σᵀ∇u)·dW

with two networks — ``u0_net: x → u(0,x)`` and ``grad_net: [x;t] → σᵀ∇u`` —
trained so the terminal condition ``u(T) ≈ g(X_T)`` holds in mean square.

TPU shape: one training iteration is a single jitted program — ``m``
trajectories roll out under ``vmap`` over counter-based Brownian keys
(no per-path RNG state), the time loop is a ``lax.scan``, and every
network evaluation is a batched (m × width) MXU matmul.  The Monte-Carlo
validation harness (``lambaem.jl:36-48``) ships as ``mc_analytical_hjb``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["TerminalPDEProblem", "NNPDENS", "solve_terminal_pde", "BSDEResult"]


@dataclasses.dataclass(frozen=True)
class TerminalPDEProblem:
    """Terminal-value semilinear PDE (``TerminalPDEProblem(g,f,μ,σ,x0,tspan)``).

    ``g(x) -> scalar`` terminal condition; ``f(t, x, u, z) -> scalar``
    nonlinearity with ``z = σᵀ∇u``; ``mu(t, x) -> (d,)`` drift;
    ``sigma(t, x) -> scalar | (d,) | (d, d)`` diffusion.
    """

    g: Callable
    f: Callable
    mu: Callable
    sigma: Callable
    x0: jnp.ndarray
    tspan: tuple


@dataclasses.dataclass(frozen=True)
class NNPDENS:
    """Algorithm object bundling the two sub-networks (``lambaem.jl:23-31``)."""

    u0_net: object  # Chain: (d,) -> (1,)
    grad_net: object  # Chain: (d+1,) -> (d,)


class BSDEResult(NamedTuple):
    u0: jnp.ndarray  # learned u(0, x0)
    losses: jnp.ndarray
    params: dict
    converged: bool
    n_steps: int = 0  # time-grid resolution the final training stage used


def _apply_sigma(sig, dw):
    sig = jnp.asarray(sig)
    if sig.ndim == 0:
        return sig * dw
    if sig.ndim == 1:
        return sig * dw
    return sig @ dw


def solve_terminal_pde(
    problem: TerminalPDEProblem,
    alg: NNPDENS,
    key,
    *,
    trajectories: int = 100,
    n_steps: int = 50,
    maxiters: int = 500,
    learning_rate: float = 0.03,
    pabstol: float = 1e-2,
    verbose: bool = False,
    dtype=jnp.float32,
    mesh=None,
    adaptive: bool = False,
    sde_abstol: float = 1e-2,
    sde_reltol: float = 1e-2,
    pilot_paths: int = 8,
    max_refinements: int = 3,
) -> BSDEResult:
    """Train the deep-BSDE networks; returns the learned ``u(0, x0)``.

    Mirrors ``solve(prob, NNPDENS(u0, σᵀ∇u, opt), trajectories=m, maxiters,
    pabstol)`` (``lambaem.jl:33-34``): ADAM on the terminal mean-square error
    with early stop when the loss drops below ``pabstol``.

    ``adaptive=True`` is the ``alg=LambaEM(), abstol, reltol`` role of the
    reference: instead of trusting the caller's ``n_steps``, the time grid is
    chosen by error control.  An :class:`~..solvers.sde.AdaptiveEM` pilot
    integrates ``pilot_paths`` coupled (X, u) trajectories (initial networks)
    at tolerances ``(sde_abstol, sde_reltol)`` to pick the starting
    resolution, then training runs on that pinned grid and the grid is
    doubled — warm-starting the networks — until the learned ``u(0, x0)``
    moves by less than ``sde_abstol + sde_reltol·|u0|`` between refinements
    (pinned-grid refinement keeps every rollout a static-shape ``lax.scan``,
    so training stays reverse-differentiable — the reason the adaptive
    while-loop itself cannot sit inside the training loss).

    ``mesh``: an optional ``jax.sharding.Mesh`` (e.g.
    ``parallel.ensemble_mesh()``). The trajectory batch is sharded over the
    mesh's first axis and parameters replicate; XLA inserts the gradient
    ``psum`` over ICI (SURVEY.md §2.4 — trajectory batching is the
    distributed axis). Results are bitwise-identical to the unsharded run
    (the Brownian draws don't depend on placement). ``trajectories`` should
    be a multiple of the mesh size.
    """
    x0 = jnp.asarray(problem.x0, dtype)
    d = x0.shape[0]
    t0, t1 = problem.tspan

    k_init, k_train = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    k1, k2 = jax.random.split(k_init)
    params = {
        "u0": alg.u0_net.init(k1, dtype),
        "grad": alg.grad_net.init(k2, dtype),
    }

    dw_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        dw_sharding = NamedSharding(mesh, PartitionSpec(axis))
        replicated = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, replicated)

    optimizer = optax.adam(learning_rate)

    def make_train_step(n_steps):
        dt = (t1 - t0) / n_steps
        sqrt_dt = jnp.sqrt(jnp.asarray(dt, dtype))

        def rollout(params, dw_path):
            """One trajectory with precomputed increments; returns
            (u_T, g(X_T)).  Noise is drawn in bulk outside the scan —
            per-step fold_in inside the rollout costs ~100× in compile time
            on TPU (measured)."""
            u = alg.u0_net.apply(params["u0"], x0)[0]

            def body(carry, inp):
                x, u = carry
                t, dw = inp
                z = alg.grad_net.apply(params["grad"],
                                       jnp.concatenate([x, t[None]]))
                u_new = u - problem.f(t, x, u, z) * dt + jnp.dot(z, dw)
                x_new = (x + problem.mu(t, x) * dt
                         + _apply_sigma(problem.sigma(t, x), dw))
                return (x_new, u_new), None

            ts_grid = t0 + dt * jnp.arange(n_steps, dtype=dtype)
            (x_T, u_T), _ = jax.lax.scan(body, (x0, u), (ts_grid, dw_path))
            return u_T, problem.g(x_T)

        def loss_fn(params, dws):
            u_T, g_T = jax.vmap(lambda dwp: rollout(params, dwp))(dws)
            return jnp.mean((u_T - g_T) ** 2)

        @jax.jit
        def train_step(params, opt_state, iter_key):
            dws = jax.random.normal(
                iter_key, (trajectories, n_steps, d), dtype) * sqrt_dt
            if dw_sharding is not None:
                dws = jax.lax.with_sharding_constraint(dws, dw_sharding)
            loss, grads = jax.value_and_grad(loss_fn)(params, dws)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step

    def train_stage(params, n_steps, stage):
        train_step = make_train_step(n_steps)
        opt_state = optimizer.init(params)
        losses = []
        converged = False
        for it in range(maxiters):
            params, opt_state, loss = train_step(
                params, opt_state,
                jax.random.fold_in(jax.random.fold_in(k_train, stage), it)
            )
            losses.append(float(loss))
            if verbose and it % 50 == 0:
                print(f"  bsde iter {it} (n={n_steps}): loss {losses[-1]:.5f}")
            if losses[-1] < pabstol:
                converged = True
                break
        return params, losses, converged

    if adaptive:
        n_steps = _pilot_resolution(problem, alg, params, x0, d, dtype,
                                    k_init, sde_abstol, sde_reltol,
                                    pilot_paths, verbose)

    params, losses, converged = train_stage(params, n_steps, stage=0)
    u0_val = alg.u0_net.apply(params["u0"], x0)[0]

    if adaptive:
        # pinned-grid refinement: double the grid (warm-started training)
        # until the learned u(0, x0) stops moving at the SDE tolerances
        for stage in range(1, max_refinements + 1):
            n_fine = 2 * n_steps
            params, l2, conv2 = train_stage(params, n_fine, stage=stage)
            u0_fine = alg.u0_net.apply(params["u0"], x0)[0]
            losses += l2
            converged = conv2
            delta = abs(float(u0_fine) - float(u0_val))
            u0_val, n_steps = u0_fine, n_fine
            if verbose:
                print(f"  bsde refine -> n={n_fine}: u0 {float(u0_fine):.5f} "
                      f"(Δ {delta:.2e})")
            if delta <= sde_abstol + sde_reltol * abs(float(u0_fine)):
                break

    return BSDEResult(
        u0=u0_val,
        losses=jnp.asarray(losses),
        params=params,
        converged=converged,
        n_steps=n_steps,
    )


def _pilot_resolution(problem, alg, params, x0, d, dtype, key,
                      sde_abstol, sde_reltol, pilot_paths, verbose):
    """Pick a starting time-grid resolution with an AdaptiveEM pilot.

    The coupled (X, u) forward system is integrated by the error-controlled
    Euler–Maruyama solver (``solvers.sde.AdaptiveEM`` — the LambaEM role) at
    the requested tolerances, using the freshly-initialized networks for the
    control ``z``; the grid is sized to the busiest pilot path's step count
    (rounded up to a power of two, floor 8).
    """
    from ..core.problem import SDEProblem
    from ..solvers.sde import AdaptiveEM

    t0, t1 = problem.tspan
    eye = jnp.eye(d, dtype=dtype)

    def sigma_matrix(t, x):
        sig = jnp.asarray(problem.sigma(t, x))
        if sig.ndim == 0:
            return sig * eye
        if sig.ndim == 1:
            return jnp.diag(sig)
        return sig

    def coupled_f(t, s, p):
        x, u = s[:d], s[d]
        z = alg.grad_net.apply(p["grad"], jnp.concatenate([x, t[None]]))
        du = -problem.f(t, x, u, z)
        return jnp.concatenate([problem.mu(t, x), du[None]])

    def coupled_g(t, s, p):
        x = s[:d]
        z = alg.grad_net.apply(p["grad"], jnp.concatenate([x, t[None]]))
        return jnp.concatenate([sigma_matrix(t, x), z[None, :]], axis=0)

    u_init = alg.u0_net.apply(params["u0"], x0)
    pilot_prob = SDEProblem(
        f=coupled_f, g=coupled_g,
        u0=jnp.concatenate([x0, u_init]),
        tspan=(t0, t1), args=params, noise_dim=d,
    )
    pilot = AdaptiveEM(grid_resolution=1024, abstol=sde_abstol,
                       reltol=sde_reltol, max_steps=4096)
    keys = jax.random.split(jax.random.fold_in(key, 99), pilot_paths)
    n_used = jax.vmap(lambda k: pilot.solve(pilot_prob, key=k).num_steps)(keys)
    n_req = int(jnp.max(n_used))
    n_steps = 8
    while n_steps < n_req:
        n_steps *= 2
    if verbose:
        print(f"  bsde pilot: AdaptiveEM used {n_req} steps (max of "
              f"{pilot_paths} paths) -> starting grid n={n_steps}")
    return n_steps


def mc_analytical_hjb(g, x0, T, lam, key, n_samples: int = 10**5,
                      batch: int = 10**4):
    """Monte-Carlo closed-form value for the LQG/HJB problem:
    ``u(0,x) = -(1/λ)·log E[exp(−λ·g(x + √2·√T·W))]`` (``lambaem.jl:36-43``).
    Batched to bound device memory."""
    d = x0.shape[0]
    batch = min(batch, n_samples)
    n_batches = -(-n_samples // batch)  # ceil: use ALL requested samples

    def one_batch(k):
        w = jax.random.normal(k, (batch, d), x0.dtype)
        xT = x0[None, :] + jnp.sqrt(2.0) * jnp.sqrt(T) * w
        return jnp.sum(jnp.exp(-lam * jax.vmap(g)(xT)))

    keys = jax.random.split(key, n_batches)
    total = sum(float(one_batch(k)) for k in keys)
    return -(1.0 / lam) * jnp.log(total / (n_batches * batch))
