"""SDE solver (C5) and deep-BSDE (C22) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.core.problem import SDEProblem
from universal_differential_equations_tpu.solvers.sde import (
    AdaptiveEM,
    EulerHeun,
    EulerMaruyama,
    sdeint,
)
from universal_differential_equations_tpu.deepbsde import (
    NNPDENS,
    TerminalPDEProblem,
    mc_analytical_hjb,
    solve_terminal_pde,
)
from universal_differential_equations_tpu.nn import MLP


def _ou_problem(theta=1.5, sigma=0.4):
    # dX = -θX dt + σ dW ; stationary var σ²/2θ
    return SDEProblem(
        f=lambda t, y, args: -theta * y,
        g=lambda t, y, args: sigma * jnp.ones_like(y),
        u0=jnp.array([1.0]),
        tspan=(0.0, 3.0),
    )


def test_em_ou_statistics():
    prob = _ou_problem()
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    ys = jax.vmap(
        lambda k: sdeint(prob, key=k, n_steps=300).y_final[0]
    )(keys)
    # mean -> e^{-θT}, var -> σ²/2θ (T=3, θ=1.5: mean≈0.011, var≈0.0533)
    assert abs(float(ys.mean()) - np.exp(-4.5)) < 0.01
    assert abs(float(ys.var()) - 0.4**2 / 3.0) < 0.008


def test_em_strong_convergence_gbm():
    # dX = μX dt + σX dW has exact solution; strong order 0.5
    mu, sig = 0.8, 0.3
    prob = SDEProblem(
        f=lambda t, y, args: mu * y,
        g=lambda t, y, args: sig * y,
        u0=jnp.array([1.0]),
        tspan=(0.0, 1.0),
    )
    key = jax.random.PRNGKey(3)
    errs = []
    for n in [64, 256]:
        keys = jax.random.split(key, 400)

        def run(k):
            sol = sdeint(prob, key=k, n_steps=n)
            # exact solution using the SAME Brownian path (sum of increments)
            dws = jax.random.normal(k, (n, 1)) * jnp.sqrt(1.0 / n)
            WT = jnp.sum(dws)
            exact = jnp.exp((mu - 0.5 * sig**2) * 1.0 + sig * WT)
            return jnp.abs(sol.y_final[0] - exact)

        errs.append(float(jax.vmap(run)(keys).mean()))
    order = np.log(errs[0] / errs[1]) / np.log(256 / 64)
    assert order > 0.35, f"strong order {order}"


def test_euler_heun_runs():
    prob = _ou_problem()
    sol = sdeint(prob, EulerHeun(), key=jax.random.PRNGKey(1), n_steps=100,
                 saveat=jnp.linspace(0, 3, 7))
    assert sol.ys.shape == (7, 1) and bool(sol.success)


def test_sdeint_differentiable():
    # gradient of E[X_T] wrt drift parameter via the pathwise estimator
    def mean_final(theta):
        prob = SDEProblem(
            f=lambda t, y, a: -a * y,
            g=lambda t, y, a: 0.2 * jnp.ones_like(y),
            u0=jnp.array([1.0]), tspan=(0.0, 1.0), args=theta,
        )
        keys = jax.random.split(jax.random.PRNGKey(0), 256)
        ys = jax.vmap(lambda k: sdeint(prob, key=k, n_steps=64).y_final[0])(keys)
        return ys.mean()

    g = float(jax.grad(mean_final)(jnp.asarray(1.0)))
    # d/dθ e^{-θ} = -e^{-θ} ≈ -0.368
    assert abs(g + np.exp(-1.0)) < 0.05


def test_adaptive_em_matches_fixed():
    prob = _ou_problem()
    alg = AdaptiveEM(grid_resolution=512, abstol=1e-4, reltol=1e-3)
    keys = jax.random.split(jax.random.PRNGKey(2), 400)
    ys_a = jax.vmap(lambda k: alg.solve(prob, key=k).y_final[0])(keys)
    ys_f = jax.vmap(lambda k: sdeint(prob, key=k, n_steps=512).y_final[0])(keys)
    # same Brownian grid → pathwise close; adaptive must take fewer steps
    assert float(jnp.abs(ys_a - ys_f).mean()) < 0.02
    n_used = alg.solve(prob, key=keys[0]).num_steps
    assert int(n_used) < 512


def test_deep_bsde_hjb_small():
    # 4-dimensional HJB, the reference's validation contract (rel L2 < 0.2)
    d, lam = 4, 1.0
    x0 = jnp.zeros(d, jnp.float32)
    g = lambda x: jnp.log(0.5 + 0.5 * jnp.sum(x * x))
    prob = TerminalPDEProblem(
        g=g,
        f=lambda t, x, u, z: -lam * jnp.sum(z * z),
        mu=lambda t, x: jnp.zeros_like(x),
        sigma=lambda t, x: jnp.sqrt(2.0),
        x0=x0, tspan=(0.0, 1.0),
    )
    hls = 16
    alg = NNPDENS(
        u0_net=MLP([d, hls, hls, 1], activation="relu"),
        grad_net=MLP([d + 1, hls, hls, d], activation="relu"),
    )
    res = solve_terminal_pde(prob, alg, jax.random.PRNGKey(0),
                             trajectories=64, n_steps=20, maxiters=800,
                             learning_rate=0.03, pabstol=1e-3)
    analytical = float(mc_analytical_hjb(g, x0, 1.0, lam, jax.random.PRNGKey(7),
                                         n_samples=10**5, batch=10**4))
    rel = abs(float(res.u0) - analytical) / abs(float(res.u0))
    assert rel < 0.2, f"rel {rel}, u0 {float(res.u0)} vs {analytical}"


def test_deep_bsde_adaptive_matches_fixed_grid():
    # adaptive=True (the reference's ``alg=LambaEM(), abstol, reltol`` role,
    # lambaem.jl:33-34): an AdaptiveEM pilot picks the grid and pinned-grid
    # refinement stops when u(0,x0) stops moving — the answer must agree
    # with the fixed-grid solve and the analytic MC value
    d, lam = 3, 1.0
    x0 = jnp.zeros(d, jnp.float32)
    g = lambda x: jnp.log(0.5 + 0.5 * jnp.sum(x * x))
    prob = TerminalPDEProblem(
        g=g, f=lambda t, x, u, z: -lam * jnp.sum(z * z),
        mu=lambda t, x: jnp.zeros_like(x), sigma=lambda t, x: jnp.sqrt(2.0),
        x0=x0, tspan=(0.0, 1.0),
    )
    hls = 12
    alg = NNPDENS(u0_net=MLP([d, hls, 1], activation="relu"),
                  grad_net=MLP([d + 1, hls, d], activation="relu"))
    kw = dict(trajectories=64, maxiters=400, learning_rate=0.03,
              pabstol=5e-3)
    res_fix = solve_terminal_pde(prob, alg, jax.random.PRNGKey(0),
                                 n_steps=20, **kw)
    res_ada = solve_terminal_pde(prob, alg, jax.random.PRNGKey(0),
                                 adaptive=True, sde_abstol=5e-2,
                                 sde_reltol=5e-2, **kw)
    assert res_ada.n_steps >= 8  # pilot-chosen grid recorded
    analytical = float(mc_analytical_hjb(g, x0, 1.0, lam,
                                         jax.random.PRNGKey(7),
                                         n_samples=10**4, batch=10**4))
    rel_ada = abs(float(res_ada.u0) - analytical) / abs(analytical)
    assert rel_ada < 0.2, f"adaptive rel {rel_ada}"
    assert abs(float(res_ada.u0) - float(res_fix.u0)) < 0.15, (
        float(res_ada.u0), float(res_fix.u0))


def test_deep_bsde_sharded_matches_unsharded():
    # trajectory batch sharded over the 8-device virtual mesh (SURVEY §2.4:
    # trajectory batching is THE distributed axis); same key → placement must
    # not change the training trajectory
    from universal_differential_equations_tpu.parallel import ensemble_mesh

    d, lam = 3, 1.0
    x0 = jnp.zeros(d, jnp.float32)
    g = lambda x: jnp.log(0.5 + 0.5 * jnp.sum(x * x))
    prob = TerminalPDEProblem(
        g=g, f=lambda t, x, u, z: -lam * jnp.sum(z * z),
        mu=lambda t, x: jnp.zeros_like(x), sigma=lambda t, x: jnp.sqrt(2.0),
        x0=x0, tspan=(0.0, 1.0),
    )
    alg = NNPDENS(u0_net=MLP([d, 8, 1], activation="relu"),
                  grad_net=MLP([d + 1, 8, d], activation="relu"))
    mesh = ensemble_mesh()
    assert len(mesh.devices.ravel()) == 8  # conftest forces 8 virtual devices
    kw = dict(trajectories=32, n_steps=8, maxiters=25, learning_rate=0.03,
              pabstol=0.0)
    res_ref = solve_terminal_pde(prob, alg, jax.random.PRNGKey(3), **kw)
    res_sh = solve_terminal_pde(prob, alg, jax.random.PRNGKey(3), mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(res_sh.losses),
                               np.asarray(res_ref.losses), rtol=1e-5)
    np.testing.assert_allclose(float(res_sh.u0), float(res_ref.u0), rtol=1e-5)


def test_adaptive_em_exact_zero_state_not_forward_filled():
    # An accepted state that is exactly the zero vector must count as
    # visited: saveat snapping forward-fills from the nearest *visited*
    # slot, and inferring visitedness from ys != 0 would hold the last
    # nonzero value across the zero crossing.
    #
    # Deterministic construction: dy = -dt, grid_resolution 256 on [0, 2]
    # (h = 1/128, all binary fractions, arithmetic exact).  The doubling
    # controller's accepted writes land on slots {4, 12, 28, 60, 124, 252};
    # u0 = 124h = 0.96875 puts EXACTLY 0.0 into visited slot 124, so every
    # query in [124h, 252h) must read 0.0 — not forward-fill 0.5 from
    # slot 60 as the ys != 0 inference would.
    prob = SDEProblem(
        f=lambda t, y, args: -jnp.ones_like(y),
        g=lambda t, y, args: jnp.zeros_like(y),  # deterministic path
        u0=jnp.array([0.96875]),
        tspan=(0.0, 2.0),
    )
    alg = AdaptiveEM(grid_resolution=256, abstol=1e-6, reltol=1e-5)
    ts = jnp.asarray([0.0, 1.5, 2.0])
    sol = alg.solve(prob, key=jax.random.PRNGKey(0), saveat=ts)
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.ys[0, 0]), 0.96875, atol=1e-12)
    assert float(sol.ys[1, 0]) == 0.0, float(sol.ys[1, 0])
    np.testing.assert_allclose(float(sol.y_final[0]), 0.96875 - 2.0,
                               atol=1e-6)
