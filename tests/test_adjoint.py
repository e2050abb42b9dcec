"""Gradient-equivalence tests across all sensitivity algorithms (SURVEY.md §7 M2).

Checks every sensealg against finite differences and against each other on a
parameterized nonlinear ODE — the build plan's "gradient-equivalence tests
across all three" (forward, discrete reverse, continuous adjoints).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import universal_differential_equations_tpu as ude


def _loss_fn(adjoint):
    ts = jnp.linspace(0.0, 3.0, 7)

    def rhs(t, y, args):
        x, z = y[0], y[1]
        a, b, g, d = args["p"]
        return jnp.array([a * x - b * x * z, g * x * z - d * z])

    target = jnp.stack([jnp.ones(7) * 1.0, jnp.ones(7) * 0.5], axis=-1)

    def loss(params, u0):
        prob = ude.ODEProblem(rhs, u0, (0.0, 3.0), args=params)
        sol = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-8, atol=1e-10,
                        adjoint=adjoint)
        return jnp.sum((sol.ys - target) ** 2)

    return loss


P0 = {"p": jnp.array([1.3, 0.9, 0.8, 1.8])}
U0 = jnp.array([0.44249296, 4.6280594])


def _fd_grad(loss, params, u0, eps=1e-6):
    flat, unravel = jax.flatten_util.ravel_pytree((params, u0))
    base = np.zeros(flat.shape[0])
    for i in range(flat.shape[0]):
        lo = loss(*unravel(flat.at[i].add(-eps)))
        hi = loss(*unravel(flat.at[i].add(+eps)))
        base[i] = (float(hi) - float(lo)) / (2 * eps)
    return base


@pytest.fixture(scope="module")
def fd_reference():
    loss = _loss_fn(ude.DiscreteAdjoint())
    return _fd_grad(loss, P0, U0)


@pytest.mark.parametrize(
    "adjoint",
    [
        ude.DiscreteAdjoint(),
        ude.DiscreteAdjoint(checkpoint=False),
        ude.InterpolatingAdjoint(),
        ude.InterpolatingAdjoint(interp_nodes=2),
        ude.BacksolveAdjoint(),
        ude.QuadratureAdjoint(),
        ude.QuadratureAdjoint(quad_order=6),
    ],
    ids=["discrete", "discrete-noremat", "interpolating",
         "interpolating-cubic", "backsolve", "quadrature", "quadrature-q6"],
)
def test_reverse_gradients_match_fd(adjoint, fd_reference):
    loss = _loss_fn(adjoint)
    gp, gu = jax.grad(loss, argnums=(0, 1))(P0, U0)
    flat, _ = jax.flatten_util.ravel_pytree((gp, gu))
    np.testing.assert_allclose(np.asarray(flat), fd_reference, rtol=2e-4, atol=1e-5)


def test_forward_mode_matches_fd(fd_reference):
    # ForwardDiffSensitivity analogue (C7): jacfwd through the scan stepper.
    loss = _loss_fn(ude.ForwardSensitivity())
    gp, gu = jax.jacfwd(loss, argnums=(0, 1))(P0, U0)
    flat, _ = jax.flatten_util.ravel_pytree((gp, gu))
    np.testing.assert_allclose(np.asarray(flat), fd_reference, rtol=2e-4, atol=1e-5)


def test_grad_jits_and_vmaps():
    loss = _loss_fn(ude.InterpolatingAdjoint())
    g = jax.jit(jax.grad(loss))(P0, U0)
    assert np.all(np.isfinite(jax.flatten_util.ravel_pytree(g)[0]))
    # vmap over a batch of initial conditions (ensemble axis, SURVEY.md §2.4)
    u0s = jnp.stack([U0, U0 * 1.1, U0 * 0.9])
    gs = jax.vmap(lambda u: jax.grad(loss)(P0, u)["p"])(u0s)
    assert gs.shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(gs)))


def test_continuous_adjoint_matches_discrete_tightly():
    g_disc = jax.grad(_loss_fn(ude.DiscreteAdjoint()))(P0, U0)["p"]
    g_int = jax.grad(_loss_fn(ude.InterpolatingAdjoint()))(P0, U0)["p"]
    np.testing.assert_allclose(np.asarray(g_int), np.asarray(g_disc),
                               rtol=1e-4, atol=1e-7)


def test_quadrature_subpanels_fix_coarse_saveat():
    # With a single save point the whole horizon is ONE quadrature segment
    # spanning dozens of solver steps; the integrand λᵀ∂f/∂p is only
    # piecewise smooth there, so a single GL panel is inaccurate and
    # ``quad_subpanels`` must restore the gradient (ADVICE r1 #1).
    ts = jnp.array([0.0, 3.0])

    def rhs(t, y, args):
        x, z = y[0], y[1]
        a, b, g, d = args["p"]
        return jnp.array([a * x - b * x * z, g * x * z - d * z])

    def loss(adjoint):
        def fn(params):
            prob = ude.ODEProblem(rhs, U0, (0.0, 3.0), args=params)
            sol = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-8,
                            atol=1e-10, adjoint=adjoint)
            return jnp.sum((sol.ys[-1] - jnp.array([1.0, 0.5])) ** 2)
        return fn

    g_ref = jax.grad(loss(ude.DiscreteAdjoint()))(P0)["p"]
    g_1 = jax.grad(loss(ude.QuadratureAdjoint(quad_order=4)))(P0)["p"]
    g_16 = jax.grad(
        loss(ude.QuadratureAdjoint(quad_order=4, quad_subpanels=16))
    )(P0)["p"]
    err_1 = float(jnp.max(jnp.abs(g_1 - g_ref) / (jnp.abs(g_ref) + 1e-12)))
    err_16 = float(jnp.max(jnp.abs(g_16 - g_ref) / (jnp.abs(g_ref) + 1e-12)))
    assert err_16 < 1e-4, f"sub-paneled quadrature gradient off: {err_16:.2e}"
    assert err_16 < err_1 / 10 or err_1 < 1e-6, (
        f"sub-paneling did not improve the coarse-saveat gradient: "
        f"{err_1:.2e} -> {err_16:.2e}")


def test_seminorm_gradients_match():
    # adjoint seminorm (arXiv:2009.09457): dropping the parameter-quadrature
    # rows from the backward error test must not change gradients beyond
    # tolerance-level noise
    g_full = jax.grad(_loss_fn(ude.InterpolatingAdjoint()))(P0, U0)["p"]
    g_semi = jax.grad(_loss_fn(ude.InterpolatingAdjoint(seminorm=True)))(P0, U0)["p"]
    np.testing.assert_allclose(np.asarray(g_semi), np.asarray(g_full),
                               rtol=1e-4, atol=1e-7)
    g_bs = jax.grad(_loss_fn(ude.BacksolveAdjoint(seminorm=True)))(P0, U0)["p"]
    np.testing.assert_allclose(np.asarray(g_bs), np.asarray(g_full),
                               rtol=1e-4, atol=1e-7)


def test_error_weights_seminorm_step_control():
    # the err_weights hook must exclude masked components from step control:
    # a wild fast component with weight 0 no longer forces small steps
    from universal_differential_equations_tpu.core.integrate import (
        integrate_while,
    )

    def f(t, y, args):
        return jnp.array([jnp.cos(t), 200.0 * jnp.cos(200.0 * t)])

    y0 = jnp.zeros(2)
    full = integrate_while(f, y0, 0.0, 3.0, None, ude.Tsit5(), 1e-8, 1e-8,
                           None, 8192)
    masked = integrate_while(f, y0, 0.0, 3.0, None, ude.Tsit5(), 1e-8, 1e-8,
                             None, 8192,
                             err_weights=jnp.array([1.0, 0.0]))
    assert bool(full.success) and bool(masked.success)
    assert int(masked.n_acc) < 0.3 * int(full.n_acc)
    # the controlled component stays accurate
    assert abs(float(masked.y_final[0]) - np.sin(3.0)) < 1e-6


def test_second_order_hvp_through_stepper():
    # Hessian-vector products (forward-over-reverse through the bounded-scan
    # discrete adjoint) must match finite differences of the gradient —
    # second-order sensitivity for Newton/Gauss-Newton trainers.
    loss = _loss_fn(ude.DiscreteAdjoint())
    p_flat, unravel = jax.flatten_util.ravel_pytree(P0)

    def loss_flat(pf):
        return loss(unravel(pf), U0)

    v = jnp.array([0.3, -0.7, 0.5, 0.2])
    _, hvp = jax.jvp(jax.grad(loss_flat), (p_flat,), (v,))
    eps = 1e-5
    g_hi = jax.grad(loss_flat)(p_flat + eps * v)
    g_lo = jax.grad(loss_flat)(p_flat - eps * v)
    fd = (g_hi - g_lo) / (2 * eps)
    np.testing.assert_allclose(np.asarray(hvp), np.asarray(fd),
                               rtol=5e-4, atol=1e-4)
    # and it jits
    hvp_j = jax.jit(lambda pf, vv: jax.jvp(jax.grad(loss_flat), (pf,), (vv,))[1])(
        p_flat, v)
    np.testing.assert_allclose(np.asarray(hvp_j), np.asarray(hvp), rtol=1e-6)


def test_differentiable_error_sum_regularizer():
    # arXiv:2105.03918 solver-heuristic regularization: sol.error_sum is the
    # differentiable sum of tolerance-normalized local error norms on the
    # bounded-scan paths — it grows with stiffness, has a positive gradient
    # w.r.t. a stiffness parameter, and is None on while-loop paths.
    def rhs(t, y, k):
        return -k * y + jnp.sin(10.0 * t) * k

    def esum(k, adjoint):
        sol = ude.solve(
            ude.ODEProblem(rhs, jnp.array([1.0]), (0.0, 3.0), k), ude.Tsit5(),
            rtol=1e-6, atol=1e-8, adjoint=adjoint,
        )
        return sol

    e1 = esum(jnp.asarray(1.0), ude.DiscreteAdjoint())
    e25 = esum(jnp.asarray(25.0), ude.DiscreteAdjoint())
    assert float(e25.error_sum) > 2.0 * float(e1.error_sum)
    g = jax.grad(
        lambda k: esum(k, ude.DiscreteAdjoint()).error_sum
    )(jnp.asarray(5.0))
    assert float(g) > 0.0 and np.isfinite(float(g))
    assert esum(jnp.asarray(1.0), ude.NoAdjoint()).error_sum is None


@pytest.mark.parametrize("adjoint", [
    ude.InterpolatingAdjoint(), ude.QuadratureAdjoint(),
    ude.BacksolveAdjoint()])
def test_failed_forward_poisons_continuous_adjoint(adjoint):
    # du = p*u² blows up at t = 1/p < t1, so the forward solve fails; the
    # continuous-adjoint backward must gate on forward success and return a
    # NaN-poisoned gradient WITHOUT integrating the NaN dynamics — feeding
    # them to the adaptive backward loops has been observed to fault the
    # TPU runtime outright (worker crash), not just return garbage.
    def rhs(t, y, p):
        return p * y * y

    def loss(p):
        sol = ude.solve(
            ude.ODEProblem(rhs, jnp.ones(1), (0.0, 2.0), p), ude.Tsit5(),
            saveat=jnp.linspace(0.0, 2.0, 5), rtol=1e-6, atol=1e-9,
            adjoint=adjoint, max_steps=256,
        )
        return jnp.sum(sol.ys[-1])

    g = jax.jit(jax.grad(loss))(jnp.asarray(2.0))
    assert bool(jnp.isnan(g)), f"expected NaN-poisoned gradient, got {g}"
    # and the healthy path still differentiates cleanly under the gate
    def loss_ok(p):
        sol = ude.solve(
            ude.ODEProblem(rhs, jnp.ones(1), (0.0, 0.25), p), ude.Tsit5(),
            saveat=jnp.linspace(0.0, 0.25, 5), rtol=1e-8, atol=1e-10,
            adjoint=adjoint, max_steps=256,
        )
        return jnp.sum(sol.ys[-1])

    g_ok = jax.jit(jax.grad(loss_ok))(jnp.asarray(2.0))
    # analytic: u(t) = 1/(1 - p t), du(T)/dp = T / (1 - p T)^2
    expect = 0.25 / (1.0 - 2.0 * 0.25) ** 2
    np.testing.assert_allclose(float(g_ok), expect, rtol=1e-5)
