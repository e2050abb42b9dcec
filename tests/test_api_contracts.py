"""Hostile-input contracts of the public library surface (VERDICT r3 #8).

The reference is a set of scripts; this deliverable is a *library*, so the
public boundary must either work or fail with a named error — never return a
silently-clamped wrong answer or leak a JAX tracer stack.  Each test pins one
documented contract:

* reversed tspan integrates backward correctly (round-trips the state),
* saveat outside tspan raises (dense output would clamp it to the endpoint),
* non-inexact ``args`` under a continuous adjoint raises a TypeError naming
  the constraint (``adjoint/sensitivity.py`` module docstring),
* a ``remake`` that breaks the f/u0 shape contract raises at the ``solve``
  boundary with both raveled shapes in the message,
* ``daeint`` without ``differential_vars`` on a genuine index-1 DAE fails
  *cleanly*: ``success=False`` (runtime code under jit cannot raise), while
  passing the mask solves it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.models import lotka_volterra as lv


def test_reversed_tspan_round_trips():
    ts_f = jnp.linspace(0.0, 5.0, 11)
    fwd = ude.solve(ude.ODEProblem(lv.lotka_rhs, lv.U0, (0.0, 5.0), lv.P_TRUE),
                    ude.Tsit5(), saveat=ts_f, rtol=1e-9, atol=1e-11)
    assert bool(fwd.success)
    back = ude.solve(
        ude.ODEProblem(lv.lotka_rhs, fwd.ys[-1], (5.0, 0.0), lv.P_TRUE),
        ude.Tsit5(), saveat=ts_f[::-1], rtol=1e-9, atol=1e-11)
    assert bool(back.success)
    np.testing.assert_allclose(np.asarray(back.ys[-1]), np.asarray(lv.U0),
                               rtol=1e-5)


def test_saveat_outside_tspan_raises():
    prob = ude.ODEProblem(lv.lotka_rhs, lv.U0, (0.0, 5.0), lv.P_TRUE)
    with pytest.raises(ValueError, match="outside tspan"):
        ude.solve(prob, ude.Tsit5(), saveat=jnp.array([0.0, 2.0, 7.0]))
    with pytest.raises(ValueError, match="outside tspan"):
        ude.solve(prob, ude.Tsit5(), saveat=jnp.array([-1.0, 2.0]))
    # interior grids (incl. endpoint rounding slack) stay accepted
    sol = ude.solve(prob, ude.Tsit5(), saveat=jnp.array([0.0, 5.0 + 1e-7]))
    assert bool(sol.success)


def test_nonexact_args_under_continuous_adjoint_raises():
    prob = ude.ODEProblem(lambda t, u, a: -a["k"] * u, jnp.ones(2),
                          (0.0, 1.0), {"k": 3, "c": jnp.ones(2)})

    def loss(u0):
        s = ude.solve(ude.remake(prob, u0=u0), ude.Tsit5(),
                      adjoint=ude.InterpolatingAdjoint())
        return jnp.sum(s.ys ** 2)

    with pytest.raises(TypeError, match="inexact.*DiscreteAdjoint"):
        jax.grad(loss)(jnp.ones(2))
    # DiscreteAdjoint (the error's suggested fallback) handles the same args
    def loss_d(u0):
        s = ude.solve(ude.remake(prob, u0=u0), ude.Tsit5(),
                      adjoint=ude.DiscreteAdjoint())
        return jnp.sum(s.ys ** 2)
    g = jax.grad(loss_d)(jnp.ones(2))
    assert np.all(np.isfinite(np.asarray(g)))


def test_remake_shape_mismatch_raises_at_solve_boundary():
    prob = ude.ODEProblem(lv.lotka_rhs, lv.U0, (0.0, 5.0), lv.P_TRUE)
    bad = ude.remake(prob, u0=jnp.ones(3))  # lotka_rhs emits 2 states
    with pytest.raises(ValueError, match="ravels to"):
        ude.solve(bad, ude.Tsit5())
    # an f that *fails* on the new state (not just mis-sizes) names solve()
    prob2 = ude.ODEProblem(lambda t, u, a: u @ a, jnp.ones(2), (0.0, 1.0),
                           jnp.eye(2))
    bad2 = ude.remake(prob2, args=jnp.eye(3))
    with pytest.raises(TypeError, match="initial state"):
        ude.solve(bad2, ude.Tsit5())


def test_daeint_without_differential_vars_fails_cleanly():
    from universal_differential_equations_tpu.solvers import daeint

    def res(t, u, du, a):
        # index-1 DAE: u0' = -u0, algebraic constraint u0 + u1 = 1
        return jnp.array([du[0] + u[0], u[0] + u[1] - 1.0])

    u0 = jnp.array([1.0, 0.0])
    du0 = jnp.array([-1.0, 0.0])
    ts = jnp.linspace(0.0, 1.0, 5)
    prob_nomask = ude.DAEProblem(res, u0, du0, (0.0, 1.0))
    sol = daeint(prob_nomask, saveat=ts)
    assert not bool(sol.success)  # clean failure, no hang / no wrong answer

    prob = ude.DAEProblem(res, u0, du0, (0.0, 1.0),
                          differential_vars=jnp.array([True, False]))
    sol2 = daeint(prob, saveat=ts, rtol=1e-6, atol=1e-8)
    assert bool(sol2.success)
    exact = np.exp(-np.asarray(ts))
    np.testing.assert_allclose(np.asarray(sol2.ys)[:, 0], exact, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol2.ys).sum(axis=1), 1.0, atol=1e-4)


def test_sde_and_dae_dispatch_messages():
    sprob = ude.SDEProblem(f=lambda t, u, a: -u, g=lambda t, u, a: 0.1 * u,
                           u0=jnp.ones(1), tspan=(0.0, 1.0))
    with pytest.raises(TypeError, match="sdeint"):
        ude.solve(sprob, ude.Tsit5())
    with pytest.raises(TypeError, match="callable"):
        ude.ODEProblem("not-a-function", jnp.ones(2), (0.0, 1.0))


def test_solve_contract_checks_stay_jittable():
    # the boundary checks are trace-time only: solve under jit/vmap/grad with
    # in-range saveat and float args must stay compilable
    prob = ude.ODEProblem(lv.lotka_rhs, lv.U0, (0.0, 2.0), lv.P_TRUE)
    ts = jnp.linspace(0.0, 2.0, 9)

    @jax.jit
    def run(p):
        return ude.solve(ude.remake(prob, args=p), ude.Tsit5(), saveat=ts,
                         rtol=1e-6).ys

    ys = run(lv.P_TRUE)
    assert ys.shape == (9, 2) and np.all(np.isfinite(np.asarray(ys)))
    g = jax.jit(jax.grad(lambda p: jnp.sum(run(p) ** 2)))(lv.P_TRUE)
    assert np.all(np.isfinite(np.asarray(g)))
