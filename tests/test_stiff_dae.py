"""Stiff/implicit solver tests: Rosenbrock23 and the native BDF DAE (C4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.core.integrate import integrate_fixed
from universal_differential_equations_tpu.solvers.bdf import daeint, initialize_dae
from universal_differential_equations_tpu.solvers.rosenbrock import Rosenbrock23


def _rober_rhs(t, y, args):
    k1, k2, k3 = 0.04, 3e7, 1e4
    return jnp.array([
        -k1 * y[0] + k3 * y[1] * y[2],
        k1 * y[0] - k2 * y[1] ** 2 - k3 * y[1] * y[2],
        k2 * y[1] ** 2,
    ])


# scipy Radau at rtol 1e-8 (cross-checked once, hard-coded)
_ROBER_1E4 = np.array([1.07300429e-01, 4.80016698e-07, 8.92699091e-01])


def test_rosenbrock_order_two():
    f = lambda t, y, args: y * jnp.cos(t)
    errs = []
    for n in [20, 40, 80]:
        _, ys = integrate_fixed(f, jnp.array([1.0]), 0.0, 3.0, None,
                                Rosenbrock23(), n)
        errs.append(abs(float(ys[-1, 0]) - np.exp(np.sin(3.0))))
    assert np.log2(errs[-2] / errs[-1]) > 1.6


def test_rosenbrock_robertson():
    prob = ude.ODEProblem(_rober_rhs, jnp.array([1.0, 0.0, 0.0]), (0.0, 1e4))
    sol = ude.solve(prob, Rosenbrock23(), rtol=1e-6, atol=1e-10,
                    adjoint=ude.NoAdjoint(), max_steps=4096)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.y_final), _ROBER_1E4, rtol=1e-4)
    assert abs(float(sol.y_final.sum()) - 1.0) < 1e-10  # mass conservation


def test_rosenbrock_differentiable():
    # discrete adjoint through the linearly-implicit stepper (LU inside)
    def loss(k1):
        def rhs(t, y, a):
            return jnp.array([-a * y[0], a * y[0] - 1e3 * y[1]])
        prob = ude.ODEProblem(rhs, jnp.array([1.0, 0.0]), (0.0, 1.0), k1)
        sol = ude.solve(prob, Rosenbrock23(), rtol=1e-7, atol=1e-9,
                        adjoint=ude.DiscreteAdjoint(), max_steps=256)
        return sol.ys[-1, 0]

    g = float(jax.grad(loss)(jnp.asarray(0.5)))
    # d/dk e^{-k} at k=0.5
    assert abs(g + np.exp(-0.5)) < 1e-4


def test_sdirk3_order_three_and_robertson():
    from universal_differential_equations_tpu.solvers.sdirk import SDIRK3, _G

    # derived gamma is the exact root of the L-stability cubic
    assert abs(_G**3 - 3 * _G**2 + 1.5 * _G - 1.0 / 6.0) < 1e-15
    f = lambda t, y, args: y * jnp.cos(t)
    errs = []
    for n in [10, 20, 40]:
        _, ys = integrate_fixed(f, jnp.array([1.0]), 0.0, 3.0, None, SDIRK3(), n)
        errs.append(abs(float(ys[-1, 0]) - np.exp(np.sin(3.0))))
    assert np.log2(errs[-2] / errs[-1]) > 2.6  # third order

    prob = ude.ODEProblem(_rober_rhs, jnp.array([1.0, 0.0, 0.0]), (0.0, 1e4))
    sol = ude.solve(prob, SDIRK3(), rtol=1e-6, atol=1e-10,
                    adjoint=ude.NoAdjoint(), max_steps=4096)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.y_final), _ROBER_1E4, rtol=1e-4)


def test_sdirk3_differentiable():
    from universal_differential_equations_tpu.solvers.sdirk import SDIRK3

    def loss(k1):
        def rhs(t, y, a):
            return jnp.array([-a * y[0], a * y[0] - 1e3 * y[1]])
        prob = ude.ODEProblem(rhs, jnp.array([1.0, 0.0]), (0.0, 1.0), k1)
        sol = ude.solve(prob, SDIRK3(), rtol=1e-7, atol=1e-9,
                        adjoint=ude.DiscreteAdjoint(), max_steps=256)
        return sol.ys[-1, 0]

    g = float(jax.grad(loss)(jnp.asarray(0.5)))
    assert abs(g + np.exp(-0.5)) < 1e-4


def test_esdirk_order_conditions_exact():
    # Kvaerno3 (derived at import) and SDIRK4 (HW rationals) must satisfy
    # the rooted-tree order conditions to machine precision, and both must
    # be L-stable: R(z) -> 0 as z -> -inf for the stiffly-accurate row.
    from universal_differential_equations_tpu.solvers import esdirk as es

    for A_t, b_t, bh_t, order in [
        (es._K3_A, es._K3_B, es._K3_BH, 3),
        (es._S4_A, es._S4_B, es._S4_BH, 4),
    ]:
        A = np.array(A_t)
        b = np.array(b_t)
        bh = np.array(bh_t)
        c = A.sum(axis=1)
        Ac = A @ c
        conds = [
            (b.sum(), 1.0), (b @ c, 0.5), (b @ c**2, 1 / 3), (b @ Ac, 1 / 6),
        ]
        if order >= 4:
            conds += [
                (b @ c**3, 0.25), (b @ (c * Ac), 0.125),
                (b @ (A @ c**2), 1 / 12), (b @ (A @ Ac), 1 / 24),
            ]
        for got, want in conds:
            assert abs(got - want) < 1e-13
        # embedded companion is one order lower but at least order 2
        assert abs(bh.sum() - 1.0) < 1e-13 and abs(bh @ c - 0.5) < 1e-13
        # L-stability at the stiff limit
        z = -1e9
        R = 1.0 + z * b @ np.linalg.solve(np.eye(len(b)) - z * A, np.ones(len(b)))
        assert abs(R) < 1e-6


@pytest.mark.parametrize("solver_name,rate", [("Kvaerno3", 2.6), ("SDIRK4", 3.5)])
def test_esdirk_convergence_order(solver_name, rate):
    solver = getattr(ude, solver_name)()
    f = lambda t, y, args: y * jnp.cos(t)
    errs = []
    for n in [10, 20, 40]:
        _, ys = integrate_fixed(f, jnp.array([1.0]), 0.0, 3.0, None, solver, n)
        errs.append(abs(float(ys[-1, 0]) - np.exp(np.sin(3.0))))
    assert np.log2(errs[-2] / errs[-1]) > rate


@pytest.mark.parametrize("solver_name", ["Kvaerno3", "SDIRK4"])
def test_esdirk_robertson(solver_name):
    solver = getattr(ude, solver_name)()
    prob = ude.ODEProblem(_rober_rhs, jnp.array([1.0, 0.0, 0.0]), (0.0, 1e4))
    sol = ude.solve(prob, solver, rtol=1e-6, atol=1e-10,
                    adjoint=ude.NoAdjoint(), max_steps=4096)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.y_final), _ROBER_1E4, rtol=1e-4)
    assert abs(float(sol.y_final.sum()) - 1.0) < 1e-9  # mass conservation


def test_kvaerno3_differentiable():
    def loss(k1):
        def rhs(t, y, a):
            return jnp.array([-a * y[0], a * y[0] - 1e3 * y[1]])
        prob = ude.ODEProblem(rhs, jnp.array([1.0, 0.0]), (0.0, 1.0), k1)
        sol = ude.solve(prob, ude.Kvaerno3(), rtol=1e-7, atol=1e-9,
                        adjoint=ude.DiscreteAdjoint(), max_steps=256)
        return sol.ys[-1, 0]

    g = float(jax.grad(loss)(jnp.asarray(0.5)))
    assert abs(g + np.exp(-0.5)) < 1e-4


def test_sdirk4_high_order_pays_off():
    # at tight tolerance the order-4 method needs far fewer accepted steps
    # than the order-2 Rosenbrock on a smooth nonlinear problem
    f = lambda t, y, args: -(y ** 3) + jnp.sin(t)
    prob = ude.ODEProblem(f, jnp.array([1.0]), (0.0, 10.0))
    s4 = ude.solve(prob, ude.SDIRK4(), rtol=1e-8, atol=1e-10,
                   adjoint=ude.NoAdjoint(), max_steps=4096)
    s2 = ude.solve(prob, Rosenbrock23(), rtol=1e-8, atol=1e-10,
                   adjoint=ude.NoAdjoint(), max_steps=4096)
    assert bool(s4.success) and bool(s2.success)
    assert int(s4.num_accepted) < 0.4 * int(s2.num_accepted)
    np.testing.assert_allclose(float(s4.y_final[0]), float(s2.y_final[0]),
                               rtol=1e-5)


def test_dae_decay_implicit_form():
    prob = ude.DAEProblem(f=lambda t, u, du, a: du + u,
                          u0=jnp.array([1.0]), du0=jnp.array([-1.0]),
                          tspan=(0.0, 2.0))
    sol = daeint(prob, rtol=1e-8, atol=1e-10)
    assert bool(sol.success)
    assert abs(float(sol.y_final[0]) - np.exp(-2.0)) < 1e-6


def test_dae_robertson_with_constraint():
    # classic ROBER-DAE: 2 differential + 1 algebraic conservation row
    def rober_dae(t, u, du, a):
        y1, y2, y3 = u
        return jnp.array([
            du[0] + 0.04 * y1 - 1e4 * y2 * y3,
            du[1] - 0.04 * y1 + 1e4 * y2 * y3 + 3e7 * y2 ** 2,
            y1 + y2 + y3 - 1.0,
        ])

    prob = ude.DAEProblem(
        f=rober_dae, u0=jnp.array([1.0, 0.0, 0.0]),
        du0=jnp.array([-0.04, 0.04, 0.0]), tspan=(0.0, 1e4),
        differential_vars=jnp.array([True, True, False]),
    )
    sol = daeint(prob, rtol=1e-7, atol=1e-10, max_steps=8192)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.y_final), _ROBER_1E4, rtol=1e-3)


def test_dae_consistent_initialization():
    # IDA calcIC analogue: start from inconsistent algebraic state
    def rober_dae(t, u, du, a):
        y1, y2, y3 = u
        return jnp.array([
            du[0] + 0.04 * y1 - 1e4 * y2 * y3,
            du[1] - 0.04 * y1 + 1e4 * y2 * y3 + 3e7 * y2 ** 2,
            y1 + y2 + y3 - 1.0,
        ])

    prob = ude.DAEProblem(
        f=rober_dae, u0=jnp.array([1.0, 0.0, 0.7]),  # wrong y3
        du0=jnp.zeros(3), tspan=(0.0, 1.0),
        differential_vars=jnp.array([True, True, False]),
    )
    u0c, du0c, res = initialize_dae(prob)
    assert float(res) < 1e-10
    np.testing.assert_allclose(np.asarray(u0c), [1.0, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(du0c)[:2], [-0.04, 0.04], atol=1e-10)


def test_dae_variable_order_pays_off():
    # IDA-parity check: the variable-order BDF(1-5) must solve Robertson
    # in far fewer steps than its order-2 subset at equal tolerance, and at
    # least as accurately (measured: ~244 vs ~1067 accepted steps).
    def rober_dae(t, u, du, a):
        y1, y2, y3 = u
        return jnp.array([
            du[0] + 0.04 * y1 - 1e4 * y2 * y3,
            du[1] - 0.04 * y1 + 1e4 * y2 * y3 + 3e7 * y2 ** 2,
            y1 + y2 + y3 - 1.0,
        ])

    prob = ude.DAEProblem(
        f=rober_dae, u0=jnp.array([1.0, 0.0, 0.0]),
        du0=jnp.array([-0.04, 0.04, 0.0]), tspan=(0.0, 1e4),
        differential_vars=jnp.array([True, True, False]),
    )
    sol5 = daeint(prob, rtol=1e-7, atol=1e-10, max_steps=16384, max_order=5)
    sol2 = daeint(prob, rtol=1e-7, atol=1e-10, max_steps=16384, max_order=2)
    assert bool(sol5.success) and bool(sol2.success)
    assert int(sol5.num_accepted) < 0.5 * int(sol2.num_accepted)
    np.testing.assert_allclose(np.asarray(sol5.y_final), _ROBER_1E4, rtol=1e-4)


def test_dae_high_order_polynomial():
    # BDF-5 must integrate a degree-5 polynomial essentially exactly once
    # the order ramp completes (the divided-difference LTE estimate of a
    # degree-5 polynomial vanishes at order 5 → big steps, tiny error).
    c = [0.3, -0.2, 0.05, 0.01, -0.002, 0.0004]
    poly = lambda t: sum(ci * t ** i for i, ci in enumerate(c))
    dpoly = lambda t: sum(i * ci * t ** (i - 1) for i, ci in enumerate(c) if i)
    prob = ude.DAEProblem(
        f=lambda t, u, du, a: du - jnp.array([dpoly(t)]),
        u0=jnp.array([poly(0.0)]), du0=jnp.array([dpoly(0.0)]),
        tspan=(0.0, 10.0),
    )
    sol = daeint(prob, rtol=1e-9, atol=1e-12, max_steps=4096)
    assert bool(sol.success)
    assert int(sol.num_accepted) < 120  # order ramp then near-free stepping
    assert abs(float(sol.y_final[0]) - poly(10.0)) < 1e-7


def test_fenep_truth_against_ida_role():
    # FENE-P exact stress: native BDF replaces Sundials IDA (FENEP.jl:24-39);
    # sanity: periodic steady oscillation, bounded, correct startup slope
    from universal_differential_equations_tpu.models import fenep

    ts = jnp.linspace(0.0, 6.2831, 50)
    sigma, ok = fenep.find_sigma_exact(ts, lambda t: 12.0 * jnp.cos(t))
    assert bool(ok)
    s = np.asarray(sigma)
    assert np.all(np.isfinite(s)) and 3.0 < np.abs(s).max() < 12.0
    # startup slope of the *observed* stress: τ12 = θ12·fλ/λ (algebraic),
    # so dτ12/dt(0) = (fλ(0)/λ)·dθ12/dt(0) = (4/2)·12 = 24
    ts_fine = jnp.linspace(0.0, 0.01, 5)
    s_fine, ok2 = fenep.find_sigma_exact(ts_fine, lambda t: 12.0 * jnp.cos(t))
    assert bool(ok2)
    slope = float((s_fine[1] - s_fine[0]) / (ts_fine[1] - ts_fine[0]))
    assert abs(slope - 24.0) / 24.0 < 0.05


def test_fenep_stiff_ode_crosschecks_dae():
    # the index-1 reduction (models.fenep.fenep_stiff_rhs) solved with the
    # ESDIRK shelf must reproduce the BDF DAE's tau12 — the end-to-end
    # consumer path for Kvaerno3/SDIRK4 (examples/non_newtonian/fenep.py
    # runs the same cross-check on a longer window)
    from universal_differential_equations_tpu.models import fenep

    ts = jnp.linspace(0.0, 4.0, 30)
    gd = lambda t: 12.0 * jnp.cos(1.5 * t)
    s_dae, ok = fenep.find_sigma_exact(ts, gd, x64_host=False)
    assert bool(ok)
    scale = float(jnp.max(jnp.abs(s_dae)))
    for solver in (ude.Kvaerno3(), ude.SDIRK4()):
        s_ode, ok2 = fenep.find_sigma_exact_ode(ts, gd, solver,
                                                x64_host=False)
        assert bool(ok2)
        rel = float(jnp.max(jnp.abs(s_ode - s_dae))) / scale
        assert rel < 1e-4, f"{type(solver).__name__}: {rel:.2e}"


@pytest.mark.parametrize("solver_name", ["Kvaerno3", "SDIRK4"])
def test_esdirk_vmaps_over_ensemble(solver_name):
    # the DIRK Newton/LU machinery must batch over the ensemble axis (C24)
    solver = getattr(ude, solver_name)()

    def run(k1):
        prob = ude.ODEProblem(
            lambda t, y, a: jnp.array([-a * y[0], a * y[0] - 1e3 * y[1]]),
            jnp.array([1.0, 0.0]), (0.0, 1.0), k1)
        sol = ude.solve(prob, solver, rtol=1e-6, atol=1e-9,
                        adjoint=ude.NoAdjoint(), max_steps=256)
        return sol.y_final, sol.success

    ks = jnp.linspace(0.3, 0.8, 6)
    ys, ok = jax.vmap(run)(ks)
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(ys[:, 0]), np.exp(-np.asarray(ks)),
                               rtol=1e-5)
