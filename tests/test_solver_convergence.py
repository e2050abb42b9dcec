"""Convergence and accuracy tests for the explicit RK solver core.

Mirrors the reference's by-construction quality control (SURVEY.md §4): truth
generated at tight tolerance and compared against analytic solutions, here
promoted to a real test pyramid — empirical convergence order per tableau
(a wrong coefficient anywhere breaks the order conditions), adaptive-tolerance
tracking, dense output and derivative interpolation (C1/C2).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.core.integrate import integrate_fixed


def _order_of(solver, expect):
    f = lambda t, y, args: y * jnp.cos(t)
    y0 = jnp.array([1.0])
    exact = np.exp(np.sin(3.0))
    ns = [10, 20, 40] if expect < 6 else [10, 15, 20, 30]
    errs = []
    for n in ns:
        _, ys = integrate_fixed(f, y0, 0.0, 3.0, None, solver, n)
        errs.append(abs(float(ys[-1, 0]) - exact) + 1e-300)
    slopes = [
        np.log(errs[i] / errs[i + 1]) / np.log(ns[i + 1] / ns[i])
        for i in range(len(errs) - 1)
    ]
    return slopes[-1]


@pytest.mark.parametrize(
    "solver,expect",
    [
        (ude.Bosh3(), 3),
        (ude.Tsit5(), 5),
        (ude.Dopri5(), 5),
        (ude.Vern7(), 7),
        (ude.Heun(), 2),
    ],
)
def test_convergence_order(solver, expect):
    order = _order_of(solver, expect)
    assert order > expect - 0.45, f"{solver.name}: measured order {order}"


def _decay_problem():
    return ude.ODEProblem(
        lambda t, y, args: -args["k"] * y, jnp.array([1.0]), (0.0, 2.0),
        args={"k": jnp.array(1.0)},
    )


@pytest.mark.parametrize("solver", [ude.Tsit5(), ude.Vern7(), ude.Dopri5()])
def test_adaptive_tracks_tolerance(solver):
    prob = _decay_problem()
    prev = None
    for rtol in [1e-4, 1e-7, 1e-10]:
        sol = ude.solve(prob, solver, rtol=rtol, atol=rtol * 1e-2,
                        adjoint=ude.NoAdjoint())
        err = abs(float(sol.y_final[0]) - np.exp(-2.0))
        assert err < 100 * rtol
        if prev is not None:
            assert err <= prev * 2  # tighter tolerance may not be worse
        prev = err
        assert bool(sol.success)


def test_tight_tolerance_truth_generation():
    # The reference generates truth at abstol=reltol=1e-12 with Vern7
    # (``scenario_1.jl:41``): end-state accuracy must support that regime.
    prob = _decay_problem()
    sol = ude.solve(prob, ude.Vern7(), rtol=1e-12, atol=1e-14,
                    adjoint=ude.NoAdjoint())
    assert abs(float(sol.y_final[0]) - np.exp(-2.0)) < 1e-11


def test_saveat_interpolation():
    prob = _decay_problem()
    ts = jnp.linspace(0.0, 2.0, 21)
    sol = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-8, atol=1e-10,
                    adjoint=ude.NoAdjoint())
    np.testing.assert_allclose(
        np.asarray(sol.ys[:, 0]), np.exp(-np.asarray(ts)), rtol=1e-6, atol=1e-8
    )


def test_dense_output_and_derivative():
    # sol(t) and sol(t, nu=1) — reference ``sol(t, Val{1})`` (C2)
    prob = _decay_problem()
    sol = ude.solve(prob, ude.Tsit5(), rtol=1e-9, atol=1e-11, dense=True,
                    adjoint=ude.NoAdjoint())
    ts = jnp.linspace(0.1, 1.9, 7)
    np.testing.assert_allclose(
        np.asarray(sol(ts))[:, 0], np.exp(-np.asarray(ts)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sol(ts, 1))[:, 0], -np.exp(-np.asarray(ts)), rtol=1e-4
    )


@pytest.mark.parametrize("nodes", [2, 3, 4])
def test_dense_output_interpolation_order(nodes):
    # The m-node Hermite–Birkhoff window is a degree-2m−1 interpolant with
    # local error O(h^{2m}) (value) / O(h^{2m-1}) (derivative): halving h must
    # shrink the max mid-grid error by ≈2^{2m} / 2^{2m-1}.
    from universal_differential_equations_tpu.core.solution import (
        DenseInterpolation,
    )

    def build(n):
        ts = jnp.linspace(0.0, 2.0, n)
        ys = jnp.stack([jnp.sin(ts), jnp.cos(ts)], 1)
        fs = jnp.stack([jnp.cos(ts), -jnp.sin(ts)], 1)
        return DenseInterpolation(
            ts=ts, ys=ys, fs=fs, num_points=jnp.asarray(n, jnp.int32),
            direction=jnp.asarray(1.0), nodes=nodes,
        )

    tq = jnp.linspace(0.013, 1.987, 301)
    ref = jnp.stack([jnp.sin(tq), jnp.cos(tq)], 1)
    dref = jnp.stack([jnp.cos(tq), -jnp.sin(tq)], 1)
    errs, derrs = [], []
    for n in (9, 17):  # h and h/2
        d = build(n)
        errs.append(float(jnp.abs(d(tq) - ref).max()))
        derrs.append(float(jnp.abs(d(tq, 1) - dref).max()))
    ratio = errs[0] / errs[1]
    dratio = derrs[0] / derrs[1]
    assert 2 ** (2 * nodes) / 2.5 < ratio < 2 ** (2 * nodes) * 2.5, ratio
    assert 2 ** (2 * nodes - 1) / 2.5 < dratio < 2 ** (2 * nodes - 1) * 2.5, (
        dratio
    )


def test_dense_output_order_matched_vs_cubic():
    # Solver-order dense output (C1/C2): Vern7's 4-node septic window must
    # interpolate its own accepted-step grid orders of magnitude tighter than
    # the cubic would, and reproduce the stored nodes exactly.
    import dataclasses

    def f(t, y, args):
        return jnp.stack([-y[1], y[0]])

    prob = ude.ODEProblem(f, jnp.array([1.0, 0.0]), (0.0, 10.0))
    sol = ude.solve(prob, ude.Vern7(), rtol=1e-8, atol=1e-10, dense=True,
                    adjoint=ude.NoAdjoint())
    assert sol.dense.nodes == 4
    tq = jnp.linspace(0.01, 9.99, 401)
    ref = jnp.stack([jnp.cos(tq), jnp.sin(tq)], 1)
    dref = jnp.stack([-jnp.sin(tq), jnp.cos(tq)], 1)
    err = float(jnp.abs(sol(tq) - ref).max())
    derr = float(jnp.abs(sol(tq, 1) - dref).max())
    cubic = dataclasses.replace(sol.dense, nodes=2)
    cerr = float(jnp.abs(cubic(tq) - ref).max())
    cderr = float(jnp.abs(cubic(tq, 1) - dref).max())
    assert err < cerr / 100, (err, cerr)
    assert derr < cderr / 100, (derr, cderr)
    n = int(sol.num_accepted) + 1
    tn = sol.dense.ts[:n] * sol.dense.direction
    np.testing.assert_allclose(
        np.asarray(sol(tn)), np.asarray(sol.dense.ys[:n]), atol=1e-13
    )


def test_dense_output_fallback_short_solve():
    # Fewer stored points than the window size: falls back to cubic, stays
    # finite and accurate on a one-to-two-step solve.
    prob = ude.ODEProblem(lambda t, y, args: -y, jnp.array([1.0]), (0.0, 1e-3))
    sol = ude.solve(prob, ude.Vern7(), rtol=1e-3, atol=1e-6, dense=True,
                    adjoint=ude.NoAdjoint())
    val = sol(jnp.asarray(5e-4))
    assert bool(jnp.isfinite(val).all())
    np.testing.assert_allclose(float(val[0]), np.exp(-5e-4), rtol=1e-6)


def test_backward_integration():
    prob = ude.ODEProblem(lambda t, y, args: -y, jnp.array([np.exp(-2.0)]),
                          (2.0, 0.0))
    sol = ude.solve(prob, ude.Tsit5(), rtol=1e-9, atol=1e-11,
                    adjoint=ude.NoAdjoint())
    assert abs(float(sol.y_final[0]) - 1.0) < 1e-7


def test_pytree_state():
    # dict-valued state round-trips through the flat internal layout
    def f(t, y, args):
        return {"a": -y["a"], "b": y["a"] * 0.5}

    prob = ude.ODEProblem(f, {"a": jnp.array([1.0]), "b": jnp.array([0.0])},
                          (0.0, 1.0))
    sol = ude.solve(prob, ude.Tsit5(), rtol=1e-8, atol=1e-10,
                    adjoint=ude.NoAdjoint())
    assert abs(float(sol.y_final["a"][0]) - np.exp(-1.0)) < 1e-6


def test_failure_flag_on_step_budget():
    prob = _decay_problem()
    sol = ude.solve(prob, ude.Tsit5(), rtol=1e-12, atol=1e-14, max_steps=3,
                    adjoint=ude.NoAdjoint())
    assert not bool(sol.success)


def test_lotka_volterra_parity_grid():
    # Reference data generation: LV with Vern7, saveat=0.1 grid
    # (``scenario_1.jl:40-41``).  Cross-check two solvers at tight tolerance
    # agree to below the training-noise floor.
    def lotka(t, y, args):
        x, z = y[0], y[1]
        a, b, g, d = args
        return jnp.array([a * x - b * x * z, g * x * z - d * z])

    args = jnp.array([1.3, 0.9, 0.8, 1.8])
    prob = ude.ODEProblem(lotka, jnp.array([0.44249296, 4.6280594]), (0.0, 5.0), args)
    ts = jnp.arange(0.0, 5.01, 0.1)
    s1 = ude.solve(prob, ude.Vern7(), saveat=ts, rtol=1e-12, atol=1e-12,
                   adjoint=ude.NoAdjoint(), step_to_saveat=True)
    s2 = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-10, atol=1e-10,
                   adjoint=ude.NoAdjoint(), step_to_saveat=True)
    np.testing.assert_allclose(np.asarray(s1.ys), np.asarray(s2.ys),
                               rtol=1e-7, atol=1e-9)
