"""Tests: multiple shooting (C18), ensemble runner (C24), checkpoint io (C25),
stabilized stiff solver (C3), and multi-chip ensemble sharding (§2.4)."""
import numpy as np

import jax
import jax.numpy as jnp
import optax
import pytest

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.ensemble import (
    EnsembleResult,
    ensemble_run,
    noise_schedule,
)
from universal_differential_equations_tpu.io import (
    BestCheckpoint,
    KeyedArchive,
    load_pytree,
    save_pytree,
)
from universal_differential_equations_tpu.models import climate_npde as cn
from universal_differential_equations_tpu.models import lotka_volterra as lv
from universal_differential_equations_tpu.parallel import ensemble_mesh, shard_ensemble
from universal_differential_equations_tpu.train import fit, multiple_shoot, shooting_windows


# ---------------------------------------------------------------------- C18
def test_shooting_windows_cover_and_overlap():
    idx, mask = shooting_windows(21, 5)
    assert idx.shape == (5, 5)
    # one-point overlap
    assert int(idx[1, 0]) == int(idx[0, -1])
    assert mask.min() == 1.0  # 21 = 5 segments * 4 + 1, no ragged tail


def test_shooting_windows_ragged():
    idx, mask = shooting_windows(20, 5)
    assert mask[-1].min() == 0.0  # last window padded+masked


def test_multiple_shoot_zero_at_truth():
    ts = jnp.linspace(0.0, 3.0, 31)
    sol = ude.solve(
        ude.ODEProblem(lv.lotka_rhs, lv.U0, (0.0, 3.0), lv.P_TRUE),
        ude.Vern7(), saveat=ts, rtol=1e-10, atol=1e-10,
        adjoint=ude.NoAdjoint(), step_to_saveat=True,
    )
    loss = multiple_shoot(
        lv.P_TRUE, sol.ys, ts, lv.lotka_rhs, group_size=5,
        continuity_term=200.0, rtol=1e-8, atol=1e-8,
    )
    assert float(loss) < 1e-8


def test_multiple_shoot_trains():
    # shooting loss decreases under ADAM on a wrong-parameter model
    ts = jnp.linspace(0.0, 3.0, 31)
    sol = ude.solve(
        ude.ODEProblem(lv.lotka_rhs, lv.U0, (0.0, 3.0), lv.P_TRUE),
        ude.Tsit5(), saveat=ts, rtol=1e-8, atol=1e-8, adjoint=ude.NoAdjoint(),
    )
    data = sol.ys

    def loss(p):
        return multiple_shoot(p, data, ts, lv.lotka_rhs, group_size=5,
                              continuity_term=100.0)

    p0 = lv.P_TRUE * 1.4
    l0 = float(loss(p0))
    res = fit(loss, p0, optax.adam(0.05), 300, callback_every=300)
    assert res.final_loss < l0 / 50


# ---------------------------------------------------------------------- C24
def test_ensemble_run_masks_failures():
    # one member diverges (finite-time blowup) → masked, others fine
    def rhs(t, y, k):
        return k * y * y  # blows up for k > 0

    def run(k):
        sol = ude.solve(
            ude.ODEProblem(rhs, jnp.array([1.0]), (0.0, 2.0), k), ude.Tsit5(),
            rtol=1e-6, atol=1e-8, adjoint=ude.NoAdjoint(), max_steps=200,
        )
        return sol.y_final, sol.success

    ks = jnp.array([-1.0, -0.5, 0.0, 5.0])  # last one blows up before t=2
    res = ensemble_run(run, ks)
    ok = np.asarray(res.success)
    assert ok.tolist() == [True, True, True, False]
    assert res.num_success == 3


def test_noise_schedule_matches_reference():
    # run_loops.jl:40-46 — level changes every 100 runs
    assert float(noise_schedule(0)) == 1e-3
    assert float(noise_schedule(99)) == 1e-3
    assert float(noise_schedule(100)) == 5e-3
    assert float(noise_schedule(499)) == 5e-2


def test_ensemble_sharded_multichip():
    # §2.4: the ensemble axis sharded over an 8-device mesh (virtual CPU)
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    mesh = ensemble_mesh(8)

    def run(u0):
        sol = ude.solve(
            ude.ODEProblem(lv.lotka_rhs, u0, (0.0, 1.0), lv.P_TRUE),
            ude.Tsit5(), rtol=1e-6, atol=1e-8, adjoint=ude.NoAdjoint(),
            max_steps=256,
        )
        return sol.y_final, sol.success

    u0s = lv.U0 * (1.0 + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (16, 2)))
    res = ensemble_run(run, u0s, mesh=mesh, sharded=True)
    assert res.num_success == 16
    assert res.outputs.shape == (16, 2)
    # sharding survived: committed to the ensemble mesh axis
    assert len(jax.devices()) == 8


def test_distributed_helpers_single_process():
    # single-process contract (SURVEY §5 distributed backend row): no-op
    # initialization, and the global mesh spans all (virtual) devices with
    # the same axis name the local helpers use
    from universal_differential_equations_tpu.parallel import (
        global_ensemble_mesh,
        initialize_distributed,
        is_distributed,
        local_device_count,
        process_count,
    )

    assert initialize_distributed() is False  # no coordinator info → no-op
    assert is_distributed() is False
    assert process_count() == 1
    assert local_device_count() == 8
    mesh = global_ensemble_mesh()
    assert mesh.axis_names == ("ensemble",)
    assert mesh.devices.size == 8

    # the global mesh drops into the same sharded ensemble path
    def run(u0):
        sol = ude.solve(
            ude.ODEProblem(lv.lotka_rhs, u0, (0.0, 1.0), lv.P_TRUE),
            ude.Tsit5(), rtol=1e-6, atol=1e-8, adjoint=ude.NoAdjoint(),
            max_steps=256,
        )
        return sol.y_final, sol.success

    u0s = lv.U0 * (1.0 + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (8, 2)))
    res = ensemble_run(run, u0s, mesh=mesh, sharded=True)
    assert res.num_success == 8


# ---------------------------------------------------------------------- C25
def test_pytree_save_load_roundtrip(tmp_path):
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3),
            "nested": [jnp.zeros(2), jnp.full((2, 2), 7.0)]}
    save_pytree(tmp_path / "ckpt", tree)
    loaded = load_pytree(tmp_path / "ckpt", like=tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keyed_archive_group_append(tmp_path):
    arch = KeyedArchive(tmp_path / "results")
    for i in range(3):
        arch.save(f"run_{i}", loss=jnp.asarray(float(i)), coeffs=jnp.arange(4.0))
    assert arch.groups() == ["run_0", "run_1", "run_2"]
    assert "run_1" in arch
    got = arch.load("run_2")
    assert float(got["loss"]) == 2.0


def test_best_checkpoint(tmp_path):
    ckpt = BestCheckpoint(tmp_path / "best")
    ckpt(0, 1.0, jnp.array([1.0]))
    ckpt(1, 0.5, jnp.array([2.0]))
    ckpt(2, 0.9, jnp.array([3.0]))  # worse → not saved
    best = load_pytree(tmp_path / "best", like=jnp.array([0.0]))
    assert float(best[0]) == 2.0


# ----------------------------------------------------------------------- C3
def test_rkc2_stiff_diffusion():
    D1, D2, eig = cn.getops(64, dtype=jnp.float64)
    u0 = cn.get_u0(64, dtype=jnp.float64)
    prob = ude.ODEProblem(cn.true_rhs, u0, (0.0, 1.0), (D1, D2))
    ts = jnp.linspace(0.0, 1.0, 5)
    rkc = ude.RKC2.for_problem(eig * 1.1, (0.0, 1.0))
    sol = ude.solve(prob, rkc, saveat=ts, rtol=1e-6, atol=1e-8,
                    adjoint=ude.NoAdjoint(), max_steps=4096)
    ref = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12,
                    adjoint=ude.NoAdjoint(), max_steps=65536)
    assert bool(sol.success) and bool(ref.success)
    assert float(jnp.max(jnp.abs(sol.ys - ref.ys))) < 1e-4


def test_rkc2_order_two():
    from universal_differential_equations_tpu.core.integrate import integrate_fixed

    f = lambda t, y, args: y * jnp.cos(t)
    errs = []
    for n in [20, 40, 80]:
        _, ys = integrate_fixed(f, jnp.array([1.0]), 0.0, 3.0, None,
                                ude.RKC2(stages=5), n)
        errs.append(abs(float(ys[-1, 0]) - np.exp(np.sin(3.0))))
    order = np.log2(errs[-2] / errs[-1])
    assert order > 1.6


def test_rkc1_stiff_diffusion_and_order_one():
    # RKC1 (damped first-order Chebyshev): stable on the stiff diffusion
    # column at dt far beyond explicit-RK limits, and exactly first order
    from universal_differential_equations_tpu.core.integrate import integrate_fixed

    D1, D2, eig = cn.getops(64, dtype=jnp.float64)
    u0 = cn.get_u0(64, dtype=jnp.float64)
    prob = ude.ODEProblem(cn.true_rhs, u0, (0.0, 1.0), (D1, D2))
    ts = jnp.linspace(0.0, 1.0, 5)
    sol = ude.solve(prob, ude.RKC1(stages=16, rho=float(eig) * 1.1), saveat=ts,
                    rtol=1e-5, atol=1e-7, adjoint=ude.NoAdjoint(),
                    max_steps=4096)
    ref = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12,
                    adjoint=ude.NoAdjoint(), max_steps=65536)
    assert bool(sol.success) and bool(ref.success)
    assert float(jnp.max(jnp.abs(sol.ys - ref.ys))) < 1e-3

    f = lambda t, y, args: y * jnp.cos(t)
    errs = []
    for n in [20, 40, 80]:
        _, ys = integrate_fixed(f, jnp.array([1.0]), 0.0, 3.0, None,
                                ude.RKC1(stages=5), n)
        errs.append(abs(float(ys[-1, 0]) - np.exp(np.sin(3.0))))
    order = np.log2(errs[-2] / errs[-1])
    assert 0.7 < order < 1.5  # genuinely first order, not accidentally higher


def test_rock2_derivation_and_stiff_diffusion():
    # the genuine ROCK construction (Abdulle & Medovikov 2001), derived at
    # construction time: interval l_s ≈ 0.80·s² (vs RKC2's 0.653·s²), order
    # conditions at machine precision, damped |R| ≤ 0.95 on the interval.
    from universal_differential_equations_tpu.solvers.rock import _derive_rock2

    for s in (6, 16):
        *_, c, sigma, tau, l = _derive_rock2(s)
        assert 0.74 * s * s < l < 0.85 * s * s
        assert abs(c[s - 2] - (1.0 - 2.0 * sigma)) < 1e-12  # theory identity
        # one linear step evaluates R(z): bounded by the damping on [-l, 0]
        solver = ude.ROCK2(stages=s)
        for zf in (0.999, 0.6, 0.25):
            z = -l * zf
            y1, *_ = solver.step(
                lambda t, y, a: a * y, jnp.asarray(0.0), jnp.asarray([1.0]),
                jnp.asarray([z]), jnp.asarray(1.0), jnp.asarray(z))
            assert abs(float(y1[0])) <= 0.951

    D1, D2, eig = cn.getops(64, dtype=jnp.float64)
    u0 = cn.get_u0(64, dtype=jnp.float64)
    prob = ude.ODEProblem(cn.true_rhs, u0, (0.0, 1.0), (D1, D2))
    ts = jnp.linspace(0.0, 1.0, 5)
    rock = ude.ROCK2.for_problem(eig * 1.1, (0.0, 1.0))
    sol = ude.solve(prob, rock, saveat=ts, rtol=1e-6, atol=1e-8,
                    adjoint=ude.NoAdjoint(), max_steps=4096)
    ref = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12,
                    adjoint=ude.NoAdjoint(), max_steps=65536)
    assert bool(sol.success) and bool(ref.success)
    assert float(jnp.max(jnp.abs(sol.ys - ref.ys))) < 1e-4


def test_rock4_order_four_and_derivation():
    # the composite (internal recurrence + derived 4-stage finishing) must be
    # a genuine 4th-order method with the published ROCK4 stability interval
    from universal_differential_equations_tpu.core.integrate import integrate_fixed
    from universal_differential_equations_tpu.solvers.rock import _derive_rock4

    for s in (9, 20):
        *_, l = _derive_rock4(s)
        assert 0.28 * s * s < l < 0.37 * s * s  # ROCK4 theory: -> 0.35 s^2
    f = lambda t, y, args: y * jnp.cos(t)
    errs = []
    for n in [10, 20, 40]:
        _, ys = integrate_fixed(f, jnp.array([1.0]), 0.0, 3.0, None,
                                ude.ROCK4(stages=9), n)
        errs.append(abs(float(ys[-1, 0]) - np.exp(np.sin(3.0))))
    assert np.log2(errs[-2] / errs[-1]) > 3.5  # fourth order


def test_rock4_tolerance_proportional_and_beats_rock2():
    # stiff heat equation: error must track rtol (live embedded estimate) and
    # the 4th-order method must use far fewer RHS evals at tight tolerance
    n = 64
    dx = 1.0 / n
    x = jnp.arange(n) * dx
    u0 = jnp.sin(2 * jnp.pi * x) + 0.5 * jnp.sin(6 * jnp.pi * x)
    heat = lambda t, u, a: (jnp.roll(u, 1) - 2 * u + jnp.roll(u, -1)) / dx**2
    rho = 4.0 / dx**2
    prob = ude.ODEProblem(heat, u0, (0.0, 0.1))
    lam1 = (2 - 2 * np.cos(2 * np.pi / n)) / dx**2
    lam3 = (2 - 2 * np.cos(6 * np.pi / n)) / dx**2
    exact = (jnp.exp(-lam1 * 0.1) * jnp.sin(2 * jnp.pi * x)
             + 0.5 * jnp.exp(-lam3 * 0.1) * jnp.sin(6 * jnp.pi * x))
    errs, nfes = [], []
    for rt in (1e-6, 1e-8):
        sv = ude.ROCK4.for_problem(rho, (0.0, 0.1), 20)
        s = ude.solve(prob, sv, rtol=rt, atol=rt * 1e-2,
                      adjoint=ude.NoAdjoint(), max_steps=8192)
        assert bool(s.success)
        errs.append(float(jnp.abs(s.y_final - exact).max()))
        nfes.append(int(s.num_rhs_evals))
    assert errs[1] < errs[0] * 1e-1  # error follows the tolerance
    s2 = ude.solve(prob, ude.ROCK2.for_problem(rho, (0.0, 0.1), 20),
                   rtol=1e-8, atol=1e-10, adjoint=ude.NoAdjoint(), max_steps=8192)
    assert nfes[1] * 3 < int(s2.num_rhs_evals)  # 4th order pays at tight tol


def test_rock2_order_two():
    from universal_differential_equations_tpu.core.integrate import integrate_fixed

    f = lambda t, y, args: y * jnp.cos(t)
    errs = []
    for n in [20, 40, 80]:
        _, ys = integrate_fixed(f, jnp.array([1.0]), 0.0, 3.0, None,
                                ude.ROCK2(stages=6), n)
        errs.append(abs(float(ys[-1, 0]) - np.exp(np.sin(3.0))))
    assert np.log2(errs[-2] / errs[-1]) > 1.6


def test_eigen_est_power_iteration():
    D1, D2, eig = cn.getops(48, dtype=jnp.float64)
    est = float(cn.eigen_est(D2))
    assert abs(est - eig) / eig < 0.1


def test_rock_f32_state_keeps_dtype_under_x64():
    # ROCK coefficients must be weak Python floats: np.float64 scalars would
    # promote an f32 loop carry under x64 and break the while_loop carry
    # (or silently upcast the whole solve — f64 crashes the TPU worker).
    from universal_differential_equations_tpu.solvers.rock import ROCK2, ROCK4

    y0 = jnp.array([1.0], jnp.float32)
    for solver in (ROCK2(stages=9, rho=4.0), ROCK4(stages=9, rho=4.0)):
        sol = ude.solve(
            ude.ODEProblem(lambda t, y, a: -2.0 * y, y0, (0.0, 1.0), None),
            solver, rtol=1e-5, atol=1e-7, adjoint=ude.NoAdjoint(),
        )
        assert sol.y_final.dtype == jnp.float32, solver.name
        assert abs(float(sol.y_final[0]) - np.exp(-2.0)) < 1e-3
