"""End-to-end Lotka-Volterra scenario-1 parity tests (SURVEY.md §7 M1).

The north-star pipeline: truth generation → noise → UDE training → SINDy
recovery → extrapolation (``scenario_1.jl`` end-to-end).  The full run lives
in examples/ and the benchmark; here the pipeline is tested in stages plus an
abbreviated end-to-end check of the recovery machinery on the ideal path
(the reference's ideal_problem triad, ``scenario_1.jl:166-170``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu import sindy as sd
from universal_differential_equations_tpu.models import lotka_volterra as lv
from universal_differential_equations_tpu.train import bfgs_minimize, fit

LAMS = tuple(10.0 ** e for e in np.arange(-3.0, 5.0, 0.1))


@pytest.fixture(scope="module")
def data():
    return lv.generate_data(jax.random.PRNGKey(1234))


def test_truth_generation_matches_reference_flow(data):
    ts, X, Xn = data
    assert X.shape == (31, 2)
    # periodic predator-prey oscillation with positive states
    assert float(X.min()) > 0
    # noise level is mean-proportional 5e-3 (scenario_1.jl:51-53)
    assert float(jnp.abs(Xn - X).max()) < 0.1


def test_ideal_recovery_triad(data):
    # reference triad: recovery from ideal missing-term data must find the
    # exact 2-term structure (scenario_1.jl:166-172; check_eqs of
    # loop_evaluation.jl:30-35)
    ts, X, Xn = data
    Ybar = jnp.stack(
        [-0.9 * X[:, 0] * X[:, 1], 0.8 * X[:, 0] * X[:, 1]], axis=1
    )
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    res = sd.sindy(sd.DirectDataDrivenProblem(X, Ybar), basis, sd.STLSQ(LAMS),
                   normalize=True)
    names = basis.names
    for eq in range(2):
        got = {names[j] for j in np.nonzero(res.active[:, eq])[0]}
        assert got == {"u1*u2"}, f"eq{eq}: {got}"
    np.testing.assert_allclose(
        res.parameters(), [-0.9, 0.8], rtol=1e-5
    )


def test_ude_short_training_reduces_loss(data):
    # abbreviated training: loss must drop by >100x in 60 adam steps
    ts, X, Xn = data
    rhs, params0, net = lv.make_ude(jax.random.PRNGKey(7))
    t0f, t1f = float(ts[0]), float(ts[-1])
    prob0 = ude.ODEProblem(rhs, Xn[0], (t0f, t1f), params0)

    def loss(p):
        sol = ude.solve(ude.remake(prob0, args=p), ude.Tsit5(), saveat=ts,
                        rtol=1e-6, atol=1e-6)
        return jnp.mean((sol.ys - Xn) ** 2)

    l0 = float(loss(params0))
    res = fit(loss, params0, optax.adam(0.1), 60, callback_every=60)
    assert res.final_loss < l0 / 100


def test_recovered_model_roundtrip_and_extrapolation(data):
    # recovered equations → executable ODE → refit → extrapolate (C21)
    ts, X, Xn = data
    Ybar = jnp.stack(
        [-0.9 * X[:, 0] * X[:, 1], 0.8 * X[:, 0] * X[:, 1]], axis=1
    )
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    res = sd.sindy(sd.DirectDataDrivenProblem(X, Ybar), basis, sd.STLSQ(LAMS),
                   normalize=True)
    rec_rhs = lv.make_recovered_rhs(res)
    p0 = jnp.asarray(res.parameters())
    t0f, t1f = float(ts[0]), float(ts[-1])

    def loss_rec(p):
        prob = ude.ODEProblem(rec_rhs, Xn[0], (t0f, t1f), p)
        sol = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-8, atol=1e-8)
        return jnp.mean((sol.ys - Xn) ** 2)

    r = bfgs_minimize(loss_rec, p0, maxiters=100)
    np.testing.assert_allclose(np.asarray(r.params), [-0.9, 0.8], atol=0.02)

    # extrapolation beyond the training window (scenario_1.jl:200-207)
    ts_long = jnp.linspace(0.0, 20.0, 201)
    est = ude.solve(
        ude.ODEProblem(rec_rhs, X[0], (0.0, 20.0), r.params), ude.Tsit5(),
        saveat=ts_long, rtol=1e-8, atol=1e-8, adjoint=ude.NoAdjoint(),
    )
    truth = ude.solve(
        ude.ODEProblem(lv.lotka_rhs, X[0], (0.0, 20.0), lv.P_TRUE), ude.Tsit5(),
        saveat=ts_long, rtol=1e-10, atol=1e-10, adjoint=ude.NoAdjoint(),
    )
    rel = float(jnp.max(jnp.abs(est.ys - truth.ys)) / jnp.max(jnp.abs(truth.ys)))
    assert bool(est.success) and rel < 0.1


def test_lane_solver_contract_fixed_tsit5_matches_vern7():
    """The 500-run study's training-solver contract (VERDICT r3 #2).

    ``run_loops.py`` trains every lane with fixed-step Tsit5 at SUB=4
    substeps per save interval where the reference uses adaptive Vern7 at
    abstol=reltol=1e-6 (loop_recoveries.jl:31-47).  This pins the claim that
    the fixed grid resolves the dynamics below the lane's own noise floor:
    on the save grid, the f32 fixed-step solution must agree with an f64
    Vern7 1e-6 solve (a) to ≤1e-5 on the true LV field, and (b) on every
    archived trained-lane excursion, to ≤25% of THAT lane's per-point noise
    perturbation scale mag·mean|x̄| — the solver error a lane's training
    loss can even see is then ≤~6% in quadrature.  Measured distribution
    over 25 archived lanes (r4): most ≤2e-4; the worst high-noise nets
    (rough learned fields) reach 2.9e-3 at 2.5e-2 (4.6% of their noise
    scale) and 1.7e-2 at 5e-2 (13.6%).  Excursions come from the study
    itself (``run_loops.py --theta-samples`` →
    ``results/lane_theta_samples.npz``).
    """
    from pathlib import Path

    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )

    SUB = 4
    ts32 = jnp.arange(0.0, 3.01, 0.1, dtype=jnp.float32)
    n_step = (len(ts32) - 1) * SUB
    x_scale = float(jnp.mean(jnp.abs(lv.U0)))

    def contract(rhs, u0_32, args_32, bound, label):
        # the study's lane solver: f32 fixed-step Tsit5, SUB substeps/save
        _, ys_fix = integrate_fixed(rhs, u0_32, jnp.float32(0.0),
                                    jnp.float32(3.0), args_32, ude.Tsit5(),
                                    n_step)
        ys_fix = np.asarray(ys_fix[::SUB], np.float64)
        # the reference's training solver: adaptive Vern7 at 1e-6, f64
        u0_64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), u0_32)
        args_64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), args_32)
        sol = ude.solve(ude.ODEProblem(rhs, u0_64, (0.0, 3.0), args_64),
                        ude.Vern7(), saveat=jnp.asarray(ts32, jnp.float64),
                        rtol=1e-6, atol=1e-6, adjoint=ude.NoAdjoint())
        assert bool(sol.success), label
        dev = float(np.abs(ys_fix - np.asarray(sol.ys)).max())
        assert dev < bound, (
            f"{label}: fixed-step deviation {dev:.2e} over bound {bound:.2e}")

    contract(lv.lotka_rhs, lv.U0.astype(jnp.float32),
             jnp.asarray(lv.P_TRUE, jnp.float32), 1e-5, "true LV field")

    npz = (Path(__file__).resolve().parents[1] / "examples" / "lotka_volterra"
           / "results" / "lane_theta_samples.npz")
    assert npz.exists(), (
        "trained-lane excursion draws missing: run "
        "`python examples/lotka_volterra/run_loops.py --theta-samples` and "
        "commit results/lane_theta_samples.npz")
    z = np.load(npz)
    rhs, params0, _ = lv.make_ude(jax.random.PRNGKey(7))
    p0_32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params0)
    unravel = jax.flatten_util.ravel_pytree(p0_32)[1]
    for i in range(z["theta"].shape[0]):
        theta = unravel(jnp.asarray(z["theta"][i], jnp.float32))
        u0 = jnp.asarray(z["u0"][i], jnp.float32)
        mag = float(z["mag"][i])
        contract(rhs, u0, theta, 0.25 * mag * x_scale,
                 f"trained lane {int(z['lane'][i])} (mag {mag:g})")


def test_combo_playoff_picks_true_structure_from_either_arm():
    """`run_loops.combo_stage` semantics: the cross-arm playoff feeds the
    trained-NN arm's and the weak-form arm's selected models through ONE
    simulation-refit judge; whichever arm carries the true {x·y} structure
    must win the lane regardless of which side it enters on (and the
    corrupted arm's model — here a plausible wrong support, refit to its
    best — must lose by refit loss, not by any gate)."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                            / "examples" / "lotka_volterra"))
    import run_loops as rl

    st = rl.build_stages()
    m = len(rl.BASIS)
    i_xy = rl.I_XY
    i_x = rl.BASIS.names.index("u1")
    i_y2 = rl.BASIS.names.index("u2^2")
    true1 = jnp.zeros((m,)).at[i_xy].set(-0.9)
    true2 = jnp.zeros((m,)).at[i_xy].set(0.8)
    wrong1 = jnp.zeros((m,)).at[i_x].set(-0.5)
    wrong2 = jnp.zeros((m,)).at[i_y2].set(0.1)

    n = 4
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    mags = jnp.full((n,), 1e-2, jnp.float32)
    tile = lambda c: jnp.tile(c[None, :], (n, 1))

    # true structure on the "trained" side
    ex_a, co_a, _, _ = st.combo_stage(keys, mags, tile(true1), tile(true2),
                                      tile(wrong1), tile(wrong2))
    # true structure on the "weak" side
    ex_b, co_b, _, _ = st.combo_stage(keys, mags, tile(wrong1), tile(wrong2),
                                      tile(true1), tile(true2))
    assert int(jnp.sum(ex_a)) >= 3, np.asarray(ex_a)
    assert int(jnp.sum(ex_b)) >= 3, np.asarray(ex_b)
    assert bool(jnp.all(co_a == ex_a)) and bool(jnp.all(co_b == ex_b))

    # judge-oracle attribution semantics (run_loops.attribution): the same
    # playoff with the TRUE structure injected as a third candidate — when
    # both arms are wrong, the judge must still find the truth, so a lane
    # that fails the attribution arm marks the JUDGE (not estimator
    # diversity) as the limiter
    wrong1b = jnp.zeros((m,)).at[rl.BASIS.names.index("u2")].set(0.3)
    wrong2b = jnp.zeros((m,)).at[rl.BASIS.names.index("u1^2")].set(-0.2)
    cands1 = jnp.stack([wrong1, wrong1b, true1])
    cands2 = jnp.stack([wrong2, wrong2b, true2])
    ex_o, co_o, _, _ = st.playoff_stage(
        keys, mags, jnp.tile(cands1[None], (n, 1, 1)),
        jnp.tile(cands2[None], (n, 1, 1)))
    assert int(jnp.sum(ex_o)) >= 3, np.asarray(ex_o)
