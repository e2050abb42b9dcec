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
