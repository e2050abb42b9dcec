"""Training-layer tests: BFGS, fit driver, callbacks, schedules (C16/C17)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from universal_differential_equations_tpu.train import (
    bfgs_minimize,
    fit,
    levenberg_marquardt,
    reduce_on_plateau,
)


def test_bfgs_rosenbrock():
    def rosen(p):
        x, y = p["x"], p["y"]
        return (1 - x) ** 2 + 100 * (y - x * x) ** 2

    r = bfgs_minimize(rosen, {"x": jnp.array(-1.2), "y": jnp.array(1.0)},
                      maxiters=300)
    assert bool(r.converged)
    assert abs(float(r.params["x"]) - 1) < 1e-6
    assert float(r.value) < 1e-12


def test_bfgs_quadratic_exact():
    A = jnp.array([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.array([1.0, -1.0])
    f = lambda x: 0.5 * x @ A @ x - b @ x
    r = bfgs_minimize(f, jnp.zeros(2), maxiters=50)
    np.testing.assert_allclose(np.asarray(r.params),
                               np.linalg.solve(np.asarray(A), np.asarray(b)),
                               rtol=1e-6)


def test_bfgs_initial_stepnorm_and_history():
    f = lambda x: jnp.sum((x - 2.0) ** 2)
    r = bfgs_minimize(f, jnp.zeros(3), maxiters=50, initial_stepnorm=0.01)
    assert bool(r.converged)
    hist = np.asarray(r.loss_history)
    valid = hist[np.isfinite(hist)]
    assert len(valid) >= 1 and valid[-1] < 1e-10


def test_bfgs_jittable():
    f = lambda x: jnp.sum(jnp.cos(x) + 0.1 * x * x)
    r = jax.jit(lambda x0: bfgs_minimize(f, x0, maxiters=100).params)(jnp.ones(4))
    assert np.all(np.isfinite(np.asarray(r)))


def test_fit_adam_converges():
    res = fit(lambda p: jnp.sum((p - 3.0) ** 2), jnp.zeros(4),
              optax.adam(0.1), 300, callback_every=100)
    assert res.final_loss < 1e-8
    assert res.num_steps == 300
    assert res.losses.shape == (300,)


def test_fit_callback_early_stop():
    calls = []

    def cb(step, loss, params):
        calls.append((step, loss))
        return loss < 1e-3  # stop

    res = fit(lambda p: jnp.sum(p ** 2), jnp.ones(2), optax.adam(0.2), 1000,
              callback=cb, callback_every=25)
    assert res.stopped_early
    assert res.num_steps < 1000
    assert len(calls) >= 1


def test_fit_early_stop_loss_threshold():
    # Fisher-KPP-CNN-Fourier.jl:225 early exit pattern
    res = fit(lambda p: jnp.sum(p ** 2), jnp.ones(2), optax.adam(0.2), 1000,
              callback_every=25, early_stop_loss=1e-4)
    assert res.stopped_early


def test_fit_ragged_tail():
    res = fit(lambda p: jnp.sum(p ** 2), jnp.ones(2), optax.adam(0.1), 130,
              callback_every=50)
    assert res.num_steps == 130 and res.losses.shape == (130,)


def test_reduce_on_plateau():
    sched = reduce_on_plateau(0.1, factor=0.1, patience=1)
    assert sched(1.0) == 0.1
    assert sched(0.5) == 0.1  # improving
    assert sched(0.6) == 0.1  # stale 1
    assert abs(sched(0.6) - 0.01) < 1e-12  # stale 2 > patience → decay


def test_lm_converged_flag_semantics():
    # converged must mean "terminated via a tolerance", not "any finite loss"
    import jax.numpy as jnp

    # trivially solvable: converges via loss_tol
    res = levenberg_marquardt(lambda p: p - 3.0, jnp.zeros(2), maxiters=50,
                              loss_tol=1e-10)
    assert bool(res.converged) and float(res.loss) < 1e-10
    # exhausting the iteration budget far from any tolerance is NOT
    # convergence (the old flag was tautologically True for any finite loss)
    def rosen_r(p):
        return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

    res2 = levenberg_marquardt(rosen_r, jnp.array([-1.5, 2.0]), maxiters=1,
                               gtol=1e-12)
    assert not bool(res2.converged)


def test_bfgs_failed_line_search_not_converged_by_ftol():
    import jax.numpy as jnp

    # a well-behaved quadratic must still converge with ftol set
    res = bfgs_minimize(lambda p: jnp.sum((p - 2.0) ** 2), jnp.zeros(3),
                        maxiters=100, ftol=1e-12)
    assert float(res.value) < 1e-8


def test_fit_opt_state_continuation():
    # fit(..., opt_state=...) continues the SAME optimizer (ADAM moments
    # preserved): two chained 50-step fits must land where one 100-step fit
    # does, and differ from two fresh-initialized 50-step fits.
    def loss(p):
        return jnp.sum((p - 3.0) ** 2) + 0.1 * jnp.sum(p**2)

    p0 = jnp.zeros(4)
    opt = optax.adam(0.05)

    r_one = fit(loss, p0, opt, 100)
    r_a = fit(loss, p0, opt, 50)
    r_b = fit(loss, r_a.params, opt, 50, opt_state=r_a.opt_state)
    np.testing.assert_allclose(np.asarray(r_b.params), np.asarray(r_one.params),
                               rtol=1e-6, atol=1e-7)
    r_fresh = fit(loss, r_a.params, opt, 50)  # moments reset
    assert not np.allclose(np.asarray(r_fresh.params), np.asarray(r_one.params),
                           rtol=1e-6, atol=1e-7)
