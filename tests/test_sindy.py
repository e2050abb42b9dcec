"""SINDy layer tests: bases, optimizers, selection, collocation (C19-C21)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from universal_differential_equations_tpu import sindy as sd


def _lv_like_data(key, N=200):
    X = jax.random.uniform(key, (N, 2), minval=0.2, maxval=3.0)
    Y = jnp.stack(
        [1.5 * X[:, 0] - 0.7 * X[:, 0] * X[:, 1],
         -2.0 * X[:, 1] + 0.4 * X[:, 0] * X[:, 1]],
        axis=1,
    )
    return X, Y


LAMS = tuple(10.0 ** e for e in np.arange(-3.0, 2.0, 0.1))


def test_basis_sizes_and_names():
    b = sd.polynomial_basis(2, 5)
    assert len(b) == 21  # C(5+2,2)
    assert "u1*u2" in b.names and "1" in b.names
    m = sd.monomial_basis(1, 10)
    assert len(m) == 10
    t = sd.tensor_polynomial_basis(3, 2)
    assert len(t) == 27


def test_basis_eval_matches_numpy():
    b = sd.polynomial_basis(2, 3) + sd.sin_basis(2) + sd.cos_basis(2)
    X = jnp.array([[0.5, -2.0], [1.5, 0.3]])
    theta = np.asarray(b.theta(X))
    i = b.names.index("u1*u2^2")
    np.testing.assert_allclose(theta[:, i], np.asarray(X[:, 0] * X[:, 1] ** 2),
                               rtol=1e-12)
    j = b.names.index("sin(u2)")
    np.testing.assert_allclose(theta[:, j], np.sin(np.asarray(X[:, 1])), rtol=1e-12)


@pytest.mark.parametrize("opt", [sd.STLSQ(LAMS), sd.SR3(LAMS), sd.STRRidge(LAMS)])
def test_exact_recovery_clean_data(opt):
    X, Y = _lv_like_data(jax.random.PRNGKey(0))
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    res = sd.sindy(sd.DirectDataDrivenProblem(X, Y), basis, opt, normalize=True)
    names = basis.names
    for eq, expected in enumerate([{"u1", "u1*u2"}, {"u2", "u1*u2"}]):
        got = {names[j] for j in np.nonzero(res.active[:, eq])[0]}
        assert got == expected, f"{type(opt).__name__} eq{eq}: {got}"


def test_recovery_with_noise_and_cv():
    kx, kn = jax.random.split(jax.random.PRNGKey(3))
    X, Y = _lv_like_data(kx)
    Y = Y + 1e-3 * jax.random.normal(kn, Y.shape)
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    res = sd.sindy(
        sd.DirectDataDrivenProblem(X, Y), basis, sd.STLSQ(LAMS),
        normalize=True, sampler=sd.DataSampler(4),
    )
    names = basis.names
    got = {names[j] for j in np.nonzero(res.active[:, 0])[0]}
    assert got == {"u1", "u1*u2"}
    # coefficients close despite noise
    c = res.coefficients[names.index("u1*u2"), 0]
    assert abs(c + 0.7) < 0.05


def test_result_api_roundtrip():
    X, Y = _lv_like_data(jax.random.PRNGKey(0))
    basis = sd.polynomial_basis(2, 5)
    res = sd.sindy(sd.DirectDataDrivenProblem(X, Y), basis, sd.STLSQ(LAMS),
                   normalize=True)
    # printable equations, parameters, parameter_map (scenario_1.jl:176-190)
    eqs = res.equations()
    assert len(eqs) == 2 and "u1*u2" in eqs[0]
    p = res.parameters()
    assert p.shape == (4,)
    pm = res.parameter_map()
    assert len(pm) == 4 and all(isinstance(k, str) for k, _ in pm)
    # callable recovered model == truth on new points
    f = res.rhs()
    u = jnp.array([1.1, 0.7])
    du = f(0.0, u, jnp.asarray(p))
    expect = np.array([1.5 * 1.1 - 0.7 * 1.1 * 0.7, -2.0 * 0.7 + 0.4 * 1.1 * 0.7])
    np.testing.assert_allclose(np.asarray(du), expect, rtol=1e-4)
    # metrics API (loop_evaluation.jl:54-56)
    assert res.sparsity.shape == (2,) and res.aicc.shape == (2,)


def test_collocation_derivative_estimation():
    key = jax.random.PRNGKey(1)
    t = jnp.linspace(0.0, 5.0, 120)
    X = jnp.stack([jnp.sin(t), jnp.cos(t)], axis=1)
    Xn = X + 2e-3 * jax.random.normal(key, X.shape)
    Xs, DX = sd.collocate_data(Xn, t)
    interior = slice(10, -10)
    assert float(jnp.abs(DX[interior, 0] - jnp.cos(t)[interior]).max()) < 0.05
    assert float(jnp.abs(Xs[interior, 0] - jnp.sin(t)[interior]).max()) < 0.02


def test_continuous_problem_collocation_pipeline():
    # hudson_bay.jl:48 — direct SINDy from noisy trajectory via collocation
    key = jax.random.PRNGKey(2)
    t = jnp.linspace(0.0, 6.0, 300)
    # du = [-0.5 u1, 0.8 u1] linear system
    X = jnp.stack([2.0 * jnp.exp(-0.5 * t),
                   0.8 * 2.0 / 0.5 * (1 - jnp.exp(-0.5 * t))], axis=1)
    Xn = X + 1e-4 * jax.random.normal(key, X.shape)
    prob = sd.ContinuousDataDrivenProblem(Xn, t)
    basis = sd.polynomial_basis(2, 2)
    # collocation targets carry smoothing bias → CV selection for parsimony
    res = sd.sindy(prob, basis, sd.STLSQ(LAMS), normalize=True,
                   sampler=sd.DataSampler(4))
    names = basis.names
    got0 = {names[j] for j in np.nonzero(res.active[:, 0])[0]}
    assert "u1" in got0 and len(got0) <= 2
    assert abs(res.coefficients[names.index("u1"), 0] + 0.5) < 0.05


def test_denoise_svht():
    # SVHT denoising projects Θ onto its dominant singular subspace — meant
    # for heavily noisy, redundant libraries (scenario_1.jl denoise option).
    # Assert the option runs end-to-end and produces a finite, usable model.
    kx, kn = jax.random.split(jax.random.PRNGKey(4))
    X, Y = _lv_like_data(kx, N=300)
    X = X + 0.05 * jax.random.normal(kn, X.shape)
    basis = sd.polynomial_basis(2, 3)
    res = sd.sindy(sd.DirectDataDrivenProblem(X, Y), basis, sd.STLSQ(LAMS),
                   normalize=True, denoise=True, sampler=sd.DataSampler(4))
    assert np.isfinite(res.coefficients).all()
    assert (res.sparsity >= 1).all()
    pred = res(jnp.array([1.0, 1.0]))
    assert np.isfinite(np.asarray(pred)).all()


def test_custom_selection_objective():
    # scenario_2.jl:199-style custom g
    X, Y = _lv_like_data(jax.random.PRNGKey(0))
    basis = sd.polynomial_basis(2, 5)

    def g(k, rss, N):
        return jnp.where(k < 1, jnp.inf, 2.0 * k + N * jnp.log(rss / N))

    res = sd.sindy(sd.DirectDataDrivenProblem(X, Y), basis, sd.STLSQ(LAMS),
                   normalize=True, selection=g)
    assert (res.sparsity >= 1).all()


def test_custom_selection_honored_with_sampler():
    # scenario_2.jl pairs the custom objective WITH the Batcher sampler: the
    # objective must score the CV errors, not be shadowed by the default
    # parsimony cutoff.  g forbids k ≤ 1, so even though a single feature
    # explains y perfectly, the selected support must have 2 terms.
    key = jax.random.PRNGKey(3)
    X = jax.random.uniform(key, (64, 2), minval=0.5, maxval=2.0)
    Y = (3.0 * X[:, :1])  # exactly one active feature (u1)
    basis = sd.polynomial_basis(2, 2)

    def g(k, rss, N):
        return jnp.where(k <= 1, jnp.inf, 2.0 * k - 2.0 * jnp.log(rss + 1e-30))

    res = sd.sindy(sd.DirectDataDrivenProblem(X, Y), basis, sd.STLSQ(LAMS),
                   normalize=True, sampler=sd.DataSampler(4), exhaustive_k=2,
                   selection=g)
    assert int(res.sparsity[0]) >= 2  # k=1 forbidden by the objective
    # without the custom objective the CV parsimony rule picks the 1-term truth
    res_cv = sd.sindy(sd.DirectDataDrivenProblem(X, Y), basis, sd.STLSQ(LAMS),
                      normalize=True, sampler=sd.DataSampler(4),
                      exhaustive_k=2)
    assert int(res_cv.sparsity[0]) == 1


def test_best_per_support_ladder():
    xi = jnp.array([
        [1.0, 0.0, 0.0],   # k=1, score 3
        [0.0, 2.0, 0.0],   # k=1, score 1  <- best k=1
        [1.0, 1.0, 0.0],   # k=2, score 2  <- best k=2
        [1.0, 1.0, 1.0],   # k=3, score inf (invalid)
    ])
    active = xi != 0.0
    score = jnp.array([3.0, 1.0, 2.0, jnp.inf])
    xi_k, ok_k = sd.best_per_support(xi, active, score, 3)
    np.testing.assert_allclose(np.asarray(xi_k[0]), [0.0, 2.0, 0.0])
    np.testing.assert_allclose(np.asarray(xi_k[1]), [1.0, 1.0, 0.0])
    assert bool(ok_k[0]) and bool(ok_k[1]) and not bool(ok_k[2])
    np.testing.assert_allclose(np.asarray(xi_k[2]), 0.0)


def test_select_by_simulation_prefers_sparse_truth():
    """The simulation judge (scenario_1.jl:193-207 automated): a denser
    candidate that also re-simulates the window must lose to the sparse
    truth; a sparse candidate that cannot re-simulate must lose to a
    denser one that can."""
    import universal_differential_equations_tpu as ude
    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )

    basis = sd.polynomial_basis(2, 2)
    m = len(basis)
    i_x, i_y = basis.names.index("u1"), basis.names.index("u2")
    i_xy = basis.names.index("u1*u2")

    def dense_rhs(t, u, C):
        return basis.theta(u[None, :])[0] @ C

    # truth: du1 = 1.3 u1 - 0.9 u1 u2 ; du2 = -1.8 u2 + 0.8 u1 u2
    C_true = jnp.zeros((m, 2)).at[i_x, 0].set(1.3).at[i_xy, 0].set(-0.9) \
        .at[i_y, 1].set(-1.8).at[i_xy, 1].set(0.8)
    u0 = jnp.array([0.44249296, 4.6280594])
    n_save, sub = 31, 4
    n_steps = (n_save - 1) * sub
    _, ys = integrate_fixed(dense_rhs, u0, 0.0, 3.0, C_true,
                            ude.Tsit5(), n_steps)
    data = ys[::sub]

    def col(pairs):
        c = jnp.zeros((m,))
        for i, v in pairs:
            c = c.at[i].set(v)
        return c

    # per-target ladders: rung k=2 is the truth; rung k=3 adds a small
    # spurious term (still simulates fine); rung k=1 is badly wrong
    lad1 = (jnp.stack([col([(i_x, 5.0)]),                      # k=1 wrong
                       col([(i_x, 1.3), (i_xy, -0.9)]),        # k=2 truth
                       col([(i_x, 1.3), (i_xy, -0.9),
                            (i_y, 1e-4)])]),                   # k=3 denser
            jnp.array([True, True, True]))
    lad2 = (jnp.stack([col([(i_y, -5.0)]),
                       col([(i_y, -1.8), (i_xy, 0.8)]),
                       col([(i_y, -1.8), (i_xy, 0.8),
                            (i_x, 1e-4)])]),
            jnp.array([True, True, True]))
    C_sel, rel, k_tot = sd.select_by_simulation(
        [lad1, lad2], dense_rhs, u0, 0.0, 3.0, data, ude.Tsit5(),
        n_steps, sub=sub, rel_factor=1.5, rel_floor=0.02)
    assert int(k_tot) == 4  # 2 + 2: sparse truth beats the denser rung
    np.testing.assert_allclose(np.asarray(C_sel), np.asarray(C_true),
                               atol=1e-7)
    assert float(rel) < 1e-3

    # knock the truth rung out of ladder 1: the k=1 wrong candidate cannot
    # re-simulate, so selection must fall through to the denser k=3 rung
    lad1_no_truth = (lad1[0], jnp.array([True, False, True]))
    C_sel2, rel2, k_tot2 = sd.select_by_simulation(
        [lad1_no_truth, lad2], dense_rhs, u0, 0.0, 3.0, data, ude.Tsit5(),
        n_steps, sub=sub, rel_factor=1.5, rel_floor=0.02)
    assert bool(C_sel2[i_y, 0] != 0.0)  # the k=3 rung was chosen for eq 1
    assert float(rel2) < 0.02


@pytest.mark.parametrize("method,iters", [("bfgs", 80), ("lm", 15)])
def test_select_by_simulation_refit_judge(method, iters):
    """Refit mode: biased regression coefficients on the true support must
    be re-optimized to the data and still win on parsimony; the selected
    coefficients land near the truth.  The LM judge reaches the same
    selection in ~5x fewer (and parallel-Jacobian) iterations."""
    import universal_differential_equations_tpu as ude
    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )

    basis = sd.polynomial_basis(2, 2)
    m = len(basis)
    i_x, i_y = basis.names.index("u1"), basis.names.index("u2")
    i_xy = basis.names.index("u1*u2")

    def dense_rhs(t, u, C):
        return basis.theta(u[None, :])[0] @ C

    C_true = jnp.zeros((m, 2)).at[i_x, 0].set(1.3).at[i_xy, 0].set(-0.9) \
        .at[i_y, 1].set(-1.8).at[i_xy, 1].set(0.8)
    u0 = jnp.array([0.44249296, 4.6280594])
    n_save, sub = 31, 4
    n_steps = (n_save - 1) * sub
    _, ys = integrate_fixed(dense_rhs, u0, 0.0, 3.0, C_true,
                            ude.Tsit5(), n_steps)
    data = ys[::sub]

    def col(pairs):
        c = jnp.zeros((m,))
        for i, v in pairs:
            c = c.at[i].set(v)
        return c

    # true supports carry a few-percent coefficient bias (the structured
    # NN-error regime where raw simulation judging fails); denser rungs
    # fit the window slightly better pre-refit
    lad1 = (jnp.stack([col([(i_x, 1.25), (i_xy, -0.93)]),
                       col([(i_x, 1.3), (i_xy, -0.9), (i_y, 1e-3)])]),
            jnp.array([True, True]))
    lad2 = (jnp.stack([col([(i_y, -1.85), (i_xy, 0.83)]),
                       col([(i_y, -1.8), (i_xy, 0.8), (i_x, 1e-3)])]),
            jnp.array([True, True]))

    def shift(x):  # rung r has support size r+1; these ladders start at 2
        return (jnp.concatenate([jnp.zeros((1, m)), x[0]]),
                jnp.concatenate([jnp.array([False]), x[1]]))

    C_sel, loss, k_tot = sd.select_by_simulation(
        [shift(lad1), shift(lad2)], dense_rhs, u0, 0.0, 3.0, data,
        ude.Tsit5(), n_steps, sub=sub, rel_factor=1.5, refit_iters=iters,
        loss_floor=1e-8, max_total_support=5, refit_method=method)
    assert int(k_tot) == 4
    assert float(loss) < 1e-5
    sel_active = np.asarray(C_sel != 0.0)
    true_active = np.asarray(C_true != 0.0)
    assert (sel_active == true_active).all()
    np.testing.assert_allclose(np.asarray(C_sel), np.asarray(C_true),
                               atol=2e-2)


def test_select_by_simulation_holdout_scoring():
    """holdout_stride: the refit fits only the kept save points and the
    selection scores on the held-out ones.  On clean data the true sparse
    structure must still win with near-true coefficients and a holdout
    loss at the (zero) noise floor.  (On the LV study's hardest level this
    mode is a measured NEGATIVE — see the select_by_simulation docstring
    and examples/lotka_volterra/results/residual_attribution.json — but
    its semantics are pinned here.)"""
    import universal_differential_equations_tpu as ude
    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )

    basis = sd.polynomial_basis(2, 2)
    m = len(basis)
    i_x, i_y = basis.names.index("u1"), basis.names.index("u2")
    i_xy = basis.names.index("u1*u2")

    def dense_rhs(t, u, C):
        return basis.theta(u[None, :])[0] @ C

    C_true = jnp.zeros((m, 2)).at[i_x, 0].set(1.3).at[i_xy, 0].set(-0.9) \
        .at[i_y, 1].set(-1.8).at[i_xy, 1].set(0.8)
    u0 = jnp.array([0.44249296, 4.6280594])
    n_save, sub = 31, 4
    n_steps = (n_save - 1) * sub
    _, ys = integrate_fixed(dense_rhs, u0, 0.0, 3.0, C_true,
                            ude.Tsit5(), n_steps)
    data = ys[::sub]

    def col(pairs):
        c = jnp.zeros((m,))
        for i, v in pairs:
            c = c.at[i].set(v)
        return c

    cand1 = (jnp.stack([col([(i_x, 1.25), (i_xy, -0.93)]),
                        col([(i_x, 1.3), (i_xy, -0.9), (i_y, 0.05)])]),
             jnp.array([True, True]))
    cand2 = (jnp.stack([col([(i_y, -1.85), (i_xy, 0.83)]),
                        col([(i_y, -1.8), (i_xy, 0.8), (i_x, 0.05)])]),
             jnp.array([True, True]))
    sizes = [jnp.array([2, 3]), jnp.array([2, 3])]
    C_sel, loss, k_tot = sd.select_by_simulation(
        [cand1, cand2], dense_rhs, u0, 0.0, 3.0, data, ude.Tsit5(),
        n_steps, sub=sub, rel_factor=1.5, refit_iters=12,
        loss_floor=1e-10, max_total_support=6, sizes=sizes,
        refit_all=True, refit_method="lm", holdout_stride=2)
    assert int(k_tot) == 4
    assert float(loss) < 1e-6  # held-out MSE at the clean-data floor
    assert (np.asarray(C_sel != 0.0) == np.asarray(C_true != 0.0)).all()
    np.testing.assert_allclose(np.asarray(C_sel), np.asarray(C_true),
                               atol=3e-2)


def test_best_per_support_per_size_distinct_supports():
    xi = jnp.array([
        [1.0, 0.0, 0.0],   # support {0}, score 1
        [1.1, 0.0, 0.0],   # support {0} again, score 2 (same structure)
        [0.0, 2.0, 0.0],   # support {1}, score 3
        [0.0, 0.0, 4.0],   # support {2}, score 4
    ])
    active = xi != 0.0
    score = jnp.array([1.0, 2.0, 3.0, 4.0])
    xi_k, ok_k = sd.best_per_support(xi, active, score, 2, per_size=2)
    assert xi_k.shape == (4, 3) and ok_k.shape == (4,)
    # rung 0: best k=1; rung 1: best k=1 with a DIFFERENT support (not the
    # duplicate {0} candidate)
    np.testing.assert_allclose(np.asarray(xi_k[0]), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(xi_k[1]), [0.0, 2.0, 0.0])
    assert bool(ok_k[0]) and bool(ok_k[1])
    # no k=2 candidates exist
    assert not bool(ok_k[2]) and not bool(ok_k[3])


def test_select_by_simulation_refit_all_separates_aliases():
    """A sin(u) alias of a linear term fits the regression window as well
    as the truth; refit_all judging by trajectory refit must pick the
    true structure (sin saturates over the full horizon)."""
    import universal_differential_equations_tpu as ude
    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )

    basis = sd.polynomial_basis(1, 2) + sd.sin_basis(1)
    m = len(basis)
    i_u = basis.names.index("u1")
    i_sin = basis.names.index("sin(u1)")

    def dense_rhs(t, u, C):
        return basis.theta(u[None, :])[0] @ C

    # truth: du = 0.31*u (growth drives u well past the sin-linear range)
    C_true = jnp.zeros((m, 1)).at[i_u, 0].set(0.31)
    u0 = jnp.array([0.3])
    n_save, sub = 22, 8
    n_steps = (n_save - 1) * sub
    _, ys = integrate_fixed(dense_rhs, u0, 0.0, 8.0, C_true,
                            ude.Tsit5(), n_steps)
    data = ys[::sub]

    lad = (jnp.stack([
        jnp.zeros((m,)).at[i_sin, ].set(0.36),   # alias, slightly better CV
        jnp.zeros((m,)).at[i_u, ].set(0.305),    # truth (biased coefficient)
    ]), jnp.array([True, True]))
    rung_sizes = jnp.array([1, 1])
    C_sel, loss, k = sd.select_by_simulation(
        [lad], dense_rhs, u0, 0.0, 8.0, data, ude.Tsit5(), n_steps,
        sub=sub, rel_factor=1.5, refit_iters=80, loss_floor=1e-10,
        sizes=[rung_sizes], refit_all=True)
    assert int(k) == 1
    assert bool(C_sel[i_u, 0] != 0.0) and bool(C_sel[i_sin, 0] == 0.0)
    np.testing.assert_allclose(float(C_sel[i_u, 0]), 0.31, atol=1e-3)


def test_select_by_simulation_inside_vmap_lanes():
    """The 500-run study composition: ladder + finalist refit judge traced
    inside vmap over ensemble lanes (each lane sees different noise)."""
    import universal_differential_equations_tpu as ude
    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )

    basis = sd.polynomial_basis(2, 2)
    m = len(basis)
    i_x, i_y = basis.names.index("u1"), basis.names.index("u2")
    i_xy = basis.names.index("u1*u2")

    def dense_rhs(t, u, C):
        return basis.theta(u[None, :])[0] @ C

    C_true = jnp.zeros((m, 2)).at[i_x, 0].set(1.3).at[i_xy, 0].set(-0.9) \
        .at[i_y, 1].set(-1.8).at[i_xy, 1].set(0.8)
    u0 = jnp.array([0.44249296, 4.6280594])
    n_save, sub = 31, 4
    n_steps = (n_save - 1) * sub
    _, ys = integrate_fixed(dense_rhs, u0, 0.0, 3.0, C_true,
                            ude.Tsit5(), n_steps)
    clean = ys[::sub]
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    datas = jnp.stack([clean + 1e-3 * jax.random.normal(k, clean.shape)
                       for k in keys])

    def col(pairs):
        c = jnp.zeros((m,))
        for i, v in pairs:
            c = c.at[i].set(v)
        return c

    lad1 = (jnp.stack([col([(i_x, 5.0)]),
                       col([(i_x, 1.28), (i_xy, -0.92)]),
                       col([(i_x, 1.3), (i_xy, -0.9), (i_y, 1e-3)])]),
            jnp.array([True, True, True]))
    lad2 = (jnp.stack([col([(i_y, -5.0)]),
                       col([(i_y, -1.83), (i_xy, 0.81)]),
                       col([(i_y, -1.8), (i_xy, 0.8), (i_x, 1e-3)])]),
            jnp.array([True, True, True]))

    @jax.jit
    @jax.vmap
    def recover(data):
        C, loss, k = sd.select_by_simulation(
            [lad1, lad2], dense_rhs, data[0], 0.0, 3.0, data, ude.Tsit5(),
            n_steps, sub=sub, rel_factor=1.5, refit_iters=50,
            loss_floor=1.3e-6, max_total_support=5)
        return C, loss, k

    Cs, losses, ks = recover(datas)
    assert Cs.shape == (3, m, 2)
    for lane in range(3):
        act = np.asarray(Cs[lane] != 0.0)
        assert (act == np.asarray(C_true != 0.0)).all(), (lane, act)
        np.testing.assert_allclose(np.asarray(Cs[lane]), np.asarray(C_true),
                                   atol=5e-2)


def test_cv_ladder_library_helper():
    # cv_ladder (the shared front half of the simulation-judged pipeline):
    # the true sparse combination appears at its support size in raw scale;
    # `exclude` removes a feature from candidacy; `extra_supports` fits
    # given supports exhaustively.
    key = jax.random.PRNGKey(3)
    X = jax.random.uniform(key, (60, 4), minval=0.5, maxval=1.5)
    theta = jnp.concatenate([X, (X[:, :1] * X[:, 1:2])], axis=1)  # 5 feats
    y = 2.0 * theta[:, 4] - 0.7 * theta[:, 2]  # true support {2, 4}
    xi_k, ok_k = sd.cv_ladder(theta, y, sd.STLSQ((1e-3, 1e-2, 1e-1)), 3)
    assert xi_k.shape == (3, 5) and ok_k.shape == (3,)
    # rung with support size 2 recovers the true coefficients
    rung2 = np.asarray(xi_k[1])
    assert bool(ok_k[1])
    np.testing.assert_allclose(rung2[[2, 4]], [-0.7, 2.0], rtol=1e-3)
    assert np.abs(rung2[[0, 1, 3]]).max() < 1e-6

    # excluding the dominant feature forces a different structure
    xi_ex, _ = sd.cv_ladder(theta, y, sd.STLSQ((1e-3, 1e-2, 1e-1)), 3,
                            exclude=(4,))
    assert np.asarray(xi_ex)[:, 4].max() == 0.0

    # extra_supports guarantees an exact 2-support candidate exists even
    # with a degenerate threshold grid
    want = jnp.zeros((1, 5), bool).at[0, [2, 4]].set(True)
    xi_es, ok_es = sd.cv_ladder(theta, y, sd.STLSQ((1e3,)), 3,
                                extra_supports=want)
    assert bool(ok_es[1])
    np.testing.assert_allclose(np.asarray(xi_es[1])[[2, 4]], [-0.7, 2.0],
                               rtol=1e-3)

    # traceable under jit
    xi_j, _ = jax.jit(
        lambda th, yy: sd.cv_ladder(th, yy, sd.STLSQ((1e-2,)), 3)
    )(theta, y)
    assert np.isfinite(np.asarray(xi_j)).all()


def test_two_stage_recovery_reference_protocol():
    # the SR3 -> STRRidge two-stage protocol (loop_recoveries.jl:100-125):
    # SR3 sweep scored by g = (L0 < 1 ? inf : ||(L0, L2err)||), structure
    # freeze, STRRidge(0.01) refit on the frozen support
    key = jax.random.PRNGKey(0)
    X, Y = _lv_like_data(key)
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    theta = basis.theta(X)
    noise = 1e-3 * jax.random.normal(jax.random.fold_in(key, 1), Y.shape)
    lams = tuple(10.0 ** e for e in np.arange(-7.0, 7.0, 0.1))
    # denoise=False for the exact-recovery check: SVHT assumes a low-rank
    # signal + iid-noise bulk, which a near-clean polynomial feature matrix
    # is not — its median rule then clips real directions (the reference
    # applies denoise to trained-NN outputs, where the assumption holds)
    C = sd.two_stage_recovery(theta, Y + noise, lams, denoise=False)
    assert C.shape == (len(basis), 2)
    i_x, i_y = basis.names.index("u1"), basis.names.index("u2")
    i_xy = basis.names.index("u1*u2")
    np.testing.assert_allclose(float(C[i_x, 0]), 1.5, atol=0.02)
    np.testing.assert_allclose(float(C[i_xy, 0]), -0.7, atol=0.02)
    np.testing.assert_allclose(float(C[i_y, 1]), -2.0, atol=0.02)
    np.testing.assert_allclose(float(C[i_xy, 1]), 0.4, atol=0.02)
    # structure is exactly sparse: nothing else active
    act = np.abs(np.asarray(C)) > 1e-10
    assert act[:, 0].sum() == 2 and act[:, 1].sum() == 2
    # the reference's denoise=true mode must still produce a finite sparse
    # model (it may trade exactness for noise robustness)
    C_dn = sd.two_stage_recovery(theta, Y + noise, lams)
    assert bool(jnp.all(jnp.isfinite(C_dn)))
    assert (np.abs(np.asarray(C_dn)) > 1e-10).any(axis=0).all()


def test_two_stage_recovery_rejects_empty_and_vmaps():
    key = jax.random.PRNGKey(3)
    X, Y = _lv_like_data(key, N=60)
    basis = sd.polynomial_basis(2, 3)
    theta = basis.theta(X)
    lams = tuple(10.0 ** e for e in np.arange(-4.0, 6.0, 0.25))
    # even with thresholds far above every coefficient in the grid, the
    # g objective must reject the empty model (L0 < 1 -> inf), so the
    # result keeps at least one active term per target
    C = sd.two_stage_recovery(theta, Y, lams, denoise=False)
    assert (np.abs(np.asarray(C)) > 1e-10).any(axis=0).all()
    # lanes of an ensemble: vmap over a batch of targets
    Ys = jnp.stack([Y, Y * 1.1, Y * 0.9])
    Cs = jax.vmap(lambda y: sd.two_stage_recovery(theta, y, lams))(Ys)
    assert Cs.shape == (3, len(basis), 2)
    assert bool(jnp.all(jnp.isfinite(Cs)))


def test_select_by_simulation_refit_top_rescues_hidden_truth():
    """refit_top=2: when a same-size alias out-ranks the true structure on
    the biased PRE-refit trajectory error, judging both finalists per size
    lets the refit separate them (the run_loops mid-noise selection-gap
    fix)."""
    import universal_differential_equations_tpu as ude
    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )

    basis = sd.polynomial_basis(2, 2)
    m = len(basis)
    i_x, i_y = basis.names.index("u1"), basis.names.index("u2")
    i_xy = basis.names.index("u1*u2")
    i_x2 = basis.names.index("u1^2")

    def dense_rhs(t, u, C):
        return basis.theta(u[None, :])[0] @ C

    C_true = jnp.zeros((m, 2)).at[i_x, 0].set(1.3).at[i_xy, 0].set(-0.9) \
        .at[i_y, 1].set(-1.8).at[i_xy, 1].set(0.8)
    u0 = jnp.array([0.44249296, 4.6280594])
    n_save, sub = 31, 4
    n_steps = (n_save - 1) * sub
    _, ys = integrate_fixed(dense_rhs, u0, 0.0, 3.0, C_true,
                            ude.Tsit5(), n_steps)
    data = ys[::sub]

    def col(pairs):
        c = jnp.zeros((m,))
        for i, v in pairs:
            c = c.at[i].set(v)
        return c

    # per_size=2-style ladders at one support size (2): per target, rung 0
    # is a WRONG structure whose pre-refit trajectory happens to sit close
    # to the data (tuned coefficients), rung 1 the true structure with a
    # strong coefficient bias so its pre-refit error is worse
    lad1 = (jnp.stack([col([(i_x, 1.212), (i_x2, -0.293)]),
                       col([(i_x, 1.05), (i_xy, -0.75)])]),
            jnp.array([True, True]))
    lad2 = (jnp.stack([col([(i_y, -1.477), (i_x2, 0.282)]),
                       col([(i_y, -1.5), (i_xy, 0.65)])]),
            jnp.array([True, True]))
    sizes = [jnp.array([2, 2]), jnp.array([2, 2])]

    def run(refit_top):
        return sd.select_by_simulation(
            [lad1, lad2], dense_rhs, u0, 0.0, 3.0, data, ude.Tsit5(),
            n_steps, sub=sub, rel_factor=1.5, refit_iters=80,
            loss_floor=1e-8, max_total_support=4, sizes=sizes,
            refit_top=refit_top)

    # sanity: with refit_top=1 only the pre-refit winner is judged; verify
    # the alias indeed out-ranks the truth pre-refit in this construction
    C1, loss1, _ = run(1)
    C2, loss2, _ = run(2)
    sel2 = np.asarray(C2 != 0.0)
    true_active = np.asarray(C_true != 0.0)
    assert (sel2 == true_active).all(), "refit_top=2 missed the truth"
    np.testing.assert_allclose(np.asarray(C2), np.asarray(C_true), atol=3e-2)
    assert float(loss2) <= float(loss1) + 1e-12


# ---------------------------------------------------------------------------
def test_stability_selection_separates_true_from_spurious():
    # Meinshausen-Buhlmann stability selection over Bernoulli row
    # subsamples (capability extension — the reference has one-shot
    # selection only): the true sparse support must survive nearly every
    # subsample while spurious terms flicker.  Also pins jit-
    # traceability and determinism for a fixed key.  (On near-collinear
    # libraries like the LV degree-5 + sin stack, STLSQ's greedy path can
    # drop the true term at tight supports in EVERY subsample — that
    # failure mode belongs to the base optimizer and is why the study
    # pairs ladders with the simulation judge; this test uses a
    # well-conditioned library to pin the stability machinery itself.)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    N, m = 60, 10
    theta = jax.random.normal(k1, (N, m))
    xi_true = jnp.zeros((m,)).at[2].set(1.5).at[7].set(-0.8)
    y = theta @ xi_true + 0.05 * jax.random.normal(k2, (N,))
    lams = tuple(10.0 ** e for e in np.arange(-3.0, 1.0, 0.25))
    opt = sd.STLSQ(lams)
    freq = jax.jit(lambda yy: sd.stability_selection(
        theta, yy, opt, jax.random.PRNGKey(7), n_subsets=64, frac=0.7,
        max_support=4))(y)
    freq = np.asarray(freq)
    assert freq.shape == (m,)
    assert freq[2] >= 0.95 and freq[7] >= 0.95, freq
    # thresholding at the M&B range recovers exactly the true support
    # (a weakly correlated term may tag along in up to ~60% of subsets —
    # that is the uncertainty signal the frequencies exist to expose)
    others = np.delete(freq, [2, 7])
    assert others.max() < 0.8, freq
    np.testing.assert_array_equal(freq >= 0.8,
                                  np.asarray(xi_true != 0.0))
    assert np.median(others) <= 0.1, freq
    # deterministic for a fixed key
    freq2 = np.asarray(sd.stability_selection(
        theta, y, opt, jax.random.PRNGKey(7), n_subsets=64, frac=0.7,
        max_support=4))
    np.testing.assert_array_equal(freq, freq2)


# Weak-form (integral) regression — sindy/weak.py (C19/C20 extension)


def _lv_trajectory(noise=0.0, key=None):
    """Reference-protocol LV samples: 31 points on (0, 3), optional
    mean-proportional noise (scenario_1.jl:36-53's setup)."""
    from universal_differential_equations_tpu.models import lotka_volterra as lv

    key = jax.random.PRNGKey(11) if key is None else key
    ts, X, Xn = lv.generate_data(key, noise_magnitude=noise)
    return ts, (X if noise == 0.0 else Xn)


def test_weak_test_functions_integration_by_parts():
    # On smooth u with known derivative, Phi @ u' must equal -(dPhi @ u)
    # (integration by parts with compactly supported phi) to quadrature
    # accuracy — the identity the weak regression targets rely on.
    ts = jnp.linspace(0.0, 3.0, 61)
    u = jnp.sin(2.0 * ts)[:, None]
    du = 2.0 * jnp.cos(2.0 * ts)[:, None]
    Phi, dPhi = sd.test_function_matrices(ts, width=31, p=5)
    lhs = np.asarray(Phi @ du)
    rhs = np.asarray(-(dPhi @ u))
    np.testing.assert_allclose(lhs, rhs, atol=2e-5 * np.abs(lhs).max())
    # rows are L2-normalized: reconstruct ∫ q phi^2 = 1 per window
    # (Phi rows carry q·phi/||phi||, so sum(Phi_row * phi_row_unweighted)
    # is 1 only up to the norm — instead check scale comparability)
    row_norms = np.linalg.norm(np.asarray(Phi), axis=1)
    assert row_norms.max() / row_norms.min() < 3.0


def test_weak_degenerate_window_guard_f32():
    # A window whose samples coincide in time has ||phi||_L2 = 0; the norm
    # guard must be representable in float32 (the package's TPU default —
    # a 1e-300 literal underflows to exactly 0.0 there, reintroducing 0/0)
    # so the degenerate row comes out finite (all zeros), not NaN.
    ts = jnp.asarray([0.0, 0.0, 0.0, 1.0, 2.0, 3.0, 4.0], jnp.float32)
    Phi, dPhi = sd.test_function_matrices(ts, width=3, p=5)
    assert Phi.dtype == jnp.float32
    assert np.isfinite(np.asarray(Phi)).all()
    assert np.isfinite(np.asarray(dPhi)).all()
    np.testing.assert_array_equal(np.asarray(Phi[0]), 0.0)


def test_weak_pair_clean_lv_missing_terms():
    # Clean trajectory, known linear physics moved to the target side:
    # the weak pair must be solved exactly by the true missing-term
    # coefficients (-0.9 x·y, +0.8 x·y) — quadrature residual below 1e-3.
    ts, X = _lv_trajectory()
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    i_xy = basis.names.index("u1*u2")
    known = lambda u: jnp.stack([1.3 * u[0], -1.8 * u[1]])
    G, B = sd.weak_pair(ts, X, basis, known, widths=(17,), p=5)
    m = len(basis)
    xi = np.zeros((m, 2))
    xi[i_xy] = (-0.9, 0.8)
    resid = np.asarray(G) @ xi - np.asarray(B)
    assert np.abs(resid).max() <= 1e-3 * np.abs(np.asarray(B)).max()
    # one-column least squares on the true support nails the coefficients
    g = np.asarray(G[:, i_xy])
    for d, truth in enumerate((-0.9, 0.8)):
        c = np.linalg.lstsq(g[:, None], np.asarray(B)[:, d], rcond=None)[0][0]
        np.testing.assert_allclose(c, truth, rtol=2e-3)


def test_weak_statistics_beat_pointwise_at_high_noise():
    # Selection-free statistics comparison at the LV study's hardest noise
    # level (5e-2 mean-proportional): least-squares on the TRUE support —
    # the weak-form rows estimate the missing-term coefficients far better
    # than pointwise collocation derivatives on the same data, because each
    # weak row averages the sample noise over a whole test window.
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    i_xy = basis.names.index("u1*u2")
    known = lambda u: jnp.stack([1.3 * u[0], -1.8 * u[1]])
    err_weak, err_pt = [], []
    for ks in range(4):
        ts, Xn = _lv_trajectory(noise=5e-2, key=jax.random.PRNGKey(ks))
        G, B = sd.weak_pair(ts, Xn, basis, known, widths=(17,), p=5)
        g = np.asarray(G[:, i_xy])
        c_w = [np.linalg.lstsq(g[:, None], np.asarray(B)[:, d],
                               rcond=None)[0][0] for d in range(2)]
        err_weak.append(max(abs(c_w[0] + 0.9), abs(c_w[1] - 0.8)))

        # pointwise route (C20): kernel-collocation derivatives minus the
        # known physics, same library column, same least squares
        Xs, DX = sd.collocate_data(Xn, ts)
        Yres = DX - jax.vmap(known)(Xs)
        th = np.asarray(basis.theta(Xs)[:, i_xy])
        c_pt = [np.linalg.lstsq(th[:, None], np.asarray(Yres)[:, d],
                                rcond=None)[0][0] for d in range(2)]
        err_pt.append(max(abs(c_pt[0] + 0.9), abs(c_pt[1] - 0.8)))
    # measured over 8 keys: median weak 0.21 vs pointwise 1.37 (the
    # collocation derivative is systematically smoothing-biased: its γ
    # estimate lands ~2.1 for a true 0.8 on every draw)
    med_w, med_p = np.median(err_weak), np.median(err_pt)
    assert med_w < 0.3 * med_p, (err_weak, err_pt)
    assert med_w < 0.35, err_weak


def test_weak_pair_seir_exposure_features():
    # The SEIR exposure case (seir_exposure.py weak arm): z enters dE with
    # +; weak_pair(features=...) must put the basis on the derived
    # coordinates while the ∫φ'u side stays on the raw observables.  On
    # the clean trajectory the E-equation weak target must equal the
    # quadrature of the true exposure itself — the identity the
    # training-free recovery rests on.  (The S equation also carries z,
    # but S ~ 0.9 vs z ~ 3e-6: its daily-sample quadrature bias dwarfs
    # the signal — measured rel error 2.1 vs the E row's 3.7e-5 — which
    # is why the example regresses the E row only.)
    import universal_differential_equations_tpu as ude
    from universal_differential_equations_tpu.models import seir

    ts = jnp.arange(0.0, 21.1, 1.0)
    truth = ude.solve(
        ude.ODEProblem(seir.corona_rhs, seir.U0_NORM, (0.0, 21.0),
                       seir.P_SEIR),
        ude.Vern7(), saveat=ts, rtol=1e-9, atol=1e-11,
        adjoint=ude.NoAdjoint(), max_steps=16384)
    assert bool(truth.success)
    X = truth.ys
    p_ = seir.P_SEIR
    F_n, beta0 = float(p_[0] / seir._S0), float(p_[1])
    mu_, sigma_, gamma_, d_, lam_ = [float(p_[i]) for i in (4, 5, 6, 7, 8)]

    def known_no_z(u):
        S, E, I, R, Nn, D, Cc = u
        imported = beta0 * S * F_n / Nn
        return jnp.stack([
            -imported - mu_ * S, imported - (sigma_ + mu_) * E,
            sigma_ * E - (gamma_ + mu_) * I, gamma_ * I - mu_ * R,
            -mu_ * Nn, d_ * gamma_ * I - lam_ * D, sigma_ * E])

    basis = (sd.cos_basis(3) + sd.sin_basis(3)
             + sd.tensor_polynomial_basis(3, 2))
    feats_fn = lambda u: jnp.stack([u[0] / u[4], 1e5 * u[2],
                                    1e5 * u[5] / u[4]])
    widths = (13, 17, 21)
    G, B = sd.weak_pair(ts, X, basis, known_no_z, widths=widths, p=5,
                        features=feats_fn)
    # features=... routed the basis through the derived coordinates
    feats = jax.vmap(feats_fn)(X)
    Phi = jnp.concatenate([
        sd.test_function_matrices(ts, w, p=5)[0] for w in widths])
    np.testing.assert_allclose(np.asarray(G),
                               np.asarray(Phi @ basis.theta(feats)),
                               rtol=1e-10, atol=1e-12)
    # the E-row target reproduces the true exposure's quadrature
    z_true = jax.vmap(lambda u: seir.true_exposure(u))(X)
    target = np.asarray(Phi @ z_true)
    scale = np.abs(target).max()
    np.testing.assert_allclose(np.asarray(B[:, 1]), target, rtol=0,
                               atol=2e-4 * scale)


def test_weak_front_end_plumbing():
    # WeakDataDrivenProblem through the sindy() front end: the weak rows
    # replace (Θ(X), Y), coefficients come back in the raw basis frame and
    # the result API round-trips.  NOTE structure selection on weak rows is
    # the simulation judge's job (weak.py docstring: overlapping windows
    # correlate the rows, so purely statistical parsimony over-selects) —
    # this test pins the plumbing: the true term is active with the right
    # coefficient even when statistical selection keeps extra terms.
    ts, X = _lv_trajectory()
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    i_xy = basis.names.index("u1*u2")
    known = lambda u: jnp.stack([1.3 * u[0], -1.8 * u[1]])
    lams = tuple(10.0 ** e for e in np.arange(-3.0, 2.0, 0.1))
    prob = sd.WeakDataDrivenProblem(X, ts, known_rhs=known, widths=(17,))
    res = sd.sindy(prob, basis, sd.STLSQ(lams), normalize=True)
    assert bool(res.active[i_xy, 0]) and bool(res.active[i_xy, 1])
    np.testing.assert_allclose(res.coefficients[i_xy], (-0.9, 0.8), atol=5e-3)
    assert "u1*u2" in res.equations()[0]


def test_weak_plus_simulation_judge_recovers_structure():
    # The study's weak arm in miniature (run_loops.py weak_stage): weak
    # rows → CV ladder → simulation-refit judge, 4 lanes at 1e-2 noise —
    # the level where the pointwise trained-NN arm drops to 93%; the weak
    # arm measured 100% at 25 lanes/level, so 4/4 here is a stable gate.
    import universal_differential_equations_tpu as ude
    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )
    from universal_differential_equations_tpu.models import lotka_volterra as lv

    ts, X, _ = lv.generate_data(jax.random.PRNGKey(11))
    X = jnp.asarray(X, jnp.float64)
    x_mean = jnp.mean(X, axis=0)
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    i_xy = basis.names.index("u1*u2")
    m = len(basis)
    known = lambda u: jnp.stack([1.3 * u[0], -1.8 * u[1]])
    lams = tuple(10.0 ** e for e in np.arange(-3.0, 5.0, 0.2))
    opt = sd.STLSQ(lams)
    masks1 = jnp.eye(m, dtype=bool)
    sub = 4
    n_step = (len(ts) - 1) * sub
    t_end = float(ts[-1])
    x_mean_sq = float(jnp.mean(x_mean**2))

    def dense_rhs(t, u, C):
        th = basis.theta(u[None, :])[0]
        return jnp.stack([1.3 * u[0] + th @ C[:, 0],
                          -1.8 * u[1] + th @ C[:, 1]])

    @jax.jit
    @jax.vmap
    def weak_lane(key):
        mag = 1e-2
        data = X + mag * x_mean * jax.random.normal(key, X.shape)
        G, B = sd.weak_pair(ts, data, basis, known, widths=(17,), p=5)
        ladder = lambda y: sd.cv_ladder(G, y, opt, 5, per_size=2,
                                        extra_supports=masks1)
        sizes_r = jnp.repeat(jnp.arange(1, 6), 2)
        C_sel, _, _ = sd.select_by_simulation(
            [ladder(B[:, 0]), ladder(B[:, 1])], dense_rhs, data[0],
            0.0, t_end, data, ude.Tsit5(), n_step, sub=sub,
            rel_factor=1.5, max_rel=1.0, refit_iters=8,
            loss_floor=1.3 * mag**2 * x_mean_sq + 1e-7,
            max_total_support=5, sizes=[sizes_r, sizes_r],
            refit_top=(2, 1, 1, 1), refit_method="lm")
        act1 = C_sel[:, 0] != 0.0
        act2 = C_sel[:, 1] != 0.0
        want = jnp.zeros(m, bool).at[i_xy].set(True)
        return jnp.all(act1 == want) & jnp.all(act2 == want)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    exact = np.asarray(weak_lane(keys))
    assert exact.sum() >= 3, exact
