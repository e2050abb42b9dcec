"""SEIR exposure: neural ODE vs UDE vs SINDy-recovered exposure.

Reproduction of ``SEIR_exposure/seir_exposure.jl`` on TPU: 21-day truth at
tight tolerance, (a) black-box neural ODE on 5 equations, (b) UDE learning
only the quarantine exposure term from physics-restricted inputs, both with
the interpolating adjoint; SINDy recovery triad (direct fail / ideal succeed
/ UDE succeed, ``seir_exposure.jl:222-228``) with the cos+sin+tensor-monomial
basis; recovered model extrapolated from day 21 to day 60.

Run: python examples/seir_exposure/seir_exposure.py [--quick]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu import sindy as sd
from universal_differential_equations_tpu.models import seir
from universal_differential_equations_tpu.train import bfgs_minimize, fit
from universal_differential_equations_tpu.utils import (
    enable_compilation_cache,
    rescale_problem,
)

enable_compilation_cache()

# E,I,R,D,C live ~5 decades below S,N after population normalization; solve
# in per-state O(1) units (exact transform) so f32 relative control works
SCALES = jnp.array([1.0, 1e5, 1e5, 1e5, 1.0, 1e5, 1e5])


def train_variant(tag, rhs, params0, ts, data, quick, polish=False):
    """ADAM(0.01)→BFGS on the E,I,R rows (``seir_exposure.jl:77-96``).

    ``polish=True`` finishes the BFGS on the host CPU in float64 from the
    ADAM point (the scenario-1 x64-host pattern).  Off by default here:
    measured >1 h for this 7-state system (~2500 adaptive steps per
    gradient at rtol 1e-8), and the refit_all simulation judge below
    resolves the sin(u₂)↔u₂ alias without it.
    """
    base = ude.ODEProblem(rhs, seir.U0_NORM, (0.0, 21.0), params0)
    prob_s = rescale_problem(base, SCALES)
    data_s = data * SCALES[None, :]

    def loss(p):
        sol = ude.solve(
            ude.remake(prob_s, args=p), ude.Tsit5(), saveat=ts,
            rtol=1e-6, atol=1e-7, adjoint=ude.InterpolatingAdjoint(),
        )
        return jnp.mean((sol.ys[:, 1:4] - data_s[:, 1:4]) ** 2)

    t0 = time.time()
    r1 = fit(loss, params0, optax.adam(0.01), 200 if quick else 500,
             callback_every=250)
    if polish and not quick and jnp.zeros(()).dtype == jnp.float32:
        cpu = jax.devices("cpu")[0]
        with jax.enable_x64(True), jax.default_device(cpu):
            to64 = lambda a: jnp.asarray(np.asarray(a), jnp.float64)
            ts64 = to64(ts)
            scales64 = to64(SCALES)
            data64 = to64(data) * scales64[None, :]
            p64 = jax.tree.map(to64, r1.params)
            prob64 = rescale_problem(
                ude.ODEProblem(rhs, to64(seir.U0_NORM), (0.0, 21.0), p64),
                scales64)

            def loss64(p):
                sol = ude.solve(
                    ude.remake(prob64, args=p), ude.Tsit5(), saveat=ts64,
                    rtol=1e-8, atol=1e-9, adjoint=ude.InterpolatingAdjoint(),
                )
                return jnp.mean((sol.ys[:, 1:4] - data64[:, 1:4]) ** 2)

            r2 = bfgs_minimize(loss64, p64, maxiters=1500,
                               initial_stepnorm=0.01, gtol=1e-14)
        to32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        params = jax.tree.map(to32, r2.params)
        print(f"{tag}: adam {r1.final_loss:.3e} → f64-host bfgs "
              f"{float(r2.value):.3e} ({time.time()-t0:.0f}s)")
        return params
    # BFGS restart rounds instead of one long program: a fresh Hessian at the
    # stalled point escapes f32 line-search stalls (run-to-run TPU variance
    # left the exposure net ~10× above its reachable loss in single-shot
    # runs), and ≤250-iteration device programs stay watchdog-safe
    params, best = r1.params, float("inf")
    for _ in range(1 if quick else 5):
        r2 = bfgs_minimize(loss, params, maxiters=200 if quick else 250,
                           initial_stepnorm=0.01)
        params = r2.params
        v = float(r2.value)
        if v >= 0.99 * best:
            break
        best = v
    print(f"{tag}: adam {r1.final_loss:.3e} → bfgs {float(r2.value):.3e} "
          f"({time.time()-t0:.0f}s)")
    return params


def main(quick=False, plot=False):
    ts = jnp.arange(0.0, 21.1, 1.0)
    truth = ude.solve(
        ude.ODEProblem(seir.corona_rhs, seir.U0_NORM, (0.0, 21.0), seir.P_SEIR),
        ude.Vern7(), saveat=ts, rtol=1e-10, atol=1e-12,
        adjoint=ude.NoAdjoint(), step_to_saveat=True,
    )
    assert bool(truth.success)
    key = jax.random.PRNGKey(10)
    data = truth.ys + 1e-7 * jax.random.normal(key, truth.ys.shape)
    print(f"truth: E,I,R final = {np.asarray(truth.ys[-1, 1:4])}")

    # (a) black-box neural ODE
    rhs_node, p_node0, _ = seir.make_neural_ode(jax.random.PRNGKey(1))
    p_node = train_variant("neural ODE", rhs_node, p_node0, ts, data, quick)

    # (b) exposure UDE
    rhs_ude, p_ude0, net = seir.make_exposure_ude(jax.random.PRNGKey(2))
    p_ude = train_variant("exposure UDE", rhs_ude, p_ude0, ts, data, quick)

    # SINDy triad (seir_exposure.jl:191-228)
    basis = (sd.cos_basis(3) + sd.sin_basis(3) + sd.tensor_polynomial_basis(3, 2))
    lams = tuple(10.0 ** e for e in np.arange(-6.0, 1.0, 0.1))
    X = data
    # features in the model's scaled coordinates [S/N, 1e5·I, 1e5·D/N]
    feats = jnp.stack([X[:, 0] / X[:, 4], 1e5 * X[:, 2],
                       1e5 * X[:, 5] / X[:, 4]], axis=1)
    L_true = 1e5 * jax.vmap(lambda u: seir.true_exposure(u))(X)
    sol_ude = ude.solve(
        rescale_problem(
            ude.ODEProblem(rhs_ude, seir.U0_NORM, (0.0, 21.0), p_ude), SCALES
        ),
        ude.Tsit5(), saveat=ts, rtol=1e-6, atol=1e-7, adjoint=ude.NoAdjoint(),
    )
    Xh = sol_ude.ys / SCALES[None, :]
    feats_h = jnp.stack([Xh[:, 0] / Xh[:, 4], 1e5 * Xh[:, 2],
                         1e5 * Xh[:, 5] / Xh[:, 4]], axis=1)
    L_hat = jax.vmap(lambda f: net.apply(p_ude, f)[0])(feats_h)  # scaled z
    print(f"exposure reconstruction (scaled units): max |L̂-L| = "
          f"{float(jnp.abs(L_hat - L_true).max()):.2e} "
          f"(signal scale {float(jnp.abs(L_true).max()):.2e})")

    # skip the early zero-state samples like the reference ([5:end]/[2:end])
    res_ideal = sd.sindy(sd.DirectDataDrivenProblem(feats[4:], L_true[4:, None]),
                         basis, sd.STLSQ(lams), normalize=True, exhaustive_k=2)
    # Parsimony ladder with a REFIT simulation judge (sindy/select.py).
    # The NN reconstruction carries a few-percent *smooth* error, so
    # held-out regression error over-selects, and on the 21-day window
    # sin(u₂) aliases the true ~0.31·u₂ exposure (they differ <2% on the
    # data range but sin saturates beyond it — the aliased model held a
    # 0.45 day-60 extrapolation error).  The reference accepted its model
    # by checking the simulation (seir_exposure.jl:232-249); automated:
    # exhaustive 1/2-term + STLSQ-grid candidates → best per support size
    # by CV → each finalist's coefficients re-optimized against the
    # trajectory → sparsest finalist within 1.5× of the best refit loss.
    import dataclasses as _dc
    import itertools

    m = len(basis)
    th_f = basis.theta(feats_h[1:])
    y_t = L_hat[1:]
    masks_small = jnp.concatenate([
        jnp.eye(m, dtype=bool),
        jnp.asarray([[i in c for i in range(m)]
                     for c in itertools.combinations(range(m), 2)]),
    ])
    opt_grid = sd.STLSQ(lams)

    @jax.jit
    def build_ladder():
        # two candidates per support size (library form: sindy.cv_ladder):
        # on this window sin(u2) near-aliases the true ~0.31*u2 exposure,
        # so the runner-up support must reach the simulation judge; all
        # 1- and 2-term supports are fit exhaustively because greedy
        # thresholding cannot un-cancel collinear groups
        return sd.cv_ladder(th_f, y_t, opt_grid, 4, per_size=2,
                            extra_supports=masks_small)

    p_ = seir.P_SEIR
    F_n, beta0 = float(p_[0] / seir._S0), float(p_[1])
    alpha_, kappa_, mu_, sigma_, gamma_, d_, lam_ = [
        float(v) for v in p_[2:9]]

    def dense_rhs(t, us, C):
        """Full SEIR (corona!, seir_exposure.jl:16-29) with the recovered
        symbolic exposure z = 1e-5·Θ([S/N, 1e5·I, 1e5·D/N])·ξ, in the
        per-state O(1) solve units."""
        u = us / SCALES
        S, E, I, R, N, D, Cc = u
        z = 1e-5 * (basis.theta(
            jnp.stack([S / N, 1e5 * I, 1e5 * D / N])[None, :])[0] @ C[:, 0])
        imported = beta0 * S * F_n / N
        dS = -imported - z - mu_ * S
        dE = imported + z - (sigma_ + mu_) * E
        dI = sigma_ * E - (gamma_ + mu_) * I
        dR = gamma_ * I - mu_ * R
        dN = -mu_ * N
        dD = d_ * gamma_ * I - lam_ * D
        dC = sigma_ * E
        return jnp.stack([dS, dE, dI, dR, dN, dD, dC]) * SCALES

    data_s = data * SCALES[None, :]
    SUBS = 8
    n_steps = (len(ts) - 1) * SUBS
    # noise 1e-7 (normalized) on the 1e5-scaled rows → MSE floor ~7e-5
    rung_sizes = jnp.repeat(jnp.arange(1, 5), 2)  # per_size=2 ladder
    C_sel, refit_loss, k_sel = jax.jit(
        lambda lad: sd.select_by_simulation(
            [lad], dense_rhs, seir.U0_NORM * SCALES, 0.0, 21.0, data_s,
            ude.Tsit5(), n_steps, sub=SUBS, rel_factor=1.5,
            refit_iters=100, loss_floor=1e-4, max_total_support=4,
            sizes=[rung_sizes], refit_all=True)
    )(build_ladder())
    act_sel = np.asarray(C_sel[:, 0] != 0.0)
    res_ude = _dc.replace(
        res_ideal, coefficients=np.asarray(C_sel), active=act_sel[:, None],
        sparsity=np.asarray([act_sel.sum()]),
    )
    k_sel = int(k_sel)
    print(f"selection: k={k_sel} terms, refit loss {float(refit_loss):.3g} "
          f"(ladder of 4 support sizes, trajectory-refit judged)")
    print("ideal-recovery:", res_ideal.equations("dz")[0][:100])
    print("UDE-recovery:  ", res_ude.equations("dz")[0][:100])

    # Weak-form arm (sindy/weak.py — capability extension; the reference's
    # recovery triad regresses pointwise targets only,
    # seir_exposure.jl:191-229): recover the exposure DIRECTLY from the
    # noisy observables, no NN and no training.  z enters dE with +
    # (corona!, seir_exposure.jl:16-29); every known term moves to the
    # target side, and the E equation's weak rows form the regression.
    # The S equation carries z too (with −), but S ~ 0.9 while z ~ 3e-6:
    # the daily-sample quadrature bias on ∫φ'S sits orders of magnitude
    # above the signal (measured rel identity error 2.1 at p=5 vs 3.7e-5
    # on the E row, whose state shares the signal's 1e-5 scale), so the
    # S row is excluded.  The basis lives on the derived features
    # [S/N, 1e5·I, 1e5·D/N] (weak_pair(features=...)) while the ∫φ'u
    # side stays on the raw observables.
    def known_no_z(u):
        S, E, I, R, Nn, D, Cc = u
        imported = beta0 * S * F_n / Nn
        return jnp.stack([
            -imported - mu_ * S,
            imported - (sigma_ + mu_) * E,
            sigma_ * E - (gamma_ + mu_) * I,
            gamma_ * I - mu_ * R,
            -mu_ * Nn,
            d_ * gamma_ * I - lam_ * D,
            sigma_ * E,
        ])

    feats_fn = lambda u: jnp.stack([u[0] / u[4], 1e5 * u[2],
                                    1e5 * u[5] / u[4]])
    Gw, Bw = sd.weak_pair(ts, data, basis, known_no_z,
                          widths=(13, 17, 21), p=5, features=feats_fn)
    # dE = known + z with z = 1e-5·Θ(feats)·ξ
    y_w = Bw[:, 1] * 1e5
    G_w = Gw

    @jax.jit
    def weak_select():
        lad = sd.cv_ladder(G_w, y_w, opt_grid, 4, per_size=2,
                           extra_supports=masks_small)
        return sd.select_by_simulation(
            [lad], dense_rhs, seir.U0_NORM * SCALES, 0.0, 21.0, data_s,
            ude.Tsit5(), n_steps, sub=SUBS, rel_factor=1.5,
            refit_iters=100, loss_floor=1e-4, max_total_support=4,
            sizes=[rung_sizes], refit_all=True)

    C_wsel, refit_loss_w, k_w = weak_select()
    act_w = np.asarray(C_wsel[:, 0] != 0.0)
    res_weak = _dc.replace(
        res_ideal, coefficients=np.asarray(C_wsel), active=act_w[:, None],
        sparsity=np.asarray([act_w.sum()]),
    )
    print(f"weak-form arm: k={int(k_w)} terms, refit loss "
          f"{float(refit_loss_w):.3g} (training-free)")
    print("weak-recovery: ", res_weak.equations("dz")[0][:100])

    # recovered model extrapolation to day 60 (seir_exposure.jl:248-253)
    ts60 = jnp.arange(0.0, 60.1, 1.0)
    truth60 = ude.solve(
        ude.ODEProblem(seir.corona_rhs, seir.U0_NORM, (0.0, 60.0), seir.P_SEIR),
        ude.Vern7(), saveat=ts60, rtol=1e-10, atol=1e-12, adjoint=ude.NoAdjoint(),
        max_steps=16384,
    )
    assert bool(truth60.success), "day-60 truth solve must converge"
    scale = float(jnp.abs(truth60.ys[:, 1:4]).max())

    def extrapolate(res):
        rec_rhs = seir.make_recovered_rhs(res)
        rec_s = ude.solve(
            rescale_problem(
                ude.ODEProblem(rec_rhs, seir.U0_NORM, (0.0, 60.0),
                               jnp.asarray(res.parameters())), SCALES
            ),
            ude.Tsit5(), saveat=ts60, rtol=1e-6, atol=1e-8,
            adjoint=ude.NoAdjoint(),
        )
        rec = _dc.replace(rec_s, ys=rec_s.ys / SCALES[None, :])
        e = float(jnp.abs(rec.ys[:, 1:4] - truth60.ys[:, 1:4]).max()) / scale
        return rec, e

    rec, err = extrapolate(res_ude)
    rec_w, err_w = extrapolate(res_weak)
    print(f"recovered-model extrapolation to day 60: success={bool(rec.success)}, "
          f"rel err on E,I,R = {err:.3f}")
    print(f"weak-form-model extrapolation to day 60: "
          f"success={bool(rec_w.success)}, rel err on E,I,R = {err_w:.3f} "
          f"(training-free vs the trained arm's {err:.3f})")
    if not quick:
        # a clamped tail freezes the (small) late-time states and could
        # sneak under the peak-normalized error bound untested
        assert bool(rec.success), "recovered-model day-60 solve must finish"
        assert err < 0.15, f"recovered model must extrapolate (rel err {err:.2f})"
        assert bool(rec_w.success), "weak-form day-60 solve must finish"
        assert err_w < 0.15, (
            f"weak-form model must extrapolate (rel err {err_w:.2f})")

    if plot:
        # seir_exposure.jl figure analogues: the learned exposure term vs
        # truth on-trajectory, and the recovered model's day-21→60 forecast
        from universal_differential_equations_tpu import viz

        outdir = Path(__file__).resolve().parent / "plots"
        viz.save(viz.plot_function_comparison(
            np.asarray(ts), np.asarray(L_hat), np.asarray(L_true),
            labels=("NN exposure", "true exposure"), xlabel="day",
            ylabel="exposure rate (scaled)",
            title="learned exposure term along the trajectory"),
            outdir / "seir_exposure_term.pdf")
        fig = viz.plot_timeseries(
            ts60, truth60.ys[:, 1:4], labels=["E (truth)", "I (truth)", "R (truth)"],
            title="recovered exposure model: 21 training days → day 60",
            xlabel="day", ylabel="fraction of population", train_end=21.0)
        ax = fig.axes[0]
        for i in range(3):
            ax.plot(np.asarray(ts60), np.asarray(rec.ys)[:, 1 + i],
                    linestyle="--", linewidth=1.2, color=viz.SERIES[i])
        viz.save(fig, outdir / "seir_extrapolation.pdf")
        print(f"plots written to {outdir}")

    return dict(extrap_rel_err=err, extrap_rel_err_weak=err_w)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="write seir_exposure.jl figure analogues")
    _a = ap.parse_args()
    main(quick=_a.quick, plot=_a.plot)
