"""LV scenario 1: automated identification of nonlinear interactions.

End-to-end reproduction of ``LotkaVolterra/scenario_1.jl`` on TPU:
truth at Vern7/1e-12 → 5e-3 mean-proportional noise → UDE with 2→5→5→5→2
RBF MLP learning the interaction terms → ADAM → BFGS (f32 on device, then
float64 on the host CPU — the reference trains in Float64 and f32 line
searches stall well above the noise floor) → SINDy (poly deg 5 + sin,
STLSQ λ-sweep) with simulation-validated sparse selection →
recovered-parameter refit → extrapolation to t = 50.

Run: python examples/lotka_volterra/scenario_1.py [--quick] [--cpu] [--plot]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

_ap = argparse.ArgumentParser()
_ap.add_argument("--quick", action="store_true")
_ap.add_argument("--x64", action="store_true",
                 help="run in float64 (CPU); default float32 suits TPU")
_ap.add_argument("--cpu", action="store_true",
                 help="force the CPU backend (the TPU plugin rewrites "
                      "JAX_PLATFORMS, so use this flag instead)")
_ap.add_argument("--plot", action="store_true",
                 help="write the reference's figure analogues to ./plots/")
ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

import jax

if ARGS.cpu:
    jax.config.update("jax_platforms", "cpu")
if ARGS.x64:
    # must precede any module that materializes constants
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu import sindy as sd
from universal_differential_equations_tpu.models import lotka_volterra as lv
from universal_differential_equations_tpu.train import bfgs_minimize, fit
from universal_differential_equations_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main(quick=False, plot=False):
    key = jax.random.PRNGKey(1234)  # StableRNG(1111)-style fixed seed
    kd, kn = jax.random.split(key)

    # -- data generation (scenario_1.jl:40-53)
    ts, X_true, X_noisy = lv.generate_data(
        kd, rtol=1e-10 if jnp.zeros(()).dtype == jnp.float32 else 1e-12,
        atol=1e-10 if jnp.zeros(()).dtype == jnp.float32 else 1e-12,
    )
    print(f"data: {X_noisy.shape[0]} samples on t∈[{float(ts[0])}, {float(ts[-1])}]")

    # -- UDE definition (scenario_1.jl:59-73)
    rhs, params0, net = lv.make_ude(kn)
    u0 = X_noisy[0]
    t0f, t1f = float(ts[0]), float(ts[-1])
    prob0 = ude.ODEProblem(rhs, u0, (t0f, t1f), params0)

    def predict(params):
        sol = ude.solve(
            ude.remake(prob0, args=params), ude.Tsit5(), saveat=ts,
            rtol=1e-6, atol=1e-6, adjoint=ude.InterpolatingAdjoint(),
        )
        return sol.ys

    def loss(params):
        # mean (not sum) keeps f32 line-search arithmetic well-scaled on TPU;
        # the optimum is identical to the reference's sum-of-squares.
        return jnp.mean((predict(params) - X_noisy) ** 2)

    # -- two-stage training (scenario_1.jl:111-118) + f64 host polish.
    # The reference trains in Float64; on an f32 TPU the BFGS line search
    # stalls ~40× above the 5e-3-noise floor (measured 6.9e-4 vs floor
    # 1.4e-5), which leaves enough NN error on-trajectory to blur the
    # sparse recovery.  The C27 answer: finish the BFGS on the host CPU in
    # float64 (the daeint x64_host pattern) — from the f32 stall point it
    # reaches 9e-6, *below* the noise floor, in ~40 s.
    t0 = time.time()
    res1 = fit(loss, params0, optax.adam(0.1), 100 if quick else 200,
               callback=lambda s, l, p: (print(f"  adam step {s}: loss {l:.6f}"), False)[1],
               callback_every=50)
    res2 = bfgs_minimize(loss, res1.params,
                         maxiters=300 if quick else 2000,
                         initial_stepnorm=0.01, gtol=1e-10)
    f32_loss = float(res2.value)
    if not quick and jnp.zeros(()).dtype == jnp.float32:
        cpu = jax.devices("cpu")[0]
        with jax.enable_x64(True), jax.default_device(cpu):
            to64 = lambda a: jnp.asarray(np.asarray(a), jnp.float64)
            ts64, X64 = to64(ts), to64(X_noisy)
            p64 = jax.tree.map(to64, res2.params)
            prob64 = ude.ODEProblem(rhs, X64[0], (0.0, t1f), p64)

            def loss64(p):
                sol = ude.solve(
                    ude.remake(prob64, args=p), ude.Tsit5(), saveat=ts64,
                    rtol=1e-8, atol=1e-8, adjoint=ude.InterpolatingAdjoint(),
                )
                return jnp.mean((sol.ys - X64) ** 2)

            res64 = bfgs_minimize(loss64, p64, maxiters=2000,
                                  initial_stepnorm=0.001, gtol=1e-12)
        to32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        res2 = res2._replace(params=jax.tree.map(to32, res64.params),
                             value=jnp.asarray(float(res64.value)))
    train_s = time.time() - t0
    print(f"training: adam final {res1.final_loss:.6f} → bfgs(f32) "
          f"{f32_loss:.8f} → bfgs(f64 host) {float(res2.value):.8f} "
          f"in {train_s:.1f}s")

    # -- SINDy recovery on the learned interactions (scenario_1.jl:155-172).
    # The trained NN matches the true interactions only to a few percent
    # (it absorbs measurement noise), and the CV parsimony tolerance that
    # collapses that structured error to the sparse truth varies per
    # equation and per run.  So: sweep the tolerance ladder, then select
    # the per-equation pair whose *re-simulated* recovered model reproduces
    # the data — the automated version of the reference's visual check.
    import dataclasses as _dc

    X_hat = predict(res2.params)
    nn_out = jax.vmap(lambda u: net.apply(res2.params, u))(X_hat)
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    lams = tuple(10.0 ** e for e in np.arange(-3.0, 5.0, 0.05))  # exp10.(-3:5)
    import itertools

    base = sd.sindy(sd.DirectDataDrivenProblem(X_hat, nn_out), basis,
                    sd.STLSQ(lams), normalize=True,
                    sampler=sd.DataSampler(n=4, shuffle=True))
    ladder = [base] + [
        sd.sindy(sd.DirectDataDrivenProblem(X_hat, nn_out), basis,
                 sd.STLSQ(lams), normalize=True,
                 sampler=sd.DataSampler(n=4, shuffle=True), cv_tolerance=tol)
        for tol in (25.0, 100.0)
    ]
    m = len(basis)
    opts = [[], []]  # (support, (m,) coefficient column) per equation
    for r in ladder:
        for e in (0, 1):
            kk = tuple(np.nonzero(np.asarray(r.active)[:, e])[0].tolist())
            if kk and kk not in [o[0] for o in opts[e]]:
                opts[e].append((kk, np.asarray(r.coefficients)[:, e]))
    # inject the best exhaustive 1- and 2-term least-squares fits: statistics
    # (CV/AICc) systematically over-select here because the NN's structured
    # few-percent deviation is fit consistently across folds — the sparse
    # physical candidates must reach the simulation judge regardless
    theta_f = np.asarray(basis.theta(X_hat), np.float64)
    Y_f = np.asarray(nn_out, np.float64)
    for e in (0, 1):
        for k in (1, 2):
            best = None
            for comb_idx in itertools.combinations(range(m), k):
                A = theta_f[:, comb_idx]
                coef, *_ = np.linalg.lstsq(A, Y_f[:, e], rcond=None)
                rss = float(((A @ coef - Y_f[:, e]) ** 2).sum())
                if best is None or rss < best[0]:
                    best = (rss, comb_idx, coef)
            col = np.zeros(m)
            col[list(best[1])] = best[2]
            if best[1] not in [o[0] for o in opts[e]]:
                opts[e].append((tuple(best[1]), col))

    def combine(col1, col2):
        coefs = np.stack([col1, col2], -1)
        act = coefs != 0.0
        return _dc.replace(
            base, coefficients=coefs, active=act,
            sparsity=act.sum(axis=0),
        )

    data_scale = float(jnp.abs(X_noisy).max())
    scored = []
    for k1, col1 in opts[0]:
        for k2, col2 in opts[1]:
            comb = combine(col1, col2)
            rr = lv.make_recovered_rhs(comb)
            sol_c = ude.solve(
                ude.ODEProblem(rr, u0, (t0f, t1f),
                               jnp.asarray(comb.parameters())),
                ude.Tsit5(), saveat=ts, rtol=1e-6, atol=1e-6,
                adjoint=ude.NoAdjoint(), max_steps=1024,
            )
            bad = not bool(sol_c.success) or not bool(
                jnp.all(jnp.isfinite(sol_c.ys)))
            rel = float("inf") if bad else float(
                jnp.abs(sol_c.ys - X_noisy).max()) / data_scale
            scored.append((len(k1) + len(k2), rel, comb))
    print("candidate pairs (k, simulated rel err):",
          sorted((s[0], round(s[1], 3)) for s in scored))
    fitting = [s for s in scored if s[1] < 0.10]
    k_sel, rel_sel, res_sindy = (
        min(fitting, key=lambda s: (s[0], s[1])) if fitting
        else min(scored, key=lambda s: s[1])
    )
    print(f"selection: {k_sel} active terms, simulated rel err {rel_sel:.3f} "
          f"({len(scored)} candidate pairs)")
    print("recovered interactions:")
    for eq in res_sindy.equations():
        print("  " + eq)

    # -- refit recovered parameters on data (scenario_1.jl:183-191)
    if res_sindy.parameters().size == 0:
        raise SystemExit("SINDy recovered an empty model — train longer "
                         "(run without --quick)")
    rec_rhs = lv.make_recovered_rhs(res_sindy)
    p_rec0 = jnp.asarray(res_sindy.parameters())

    def loss_rec(p):
        prob = ude.ODEProblem(rec_rhs, u0, (t0f, t1f), p)
        sol = ude.solve(prob, ude.Tsit5(), saveat=ts, rtol=1e-6, atol=1e-6)
        return jnp.mean((sol.ys - X_noisy) ** 2)

    res3 = bfgs_minimize(loss_rec, p_rec0, maxiters=200)
    # under-trained quick runs can hand SINDy a dense, unstable model whose
    # refit diverges — keep the pre-refit coefficients in that case
    if not np.isfinite(float(res3.value)):
        res3 = res3._replace(params=p_rec0,
                             value=jnp.asarray(float(loss_rec(p_rec0))))
    print(f"refit: loss {float(res3.value):.8f}, params {np.asarray(res3.params)}")
    print(f"true interaction coefficients: [-{float(lv.P_TRUE[1])}, "
          f"+{float(lv.P_TRUE[2])}] (β, γ for the x·y terms)")

    # -- extrapolation to t = 50 (scenario_1.jl:200-207)
    prob_ex = ude.ODEProblem(rec_rhs, u0, (0.0, 50.0), res3.params)
    ts_ex = jnp.linspace(0.0, 50.0, 501)
    sol_ex = ude.solve(prob_ex, ude.Tsit5(), saveat=ts_ex, rtol=1e-8,
                       atol=1e-8, adjoint=ude.NoAdjoint())
    prob_truth = ude.ODEProblem(lv.lotka_rhs, u0, (0.0, 50.0), lv.P_TRUE)
    sol_truth = ude.solve(prob_truth, ude.Tsit5(), saveat=ts_ex, rtol=1e-10,
                          atol=1e-10, adjoint=ude.NoAdjoint())
    err = float(jnp.max(jnp.abs(sol_ex.ys - sol_truth.ys)))
    rel = err / float(jnp.max(jnp.abs(sol_truth.ys)))
    # long-horizon oscillators: sub-percent parameter error accumulates as
    # phase drift, so the pointwise error saturates at the orbit amplitude;
    # the meaningful generalization metric is the distance between ORBITS
    # (each extrapolated state vs the nearest truth state)
    d2 = jnp.sum((sol_ex.ys[:, None, :] - sol_truth.ys[None, :, :]) ** 2, -1)
    orbit = float(jnp.sqrt(jnp.max(jnp.min(d2, axis=1))))
    orbit_rel = orbit / float(jnp.max(jnp.abs(sol_truth.ys)))
    print(f"extrapolation to t=50: success={bool(sol_ex.success)}, "
          f"pointwise rel {rel:.4f} (phase drift), orbit rel "
          f"{orbit_rel:.4f}")
    rel = orbit_rel

    if plot:
        # figure analogues of scenario_1.jl's plots (trajectory fit, missing
        # term, losses, long-term forecast)
        from universal_differential_equations_tpu import viz

        outdir = Path(__file__).resolve().parent / "plots"
        viz.save(viz.plot_timeseries(
            ts, X_hat, labels=["x (UDE)", "y (UDE)"], data=X_noisy,
            data_label="noisy data", title="UDE approximation of the "
            "Lotka-Volterra data", ylabel="population"),
            outdir / "scenario_1_fit.pdf")
        true_inter = jax.vmap(
            lambda u: jnp.array([-lv.P_TRUE[1] * u[0] * u[1],
                                 lv.P_TRUE[2] * u[0] * u[1]]))(X_hat)
        viz.save(viz.plot_function_comparison(
            np.asarray(ts), np.asarray(nn_out), np.asarray(true_inter),
            labels=("NN", "true"), xlabel="t",
            title="learned missing interaction terms"),
            outdir / "scenario_1_missing_term.pdf")
        viz.save(viz.plot_loss_history(
            np.asarray(res1.losses), title="ADAM stage loss"),
            outdir / "scenario_1_loss.pdf")
        fig = viz.plot_timeseries(
            ts_ex, sol_truth.ys, labels=["x (truth)", "y (truth)"],
            title="recovered model extrapolated to t = 50",
            ylabel="population", train_end=t1f)
        ax = fig.axes[0]
        for i in range(2):
            ax.plot(np.asarray(ts_ex), np.asarray(sol_ex.ys)[:, i],
                    linestyle="--", linewidth=1.2, color=viz.SERIES[i],
                    alpha=0.9)
        viz.save(fig, outdir / "scenario_1_extrapolation.pdf")
        print(f"plots written to {outdir}")

    return dict(train_loss=float(res2.value), extrap_rel_err=rel,
                equations=res_sindy.equations(), train_seconds=train_s)


if __name__ == "__main__":
    main(quick=ARGS.quick, plot=ARGS.plot)
