"""LV scenario 1: automated identification of nonlinear interactions.

End-to-end reproduction of ``LotkaVolterra/scenario_1.jl`` on TPU:
truth at Vern7/1e-12 → 5e-3 mean-proportional noise → UDE with 2→5→5→5→2
RBF MLP learning the interaction terms → ADAM → BFGS → SINDy (poly deg 5 +
sin, STLSQ λ-sweep) → recovered-parameter refit → extrapolation to t = 50.

Run: python examples/lotka_volterra/scenario_1.py [--quick]
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
_ap.add_argument("--plot", action="store_true",
                 help="write the reference's figure analogues to ./plots/")
ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

import jax

if ARGS.x64:
    # must precede any module that materializes constants
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu import sindy as sd
from universal_differential_equations_tpu.models import lotka_volterra as lv
from universal_differential_equations_tpu.train import (
    bfgs_minimize,
    fit,
    levenberg_marquardt,
)
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

    # -- two-stage training (scenario_1.jl:111-118) + LM polish: BFGS line
    # searches stall a few× above the 5e-3-noise floor in f32, which leaves
    # enough NN error on-trajectory to blur the sparse recovery; the
    # Gauss-Newton step drives the fit to the floor in tens of iterations
    def residuals(params):
        r = (predict_fs(params) - X_noisy) / jnp.sqrt(1.0 * X_noisy.size)
        return r.ravel()

    def predict_fs(params):
        sol = ude.solve(
            ude.remake(prob0, args=params), ude.Tsit5(), saveat=ts,
            rtol=1e-6, atol=1e-6, adjoint=ude.ForwardSensitivity(),
        )
        return sol.ys

    t0 = time.time()
    res1 = fit(loss, params0, optax.adam(0.1), 100 if quick else 200,
               callback=lambda s, l, p: (print(f"  adam step {s}: loss {l:.6f}"), False)[1],
               callback_every=50)
    res2 = bfgs_minimize(loss, res1.params,
                         maxiters=300 if quick else 2000,
                         initial_stepnorm=0.01, gtol=1e-10)
    res_lm = levenberg_marquardt(residuals, res2.params,
                                 maxiters=30 if quick else 100)
    if float(res_lm.loss) < float(res2.value):
        res2 = res2._replace(params=res_lm.params,
                             value=jnp.asarray(res_lm.loss))
    train_s = time.time() - t0
    print(f"training: adam final {res1.final_loss:.6f} → bfgs "
          f"{float(res2.value):.8f} → LM {float(res_lm.loss):.8f} "
          f"in {train_s:.1f}s ({int(res2.iterations)} BFGS + "
          f"{int(res_lm.iterations)} LM iters)")

    # -- SINDy recovery on the learned interactions (scenario_1.jl:155-172)
    X_hat = predict(res2.params)
    nn_out = jax.vmap(lambda u: net.apply(res2.params, u))(X_hat)
    basis = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
    lams = tuple(10.0 ** e for e in np.arange(-3.0, 5.0, 0.05))  # exp10.(-3:5)
    res_sindy = sd.sindy(
        sd.DirectDataDrivenProblem(X_hat, nn_out), basis, sd.STLSQ(lams),
        normalize=True, sampler=sd.DataSampler(n=4, shuffle=True),
    )
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
    print(f"extrapolation to t=50: success={bool(sol_ex.success)}, "
          f"max abs err {err:.4f} (rel {rel:.4f})")

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
