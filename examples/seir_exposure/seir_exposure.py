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


def train_variant(tag, rhs, params0, ts, data, quick):
    """ADAM(0.01)→BFGS on the E,I,R rows (``seir_exposure.jl:77-96``)."""
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
    # Parsimony ladder with simulation validation.  The NN reconstruction
    # carries a few-percent *smooth* error that dense trig models can fit
    # consistently across CV folds, so held-out error alone over-selects
    # (and dense trig models diverge once the states leave the data range).
    # The reference accepted its sparse model by checking the simulation
    # (seir_exposure.jl:232-249); automated here: sweep the tolerance,
    # re-simulate each recovered model over the training window, keep the
    # sparsest one that reproduces E,I,R within 10%.
    truth_scale = float(jnp.abs(truth.ys[:, 1:4]).max())

    def sim_rel_err(res):
        rr = seir.make_recovered_rhs(res)
        s21 = ude.solve(
            rescale_problem(
                ude.ODEProblem(rr, seir.U0_NORM, (0.0, 21.0),
                               jnp.asarray(res.parameters())), SCALES
            ),
            ude.Tsit5(), saveat=ts, rtol=1e-6, atol=1e-8,
            adjoint=ude.NoAdjoint(), max_steps=1024,
        )
        ok = bool(s21.success) and bool(jnp.all(jnp.isfinite(s21.ys)))
        if not ok:
            return float("inf")
        ys = s21.ys / SCALES[None, :]
        return float(jnp.abs(ys[:, 1:4] - truth.ys[:, 1:4]).max()) / truth_scale

    candidates = []
    for tol in (25.0, 100.0, 400.0, 1600.0):
        r = sd.sindy(sd.DirectDataDrivenProblem(feats_h[1:], L_hat[1:, None]),
                     basis, sd.STLSQ(lams), normalize=True,
                     sampler=sd.DataSampler(4), cv_tolerance=tol,
                     exhaustive_k=2)
        if r.parameters().size == 0:
            continue
        candidates.append((int(r.sparsity[0]), sim_rel_err(r), tol, r))
    assert candidates, "UDE recovery must find a model"
    fitting = [c for c in candidates if c[1] < 0.10]
    chosen = min(fitting, key=lambda c: (c[0], c[1])) if fitting else \
        min(candidates, key=lambda c: c[1])
    k_sel, rel_sel, tol_sel, res_ude = chosen
    print(f"selection: k={k_sel} terms, train-window rel err {rel_sel:.3f} "
          f"(cv_tolerance {tol_sel:g}; "
          f"candidates {[(c[0], round(c[1], 3)) for c in candidates]})")
    print("ideal-recovery:", res_ideal.equations("dz")[0][:100])
    print("UDE-recovery:  ", res_ude.equations("dz")[0][:100])

    # recovered model extrapolation to day 60 (seir_exposure.jl:248-253)
    ts60 = jnp.arange(0.0, 60.1, 1.0)
    rec_rhs = seir.make_recovered_rhs(res_ude)
    rec_s = ude.solve(
        rescale_problem(
            ude.ODEProblem(rec_rhs, seir.U0_NORM, (0.0, 60.0),
                           jnp.asarray(res_ude.parameters())), SCALES
        ),
        ude.Tsit5(), saveat=ts60, rtol=1e-6, atol=1e-8, adjoint=ude.NoAdjoint(),
    )
    import dataclasses as _dc
    rec = _dc.replace(rec_s, ys=rec_s.ys / SCALES[None, :])
    truth60 = ude.solve(
        ude.ODEProblem(seir.corona_rhs, seir.U0_NORM, (0.0, 60.0), seir.P_SEIR),
        ude.Vern7(), saveat=ts60, rtol=1e-10, atol=1e-12, adjoint=ude.NoAdjoint(),
        max_steps=16384,
    )
    assert bool(truth60.success), "day-60 truth solve must converge"
    scale = float(jnp.abs(truth60.ys[:, 1:4]).max())
    err = float(jnp.abs(rec.ys[:, 1:4] - truth60.ys[:, 1:4]).max()) / scale
    print(f"recovered-model extrapolation to day 60: success={bool(rec.success)}, "
          f"rel err on E,I,R = {err:.3f}")
    if not quick:
        assert err < 0.5, f"recovered model must extrapolate (rel err {err:.2f})"

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

    return dict(extrap_rel_err=err)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="write seir_exposure.jl figure analogues")
    _a = ap.parse_args()
    main(quick=_a.quick, plot=_a.plot)
