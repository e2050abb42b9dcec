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
    # f32 data-gen tolerance: 1e-8 is the reliably-reachable f32 floor on
    # TPU (1e-10 marginally fails there) and is 6 orders below the 5e-3
    # noise that defines the problem; x64 runs keep the reference's 1e-12
    tol = 1e-8 if jnp.zeros(()).dtype == jnp.float32 else 1e-12
    ts, X_true, X_noisy = lv.generate_data(kd, rtol=tol, atol=tol)
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
    if not quick and jnp.zeros(()).dtype == jnp.float32:
        # full BFGS stage in float64 on the host CPU, straight from the ADAM
        # point (the reference's stage structure in the reference's dtype);
        # polishing a device-f32 BFGS result instead inherits whatever
        # basin the f32 line search stalled in (measured: 3.1e-5 vs 9.1e-6)
        cpu = jax.devices("cpu")[0]
        with jax.enable_x64(True), jax.default_device(cpu):
            to64 = lambda a: jnp.asarray(np.asarray(a), jnp.float64)
            ts64, X64 = to64(ts), to64(X_noisy)
            p64 = jax.tree.map(to64, res1.params)
            prob64 = ude.ODEProblem(rhs, X64[0], (0.0, t1f), p64)

            def loss64(p):
                sol = ude.solve(
                    ude.remake(prob64, args=p), ude.Tsit5(), saveat=ts64,
                    rtol=1e-8, atol=1e-8, adjoint=ude.InterpolatingAdjoint(),
                )
                return jnp.mean((sol.ys - X64) ** 2)

            res64 = bfgs_minimize(loss64, p64, maxiters=2000,
                                  initial_stepnorm=0.01, gtol=1e-12)
        to32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        res2 = res64._replace(params=jax.tree.map(to32, res64.params),
                              value=jnp.asarray(float(res64.value)))
    else:
        res2 = bfgs_minimize(loss, res1.params,
                             maxiters=300 if quick else 2000,
                             initial_stepnorm=0.01, gtol=1e-10)
    train_s = time.time() - t0
    print(f"training: adam final {res1.final_loss:.6f} → bfgs "
          f"{float(res2.value):.8f} in {train_s:.1f}s")

    # -- SINDy recovery on the learned interactions (scenario_1.jl:155-172).
    # (Library form of this machinery: sindy.best_per_support +
    # sindy.select_by_simulation — the vmap-traceable refit judge used by
    # run_loops.py and seir_exposure.py.  This flagship script keeps its
    # host-driven variant for the richer diagnostics it prints.)
    # The trained NN matches the true interactions only to a fraction of a
    # percent, but that residual is *structured*, so purely statistical
    # selection (CV folds, AICc) over-selects and near-collinear supports
    # tie.  Three-stage selection instead: (1) candidate supports from a
    # cv-tolerance ladder plus exhaustive small-support least squares,
    # (2) window re-simulation of every pair (vmapped) to shortlist,
    # (3) a vmapped per-support refit against the data — the wrong
    # structures stall ~200× above the noise floor, the true one reaches it.
    # This is the automated version of the reference's visual check.
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
    # inject EVERY 1-term least-squares fit plus the best 2-term fits:
    # statistics (CV/AICc) systematically over-select here because the NN's
    # structured few-percent deviation is fit consistently across folds, and
    # near-collinear terms (u1·u2 vs u1⁴·u2 on this orbit) tie on RSS — the
    # simulation judge below is what separates them, so it must see them all
    theta_f = np.asarray(basis.theta(X_hat), np.float64)
    Y_f = np.asarray(nn_out, np.float64)

    def lstsq_col(comb_idx, y):
        A = theta_f[:, comb_idx]
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        col = np.zeros(m)
        col[list(comb_idx)] = coef
        return col, float(((A @ coef - y) ** 2).sum())

    for e in (0, 1):
        by_k = {1: [], 2: []}
        for k in (1, 2):
            for comb_idx in itertools.combinations(range(m), k):
                col, rss = lstsq_col(comb_idx, Y_f[:, e])
                by_k[k].append((rss, comb_idx, col))
        # keep candidates that actually FIT the learned term: the short
        # training window under-determines the dynamics (a wrong term can
        # re-simulate the window well), so the regression residual is the
        # complementary filter — within 9× of the best per support size
        for k in (1, 2):
            ranked = sorted(by_k[k])
            rss_best = max(ranked[0][0], 1e-30)
            for rss, comb_idx, col in ranked[:8]:
                if rss <= 9.0 * rss_best and \
                        comb_idx not in [o[0] for o in opts[e]]:
                    opts[e].append((comb_idx, col))

    # one compiled dense-coefficient simulator scores every candidate pair
    alpha, delta = float(lv.P_TRUE[0]), float(lv.P_TRUE[3])
    data_scale = float(jnp.abs(X_noisy).max())

    def dense_rhs(t, u, C):
        term = basis.theta(u) @ C
        return jnp.array([alpha * u[0] + term[0], -delta * u[1] + term[1]])

    @jax.jit
    @jax.vmap
    def simulate_rel(C):
        sol_c = ude.solve(
            ude.ODEProblem(dense_rhs, u0, (t0f, t1f), C), ude.Tsit5(),
            saveat=ts, rtol=1e-6, atol=1e-6, adjoint=ude.NoAdjoint(),
            max_steps=1024,
        )
        rel = jnp.max(jnp.abs(sol_c.ys - X_noisy)) / data_scale
        return jnp.where(sol_c.success & jnp.isfinite(rel), rel, jnp.inf)

    pairs = [(k1, col1, k2, col2) for k1, col1 in opts[0]
             for k2, col2 in opts[1]]
    Cs = jnp.asarray(np.stack([np.stack([c1, c2], -1)
                               for _, c1, _, c2 in pairs]), jnp.float32)
    # ≤24 vmapped lanes per dispatch: larger single programs trip the TPU
    # runtime watchdog (same budget the 500-run ensemble uses); pad the tail
    # chunk so every dispatch reuses one compiled program
    n_pairs = Cs.shape[0]
    pad = (-n_pairs) % 24
    Cs_p = jnp.concatenate([Cs, jnp.zeros((pad, m, 2), Cs.dtype)]) if pad else Cs
    rels = np.concatenate([
        np.asarray(simulate_rel(Cs_p[i:i + 24]))
        for i in range(0, Cs_p.shape[0], 24)
    ])[:n_pairs]

    # shortlist by window simulation, then judge by REFIT loss: on a short
    # window, near-collinear wrong supports (−6.7·u1³·u2) can re-simulate
    # the data as well as the truth with their regression coefficients, but
    # once each support's coefficients are optimized against the data the
    # wrong structure stalls ~200× above the noise floor.  The refit is one
    # vmapped masked-BFGS over the dense coefficient matrices.
    order = np.argsort([(len(p[0]) + len(p[2])) + min(r, 1.0)
                        for p, r in zip(pairs, rels)])
    short = [i for i in order if np.isfinite(rels[i])
             and len(pairs[i][0]) + len(pairs[i][2]) <= 6][:16]
    if not short:
        raise SystemExit("no candidate pair simulated the training window — "
                         "train longer (run without --quick)")

    from universal_differential_equations_tpu.core.integrate import (
        integrate_fixed,
    )

    SUB = 4  # fixed Tsit5 substeps per save interval — the run_loops lane
    # solver: adaptive stepping inside vmapped BFGS builds programs big
    # enough to trip the TPU watchdog, and 4 substeps resolve the LV
    # dynamics below the f32 floor
    n_sub = (len(ts) - 1) * SUB

    @jax.jit
    @jax.vmap
    def refit_pair(C0):
        mask = (C0 != 0.0).astype(C0.dtype)

        def loss_pair(C):
            _, ys = integrate_fixed(dense_rhs, u0, t0f, t1f, C * mask,
                                    ude.Tsit5(), n_sub)
            return jnp.mean((ys[::SUB] - X_noisy) ** 2)

        r = bfgs_minimize(loss_pair, C0, maxiters=150,
                          initial_stepnorm=0.01)
        return r.value, r.params * mask

    refit_losses, refit_Cs = refit_pair(Cs[jnp.asarray(short)])
    refit_losses = np.asarray(refit_losses)

    def combine(col1, col2):
        coefs = np.stack([col1, col2], -1)
        act = coefs != 0.0
        return _dc.replace(
            base, coefficients=coefs, active=act,
            sparsity=act.sum(axis=0),
        )

    scored = []
    for j, i in enumerate(short):
        k1, col1, k2, col2 = pairs[i]
        scored.append((len(k1) + len(k2), float(refit_losses[j]),
                       float(rels[i]), (col1, col2)))
    print("shortlist (k, refit loss, window rel):",
          sorted((s[0], float(f"{s[1]:.3g}"), round(s[2], 3))
                 for s in scored)[:10])
    best_loss = min(s[1] for s in scored)
    fitting = [s for s in scored if s[1] <= 3.0 * best_loss]
    k_sel, loss_sel, rel_sel, cols_sel = min(
        fitting, key=lambda s: (s[0], s[1]))
    res_sindy = combine(*cols_sel)
    print(f"selection: {k_sel} active terms, refit loss {loss_sel:.3g}, "
          f"window rel {rel_sel:.3f} ({len(pairs)} pairs, "
          f"{len(short)} refit)")
    print("recovered interactions:")
    for eq in res_sindy.equations():
        print("  " + eq)

    # structure-uncertainty readout (sindy.stability_selection — M&B
    # subsample selection frequencies over the same (Θ(X̂), ŷ) regression;
    # a capability extension: the reference reports one support with no
    # uncertainty).  Diagnostic only — on this near-collinear degree-5
    # library the greedy STLSQ path can spread frequency across the
    # u1·u2 alias group (which is exactly what the readout exposes, and
    # why the simulation judge above makes the final call).
    skey = jax.random.PRNGKey(17)
    stab_lams = tuple(10.0 ** ee for ee in np.arange(-3.0, 2.0, 0.25))
    for e in (0, 1):
        freq = np.asarray(sd.stability_selection(
            jnp.asarray(theta_f, jnp.float32),
            jnp.asarray(Y_f[:, e], jnp.float32), sd.STLSQ(stab_lams),
            jax.random.fold_in(skey, e), n_subsets=64, frac=0.7,
            max_support=4))
        act = np.nonzero(np.asarray(res_sindy.active)[:, e])[0]
        tops = np.argsort(-freq)[:3]
        print(f"  eq{e + 1} subsample stability: selected "
              + ", ".join(f"{basis.names[i]}={freq[i]:.2f}" for i in act)
              + " | most stable library terms: "
              + ", ".join(f"{basis.names[i]}={freq[i]:.2f}" for i in tops))

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
    # a clamped tail would pass the finite/period checks untested
    assert bool(sol_ex.success), "recovered-model t=50 solve must finish"
    prob_truth = ude.ODEProblem(lv.lotka_rhs, u0, (0.0, 50.0), lv.P_TRUE)
    # f32-achievable truth tolerance: at rtol 1e-10 the f32 stepper burns
    # its step budget by t≈5 and the clamped tail silently poisons every
    # downstream comparison — always check sol.success on truth runs
    truth_tol = 1e-10 if jnp.zeros(()).dtype == jnp.float64 else 1e-8
    sol_truth = ude.solve(prob_truth, ude.Tsit5(), saveat=ts_ex,
                          rtol=truth_tol, atol=truth_tol,
                          adjoint=ude.NoAdjoint(), max_steps=16384)
    assert bool(sol_truth.success), "t=50 truth solve must converge"
    # What IS identifiable from this data — and what is not.  The refit
    # coefficients localize to ~0.5% (noise-limited: the f64 maximum-
    # likelihood fit of the true 2-parameter structure lands equally far).
    # But this orbit passes close to the axes, where LV level sets spread:
    # the far-lobe amplitude amplifies parameter error ~300×, so NO method
    # can recover the t→50 peak amplitude from this window+noise.  The
    # honest generalization checks: bounded periodic dynamics with the
    # correct structure, coefficients at the identifiability limit, and the
    # oscillation period.
    coef_err = float(np.max(np.abs(
        np.asarray(res3.params)[:2] / np.array(
            [-float(lv.P_TRUE[1]), float(lv.P_TRUE[2])]) - 1.0)))

    def mean_period(ys):
        x = np.asarray(ys[:, 0])
        pk = np.nonzero((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:]))[0]
        return float(np.diff(np.asarray(ts_ex)[pk + 1]).mean())

    finite = bool(jnp.all(jnp.isfinite(sol_ex.ys)))
    per_rec, per_tru = mean_period(sol_ex.ys), mean_period(sol_truth.ys)
    period_err = abs(per_rec - per_tru) / per_tru
    print(f"extrapolation to t=50: success={bool(sol_ex.success)}, "
          f"finite={finite}, coefficient err {coef_err:.3%}, "
          f"period {per_rec:.2f} vs truth {per_tru:.2f} "
          f"({period_err:.2%} off)")
    if not quick:
        assert finite and coef_err < 0.02 and period_err < 0.1
    rel = period_err

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
