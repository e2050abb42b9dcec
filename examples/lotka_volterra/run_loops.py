"""Noise-robustness recovery study: the 500-run ensemble, batched on TPU.

Reproduction of ``LotkaVolterra/run_loops.jl`` + ``loop_recoveries.jl`` +
``loop_evaluation.jl``.  The reference runs 500 *sequential* full recoveries
(fresh net init, ADAM→BFGS training, SINDy) with a noise schedule stepping
every 100 runs and try/catch fault isolation.  TPU-native design (SURVEY.md
§2.4 — "this is where the ≥20× target is won"): runs are lanes of vmapped
programs — all lanes advance in lockstep through jitted ADAM and BFGS rounds,
the SINDy sweeps are one batched gram/threshold/CV kernel, and fault
tolerance is finite-masking instead of exceptions.

The device programs are deliberately staged (ADAM stage, BFGS rounds of 250
iterations, recovery stage): a single monolithic 2000-iteration program trips
the TPU runtime watchdog.

Success metrics per noise level (``loop_evaluation.jl:30-35,102-130``):
* exact  — both equations recover exactly the {x·y} term,
* x*y    — both equations contain the x·y term (dominant physics found).

(Measured dead end, do not re-chase: at 5e-2 noise the x·y-found rate is
init-dependent per draw, but neither pick-by-final-loss — the lowest-loss
init can carry the *worst* interaction shape — nor ensemble-averaging the
learned term across 3 inits beats a single init.  Restarting lanes that
PASS the fit gate does not help; what DID lift 5e-2 exact from 9% to 50%
was the selection stage — per_size=2 ladders + exhaustive smallest-size
refits, refit_top=(4,2,2,2) — because the pre-refit ranking, not the
information content, was discarding the true structure.  Distinct from
that: re-initing lanes that FAIL the fit gate (the restart pass below)
rescues ~90% of them and lifted exact rates to 96/95/93/79/53%.

The oracle arm (``oracle_stage``) puts the same selection stage's ceiling
at ~100/100/100/100/95% on PERFECT training targets, so the residual
high-noise gap is field-estimation error of the trained NN, not selection.
Training-side closure attempts, all measured on 50 study lanes per level
(r4): x64-host float64 LM polish from the f32 end — no change (66→66% at
2.5e-2, 54→52% at 5e-2; the f32 stages already sit at the noise-dominated
loss floor); kernel-smoothing the data before the quasi-Newton rounds at
bandwidths 0.4/0.2/0.15, with and without a noisy-data LM finish — ALL
worse than base (best variant 48% vs 54% at 5e-2; the smoothing bias on
the LV peaks exceeds what the noise averaging buys).  Minimum-MSE fitting
of 31 samples at 5e-2 noise simply does not localize the field to
selection accuracy; a better estimator would need different statistics,
not a better optimizer.)

The weak-form arm (``weak_stage``) IS different statistics —
``sindy.weak_pair`` integral regression on the same noisy lanes, no
training at all — and it beats the trained pipeline at EVERY level:
exact 100/99/100/95/69 vs 96/95/93/79/53% (in 73 s for all 500 lanes).
The test-function windows are a multi-scale stack,
``widths=(9,13,17,21,25,29)`` (the ``build_stages(weak_widths=...)``
default): a single width-17 set of fifteen windows reached only
100/99/100/81/43% — its rows run out before the 31 samples run out of
signal — and single wider windows are WORSE (width 21: 65/32, width 25:
66/31 at the top two levels; over-smoothing loses the LV peaks), but
stacking scales adds rows that carry different quadrature bias, lifting
2.5e-2 81→95% and 5e-2 43→69% (sweep measured on the study's own lanes,
r4; 97/65 for a 7-width stack reaching the full window — the 6-stack
maximizes the hardest level).
The two estimators still fail on *different* lanes, so the combo arm
(``combo_stage``) plays each lane's two selected models off inside one
more simulation-refit judge (all four cross-equation combos, no training
gate), measured above BOTH arms at every level and near the oracle
ceiling (semantics pinned by ``tests/test_lv_pipeline.py::
test_combo_playoff_picks_true_structure_from_either_arm``; current rates
in README.md, archived per lane in ``results/loop_study.npz``).

The residual 5e-2 gap to the oracle ceiling (combo 79% vs 95%) is
MEASURED to be information-theoretic, not fixable machinery
(``--attribution`` + ``results/residual_attribution.json``): injecting
the true structure as an extra playoff candidate on every archived lane
(judge-oracle arm) reaches only 86% — on ~14% of lanes the noise
realization makes an adversarially-selected same-sparsity alias the
genuinely better trajectory explanation of the 31 samples.  Ruled out by
direct measurement on the same lanes: loss-band widening (1.3→3×: 86%
unchanged), out-of-sample holdout judging (81% — worse; smooth wrong
trajectories interpolate as well as they fit), three further weak-config
arms + a majority-vote candidate (achievable truth-offering union 88%,
but 4- and 5-candidate playoffs tie the 2-arm combo exactly at 79%).
The oracle's 95% is not a data-only bound — its candidates come from
perfect targets, which never spawn adversarial rivals.

Run: python examples/lotka_volterra/run_loops.py [--runs-per-level N]
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
from universal_differential_equations_tpu.io import KeyedArchive
from universal_differential_equations_tpu.models import lotka_volterra as lv
from universal_differential_equations_tpu.sindy.optimizers import STLSQ
from universal_differential_equations_tpu.core.integrate import integrate_fixed
from universal_differential_equations_tpu.train import bfgs_minimize, levenberg_marquardt
from universal_differential_equations_tpu.utils import enable_compilation_cache

enable_compilation_cache()

NOISE_LEVELS = (1e-3, 5e-3, 1e-2, 2.5e-2, 5e-2)  # run_loops.jl:40-46
LAMS = tuple(10.0 ** e for e in np.arange(-3.0, 5.0, 0.2))
# the reference protocol's SR3 sweep grid, exp10.(-7:0.1:7)
# (loop_recoveries.jl:102) — used by the SR3→STRRidge comparison arms.
# BOTH denoise settings run on every lane: denoise=true is the protocol as
# published (loop_recoveries.jl:107, SVHT shrinkage on Θ), denoise=false is
# the fairer reading on this 31-sample window (the median rule clips most
# of the spectrum) — the archive and README report both.
LAMS_SR3 = tuple(10.0 ** e for e in np.arange(-7.0, 7.01, 0.1))
BASIS = sd.polynomial_basis(2, 5) + sd.sin_basis(2)
I_XY = BASIS.names.index("u1*u2")
BFGS_ROUNDS = 4
BFGS_ITERS_PER_ROUND = 250  # watchdog-safe device-program length
LM_ROUNDS = 2
# The BFGS/LM split is the measured speed-quality frontier knob
# (benchmarks/lm_schedule.py; committed artifacts lm_schedule_r05*.json,
# all at 100/level on the TPU): 4:2 = 510 ms/run at the published rates;
# 2:3 = 384 ms with −5 pts exact at 1e-2 (±≤2 elsewhere); 1:4 = 300 ms
# with −12 pts at 1e-2; 0 BFGS rounds is catastrophic (LM needs the BFGS
# basin).  Sub-400 ms at UNCHANGED rates is not on this frontier — the
# 1e-2 basins genuinely need the quasi-Newton iterations — so the default
# stays 4:2 and the cheaper points are documented operating modes
# (main(bfgs_rounds=..., lm_rounds=...)).
K_SEL = 5  # parsimony-ladder rungs (support sizes 1..K_SEL) per equation
MAX_TOTAL_SUPPORT = 5
REFIT_ITERS = 8  # LM judge refit budget — measured knee (r5,
# benchmarks/refit_budget_r05.json): 8/12/16 iters give IDENTICAL exact
# rates at 20/level, and a full 500-lane study at 8 reproduces the
# published 96/95/93/79/53 exactly while cutting the recovery stage
# 129 -> 98 ms/lane (the refit losses converge before iteration 8 and
# the selection is deterministic in them)
REFIT_TOP = (4, 2, 2, 2)  # exhaustive smallest-size refits, top-2 above
CHUNK = 25  # lanes per dispatch (larger chunks trip the runtime watchdog)
RECOVER_CHUNK = 25  # recovery-stage lanes per dispatch: the LM judge's
# sequential depth (10 finalists × 12 parallel-Jacobian iters) is ~4× below
# the old 50-iter BFGS judge, so a full training chunk fits the watchdog
SUB = 4  # fixed Tsit5 substeps per save interval in the lane solver
HIST_STRIDE = 4  # archive every 4th training-loss sample (f16) per lane


def write_plots(exact, contains, c1, c2, noise, final_loss=None, err=None,
                aicc=None, loss_hist=None, exact_o=None, contains_o=None,
                exact_w=None, contains_w=None, exact_j=None):
    """`loop_evaluation.jl` figure analogues: per-noise-level success-rate
    bars (:120-126) and the recovered-coefficient spread vs the true values
    (re-plottable from the archive without retraining, like Plotfigs.jl).
    ``exact_o``/``contains_o``: optional oracle (identifiability-ceiling)
    rates drawn as caps over the trained-arm bars; ``exact_w``/
    ``contains_w``: optional weak-form (training-free) arm rates drawn as
    dots alongside them; ``exact_j``: optional judge-oracle rates (the
    playoff with truth injected — results/attribution.npz) drawn as x
    markers, the measured data-only selection limit."""
    from universal_differential_equations_tpu import viz

    def _with_arms(fig, rates_o, rates_w, rates_j=None):
        if rates_o is None and rates_w is None and rates_j is None:
            return fig
        ax = fig.axes[0]
        x = np.arange(len(noise))
        if rates_o is not None:
            r = 100.0 * np.asarray(rates_o, dtype=float)
            ax.plot(x, r, linestyle="none", marker="_", markersize=22,
                    markeredgewidth=1.8, color=viz.SERIES[1], zorder=5,
                    label="identifiability ceiling (oracle targets)")
        if rates_w is not None:
            r = 100.0 * np.asarray(rates_w, dtype=float)
            ax.plot(x, r, linestyle="none", marker="o", markersize=5,
                    color=viz.SERIES[2], zorder=5,
                    label="weak-form arm (training-free)")
        if rates_j is not None:
            r = 100.0 * np.asarray(rates_j, dtype=float)
            ax.plot(x, r, linestyle="none", marker="x", markersize=6,
                    markeredgewidth=1.6, color=viz.SERIES[3], zorder=5,
                    label="judge-oracle (truth offered) — data-only limit")
        ax.legend(fontsize=7, loc="lower left")
        return fig

    outdir = Path(__file__).resolve().parent / "plots"
    viz.save(_with_arms(viz.plot_success_rates(
        noise, exact.mean(axis=1), counts=exact.shape[1],
        title="exact {x·y} structural recovery"),
        None if exact_o is None else exact_o.mean(axis=1),
        None if exact_w is None else exact_w.mean(axis=1),
        None if exact_j is None else exact_j.mean(axis=1)),
        outdir / "loop_success_exact.pdf")
    viz.save(_with_arms(viz.plot_success_rates(
        noise, contains.mean(axis=1), counts=contains.shape[1],
        title="x·y term found (dominant physics)"),
        None if contains_o is None else contains_o.mean(axis=1),
        None if contains_w is None else contains_w.mean(axis=1)),
        outdir / "loop_success_contains.pdf")

    c1 = np.asarray(c1)
    c2 = np.asarray(c2)
    if c1.ndim == 2:  # full coefficient vectors; legacy archives stored x·y only
        cx1, cx2 = c1[:, I_XY], c2[:, I_XY]
    else:
        cx1, cx2 = c1, c2
    fig, ax = viz.new_figure(5.0, 3.2)
    n_levels = len(noise)
    per = cx1.size // n_levels
    rng = np.random.default_rng(0)
    for lvl in range(n_levels):
        seg1 = cx1.reshape(n_levels, per)[lvl]
        seg2 = cx2.reshape(n_levels, per)[lvl]
        keep = np.isfinite(seg1) & np.isfinite(seg2)
        xj = lvl + rng.uniform(-0.16, 0.16, keep.sum())
        ax.scatter(xj, seg1[keep], s=7, color=viz.SERIES[0], alpha=0.5,
                   edgecolors="none", label="ξ(ẋ: x·y)" if lvl == 0 else None)
        ax.scatter(xj, seg2[keep], s=7, color=viz.SERIES[1], alpha=0.5,
                   edgecolors="none", label="ξ(ẏ: x·y)" if lvl == 0 else None)
    for val, col in ((-float(lv.P_TRUE[1]), viz.SERIES[0]),
                     (float(lv.P_TRUE[2]), viz.SERIES[1])):
        ax.axhline(val, color=col, linewidth=0.9, linestyle="--", alpha=0.8)
    ax.set_xticks(range(n_levels))
    ax.set_xticklabels([f"{m:g}" for m in noise])
    ax.set_xlabel("noise magnitude")
    ax.set_ylabel("recovered x·y coefficient")
    ax.set_ylim(-2.0, 2.0)
    ax.set_title("recovered interaction coefficients (dashes = truth)")
    ax.legend(fontsize=8)
    viz.save(fig, outdir / "loop_coefficients.pdf")

    if final_loss is not None:
        # loop_evaluation.jl:152-190 analogue: final-training-loss spread per
        # noise level (failed lanes show as the high-loss tail)
        fig, ax = viz.new_figure(4.8, 3.2)
        fl = np.asarray(final_loss).reshape(n_levels, -1)
        rng2 = np.random.default_rng(1)
        for lvl in range(n_levels):
            vals = np.clip(fl[lvl], 1e-12, None)
            xj = lvl + rng2.uniform(-0.16, 0.16, vals.size)
            ax.scatter(xj, vals, s=7, color=viz.SERIES[0], alpha=0.45,
                       edgecolors="none")
            med = np.median(vals[np.isfinite(vals)])
            ax.plot([lvl - 0.25, lvl + 0.25], [med, med],
                    color=viz.SERIES[1], linewidth=1.6, zorder=4)
        ax.set_yscale("log")
        ax.set_xticks(range(n_levels))
        ax.set_xticklabels([f"{m:g}" for m in noise])
        ax.set_xlabel("noise magnitude")
        ax.set_ylabel("final training loss")
        ax.set_title("per-run final losses (bar = median)")
        viz.save(fig, outdir / "loop_losses.pdf")

    if err is not None and aicc is not None:
        # loop_evaluation.jl:37-61 analogue (get_error/get_aicc): per-run
        # recovered-model L2 regression error and AICc distributions per
        # noise level (2-norm over the two equations, like collect_results)
        fig, axes = viz.plt.subplots(1, 2, figsize=(7.6, 3.2))
        rng3 = np.random.default_rng(2)
        for ax2, vals_all, label, logy in (
                (axes[0], np.asarray(err), "recovered-model L2 error", True),
                (axes[1], np.asarray(aicc), "recovered-model AICc", False)):
            viz.style_axes(ax2)
            va = vals_all.reshape(n_levels, per)
            for lvl in range(n_levels):
                vals = va[lvl]
                keep = np.isfinite(vals)
                xj = lvl + rng3.uniform(-0.16, 0.16, keep.sum())
                ax2.scatter(xj, np.clip(vals[keep], 1e-12, None) if logy
                            else vals[keep], s=7, color=viz.SERIES[0],
                            alpha=0.45, edgecolors="none")
                if keep.any():
                    med = np.median(vals[keep])
                    ax2.plot([lvl - 0.25, lvl + 0.25], [med, med],
                             color=viz.SERIES[1], linewidth=1.6, zorder=4)
            if logy:
                ax2.set_yscale("log")
            ax2.set_xticks(range(n_levels))
            ax2.set_xticklabels([f"{m:g}" for m in noise])
            ax2.set_xlabel("noise magnitude")
            ax2.set_title(label, fontsize=9)
        fig.suptitle("per-run error metrics of the selected models "
                     "(bar = median)", fontsize=10)
        fig.tight_layout()
        viz.save(fig, outdir / "loop_err_aicc.pdf")

    if loss_hist is not None:
        # loop_evaluation.jl's training-loss spaghetti over the archived
        # per-run `losses` arrays (loop_recoveries.jl:52-57,137): every
        # lane's ADAM+BFGS loss trajectory, colored by noise level.  BFGS
        # rounds pad iterations past convergence with +inf — forward-fill
        # so converged lanes hold their final loss instead of vanishing.
        lh = np.asarray(loss_hist).astype(float).reshape(n_levels, per, -1)
        bad = ~np.isfinite(lh)
        idx = np.where(bad, 0, np.arange(lh.shape[-1]))
        np.maximum.accumulate(idx, axis=-1, out=idx)
        lh = np.take_along_axis(lh, idx, axis=-1)
        fig, ax = viz.new_figure(5.6, 3.4)
        iters = np.arange(lh.shape[-1]) * HIST_STRIDE  # archive stores ×4
        step = max(per // 20, 1)  # ≤20 traces per level keeps the PDF light
        for lvl in range(n_levels):
            col = viz.SERIES[lvl % len(viz.SERIES)]
            for r in range(0, per, step):
                tr = np.clip(lh[lvl, r], 1e-12, None)
                ax.plot(iters, tr, color=col, linewidth=0.6, alpha=0.35,
                        label=f"{noise[lvl]:g}" if r == 0 else None)
        n_adam = iters[-1] + HIST_STRIDE - BFGS_ROUNDS * BFGS_ITERS_PER_ROUND
        if 0 < n_adam <= iters[-1]:
            ax.axvline(n_adam, color="0.4", linewidth=0.8, linestyle=":")
            ax.text(n_adam, ax.get_ylim()[1], " ADAM→BFGS", fontsize=7,
                    va="top", color="0.35")
        ax.set_yscale("log")
        ax.set_xlabel("training iteration")
        ax.set_ylabel("loss")
        ax.set_title("per-run training-loss trajectories")
        ax.legend(fontsize=7, title="noise", ncol=2)
        viz.save(fig, outdir / "loop_loss_histories.pdf")

    if c1.ndim == 2 and c1.shape[1] == len(BASIS):
        # loop_evaluation.jl:37-61 sparsity extraction (get_sparsity):
        # recovered support-size distribution per noise level — exact
        # recoveries have 1 active term per equation
        ks = ((np.abs(c1) > 1e-12).sum(axis=1)
              + (np.abs(c2) > 1e-12).sum(axis=1)).reshape(n_levels, per)
        fig, ax = viz.new_figure(4.8, 3.2)
        kmax = int(ks.max())
        width = 0.8 / n_levels
        for lvl in range(n_levels):
            counts = np.bincount(ks[lvl], minlength=kmax + 1)[2:]
            ax.bar(np.arange(2, kmax + 1) + (lvl - n_levels / 2) * width,
                   counts / per, width=width,
                   color=viz.SERIES[lvl % len(viz.SERIES)],
                   label=f"{noise[lvl]:g}")
        ax.axvline(2.0 - 0.4, color="0.4", linewidth=0.8, linestyle=":")
        ax.set_xlabel("total recovered terms (truth = 2)")
        ax.set_ylabel("fraction of runs")
        ax.set_title("recovered support sizes per noise level")
        ax.legend(fontsize=7, title="noise", ncol=2)
        viz.save(fig, outdir / "loop_sparsity.pdf")

        # loop_evaluation.jl:194-216 analogue: simulate sampled recovered
        # models — exact recoveries vs failures — against the truth
        ts_g = jnp.linspace(0.0, 6.0, 121)
        truth = ude.solve(
            ude.ODEProblem(lv.lotka_rhs, lv.U0.astype(jnp.float32),
                           (0.0, 6.0), lv.P_TRUE),
            ude.Tsit5(), saveat=ts_g, rtol=1e-8, atol=1e-8,
            adjoint=ude.NoAdjoint())

        def simulate(row1, row2):
            def rec_rhs(t, u, _):
                th = BASIS.theta(u[None, :])[0]
                return jnp.stack([lv.P_TRUE[0] * u[0] + th @ row1,
                                  -lv.P_TRUE[3] * u[1] + th @ row2])
            s = ude.solve(ude.ODEProblem(rec_rhs, lv.U0.astype(jnp.float32),
                                         (0.0, 6.0), None),
                          ude.Tsit5(), saveat=ts_g, rtol=1e-6, atol=1e-6,
                          adjoint=ude.NoAdjoint(), max_steps=1024)
            return np.asarray(s.ys)

        flat_exact = np.asarray(exact).ravel().astype(bool)
        idx_ok = np.nonzero(flat_exact)[0][:3]
        idx_bad = np.nonzero(~flat_exact & np.isfinite(cx1))[0][:3]
        fig, axes = viz.plt.subplots(2, 3, figsize=(7.6, 4.6), sharex=True)
        for r, (tag, idxs) in enumerate((("exact recovery", idx_ok),
                                         ("failed recovery", idx_bad))):
            for ci, ax2 in enumerate(axes[r]):
                viz.style_axes(ax2)
                if ci >= len(idxs):
                    ax2.set_visible(False)
                    continue
                run = int(idxs[ci])
                ys = simulate(jnp.asarray(c1[run]), jnp.asarray(c2[run]))
                for j in range(2):
                    ax2.plot(np.asarray(ts_g), np.asarray(truth.ys)[:, j],
                             color=viz.SERIES[j], linewidth=2.0, alpha=0.3)
                    ax2.plot(np.asarray(ts_g), np.clip(ys[:, j], -10, 10),
                             color=viz.SERIES[j], linewidth=1.0,
                             linestyle="--")
                ax2.set_ylim(0, 8)
                ax2.set_title(f"{tag} (run {run})", fontsize=8)
        fig.suptitle("sampled recovered models vs truth "
                     "(solid = truth, dashed = recovered)", fontsize=10)
        fig.tight_layout()
        viz.save(fig, outdir / "loop_trajectories.pdf")
    print(f"plots written to {outdir}")


def build_stages(mesh=None, weak_widths=(9, 13, 17, 21, 25, 29),
                 bfgs_rounds=None, lm_rounds=None):
    """Construct the staged lane programs (train → judge → SR3 arms).

    ``mesh``: optional ``jax.sharding.Mesh`` (e.g.
    ``parallel.ensemble_mesh()``).  Lane chunks are sharded over the mesh's
    first axis (runs are independent, so there are no collectives — XLA
    simply places ``lanes / mesh.size`` lanes per device); parameters and
    results stay per-lane.  NOTE the partitioned program is a *different
    XLA program* than the single-device vmap one: per-lane f32 rounding can
    differ, and the reduced-budget training stages sit on marginal BFGS
    basins where that flips outcomes (CLAUDE.md) — the deterministic
    recovery stage is placement-invariant (measured: identical selections,
    coefficients to 1 ulp), asserted in ``tests/test_distributed.py``.  This is SURVEY.md §2.4's one warranted
    distributed capability — ensemble data parallelism — on the product
    surface (run_loops.jl:55-62's loop).

    Returns a namespace with the jitted stages, ``pipeline``, and the
    study's shared data/constants.
    """
    import types

    # None -> the module globals AT CALL TIME (tests monkeypatch them to
    # reduced budgets; def-time defaults would bypass the patching)
    bfgs_rounds = BFGS_ROUNDS if bfgs_rounds is None else bfgs_rounds
    lm_rounds = LM_ROUNDS if lm_rounds is None else lm_rounds

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        lane_sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        shard = lambda x: jax.device_put(x, lane_sharding)
    else:
        shard = lambda x: x
    ts, X, _ = lv.generate_data(jax.random.PRNGKey(0), rtol=1e-7, atol=1e-9)
    x_mean = jnp.mean(X, axis=0)

    rhs, params0, net = lv.make_ude(jax.random.PRNGKey(7))
    _, unravel = jax.flatten_util.ravel_pytree(params0)
    basis = BASIS
    i_xy = I_XY
    t_end = float(ts[-1])

    def make_data(key, mag):
        return X + mag * x_mean * jax.random.normal(key, X.shape)

    n_step = (len(ts) - 1) * SUB

    def lane_resid(theta, data):
        # fixed-step Tsit5: the adaptive machinery is latency-bound inside
        # lockstep BFGS lanes; 4 substeps per save interval resolves the LV
        # dynamics well below each lane's noise floor at ~6x the speed.
        # That claim is PINNED by tests/test_lv_pipeline.py::
        # test_lane_solver_contract_fixed_tsit5_matches_vern7 against
        # adaptive Vern7 at 1e-6 (the reference's training solver,
        # loop_recoveries.jl:31-47): ≤1e-5 deviation on the true field,
        # ≤25% of the lane's per-point noise perturbation on trained-lane
        # θ excursions archived by --theta-samples (measured: most ≤2e-4;
        # worst rough-field net 14% of its noise scale at 5e-2)
        _, ys = integrate_fixed(rhs, data[0], 0.0, t_end, unravel(theta),
                                ude.Tsit5(), n_step)
        return (ys[::SUB] - data).ravel()

    def mean_loss(theta, data):
        r = lane_resid(theta, data)
        return jnp.mean(r**2)

    @jax.jit
    @jax.vmap
    def adam_stage(key, mag, attempt):
        k_noise, k_init = jax.random.split(key)
        data = make_data(k_noise, mag)
        # restart attempts re-draw ONLY the net init — the lane's noisy
        # dataset (k_noise) is part of the run's identity and never changes;
        # attempt 0 reproduces the pre-restart study's KEY VALUES exactly
        # (trajectories can still drift on marginal BFGS basins whenever the
        # compiled program changes — CLAUDE.md; the re-validated full-study
        # rates, not bit-identity, are the ground truth)
        k_init = jnp.where(attempt == 0, k_init,
                           jax.random.fold_in(k_init, attempt))
        theta0 = jax.flatten_util.ravel_pytree(net.init(k_init))[0]
        opt = optax.adam(0.1)

        def step(carry, _):
            th, st = carry
            l, g = jax.value_and_grad(lambda t_: mean_loss(t_, data))(th)
            up, st = opt.update(g, st, th)
            return (optax.apply_updates(th, up), st), l

        (theta, _), ls = jax.lax.scan(step, (theta0, opt.init(theta0)), None,
                                      length=200)
        # ls: the reference archives each run's per-iteration `losses` array
        # (loop_recoveries.jl:52-57,137) — kept for the loop_evaluation.jl
        # spaghetti figure
        return theta, data, ls

    @jax.jit
    @jax.vmap
    def bfgs_round(theta, data):
        r = bfgs_minimize(lambda t_: mean_loss(t_, data), theta,
                          maxiters=BFGS_ITERS_PER_ROUND,
                          initial_stepnorm=0.01, gtol=1e-12)
        return (jax.flatten_util.ravel_pytree(r.params)[0], r.value,
                r.loss_history)

    @jax.jit
    @jax.vmap
    def lm_round(theta, data):
        r = levenberg_marquardt(lambda th: lane_resid(th, data), theta,
                                maxiters=60, max_stall=10)
        n_res = 2.0 * len(ts)
        return (jax.flatten_util.ravel_pytree(r.params)[0], r.loss / n_res)

    m = len(basis)
    masks1 = jnp.eye(m, dtype=bool)
    opt_s = STLSQ(LAMS)
    alpha, delta = float(lv.P_TRUE[0]), float(lv.P_TRUE[3])
    x_mean_sq = float(jnp.mean(x_mean**2))

    def dense_rhs(t, u, C):
        # recovered_dynamics! (scenario_1.jl:183-186): known linear terms
        # retained, sparse interactions from the dense coefficient matrix
        th = basis.theta(u[None, :])[0]
        return jnp.stack([alpha * u[0] + th @ C[:, 0],
                          -delta * u[1] + th @ C[:, 1]])

    @jax.jit
    @jax.vmap
    def recover_stage(theta, data, final_loss, mag):
        _, ys_fixed = integrate_fixed(rhs, data[0], 0.0, t_end,
                                      unravel(theta), ude.Tsit5(), n_step)
        Xh = ys_fixed[::SUB]
        Yh = jax.vmap(lambda u: net.apply(unravel(theta), u))(Xh)
        theta_feat = basis.theta(Xh)

        def ladder(y):
            """Top-2 distinct-support candidates per support size 1..K_SEL,
            CV-scored (library form: sindy.cv_ladder; exhaustive support-1
            fits appended because greedy thresholding cannot un-cancel
            collinear groups).  per_size=2 keeps the runner-up structure:
            at mid noise the CV-best single term is sometimes a near-alias
            of x·y, and only the refit judge can separate them."""
            return sd.cv_ladder(theta_feat, y, opt_s, K_SEL, per_size=2,
                                extra_supports=masks1)

        # CV ranks candidates *within* each support size; the cross-size
        # choice is made by re-simulating every rung pair through the ODE
        # and REFIT-judging one finalist per total support size
        # (sindy/select.py — the automated version of the reference's
        # visual check, scenario_1.jl:193-207): wrong structures stall far
        # above the noise floor mag²·E[x̄²] once their coefficients are
        # optimized against the data, the true one reaches it.  refit_top=2
        # judges BOTH top pre-refit combos per total size, so a same-size
        # alias ranked first by the biased pre-refit error cannot hide the
        # truth.  k=2 refits exhaustively (all 4 size-1×size-1 combos):
        # the 1e-2 diagnostic showed the exact structure in-band but ranked
        # 3rd/4th pre-refit in every contains-but-not-exact lane.  Budget:
        # 10 finalists × 12 LM iters per lane (the LM judge batches its
        # Jacobian tangents in parallel, so it needs ~4x fewer *sequential*
        # sims than the 50-iter BFGS judge it replaced — same selections,
        # measured identical rates at 20/level).
        sizes_r = jnp.repeat(jnp.arange(1, K_SEL + 1), 2)
        C_sel, rel, _ = sd.select_by_simulation(
            [ladder(Yh[:, 0]), ladder(Yh[:, 1])], dense_rhs, data[0],
            0.0, t_end, data, ude.Tsit5(), n_step, sub=SUB,
            rel_factor=1.5, max_rel=1.0, refit_iters=REFIT_ITERS,
            loss_floor=1.3 * mag**2 * x_mean_sq + 1e-7,
            max_total_support=MAX_TOTAL_SUPPORT, sizes=[sizes_r, sizes_r],
            refit_top=REFIT_TOP, refit_method="lm")
        act1 = C_sel[:, 0] != 0.0
        act2 = C_sel[:, 1] != 0.0
        want = jnp.zeros(m, bool).at[i_xy].set(True)
        # "trained" gate: the mean-squared residual of a perfect fit against
        # noisy data is the noise floor mag²·E[x̄²] — the old absolute 1e-3
        # cut rejected true recoveries at 5e-2 noise where the floor is
        # ~1.6e-2 (run_loops.jl counts a run failed only if training threw)
        fit_ok = jnp.isfinite(final_loss) & (
            final_loss < jnp.maximum(1e-3, 4.0 * mag**2 * x_mean_sq))
        exact = jnp.all(act1 == want) & jnp.all(act2 == want) & fit_ok
        contains = act1[i_xy] & act2[i_xy] & fit_ok

        # per-run recovered-model L2 error and AICc of the selected model
        # (get_error/get_aicc, loop_evaluation.jl:54-56: per-equation
        # regression residual of the recovered coefficients on (Θ(X̂), Ŷ),
        # aggregated by 2-norm over the two equations; AICc is the
        # least-squares form n·log(rss/n) + 2k + 2k(k+1)/(n−k−1))
        n_pts = theta_feat.shape[0]
        resid = theta_feat @ C_sel - Yh  # (N, 2)
        rss = jnp.sum(resid**2, axis=0)
        k_eq = jnp.stack([act1.sum(), act2.sum()]).astype(rss.dtype)
        err_l2 = jnp.linalg.norm(jnp.sqrt(rss))
        aicc_eq = (n_pts * jnp.log(rss / n_pts + 1e-30) + 2.0 * k_eq
                   + 2.0 * k_eq * (k_eq + 1.0)
                   / jnp.maximum(n_pts - k_eq - 1.0, 1.0))
        aicc = jnp.linalg.norm(aicc_eq)

        # Comparison arms — the reference's own two-stage protocol on the
        # SAME lane (same trained net, same data): SR3 λ-sweep scored by
        # g(x) = x[1] < 1 ? Inf : ‖(L0, L2err)‖₂, structure freeze,
        # STRRidge(0.01) refit (loop_recoveries.jl:100-125) — once with the
        # published denoise=true (loop_recoveries.jl:107) and once without.
        def sr3_arm(denoise):
            C = sd.two_stage_recovery(theta_feat, Yh, LAMS_SR3,
                                      denoise=denoise)
            a1, a2 = C[:, 0] != 0.0, C[:, 1] != 0.0
            ex = jnp.all(a1 == want) & jnp.all(a2 == want) & fit_ok
            co = a1[i_xy] & a2[i_xy] & fit_ok
            return ex, co, C[:, 0], C[:, 1]

        exact_sr3, contains_sr3, c1_sr3, c2_sr3 = sr3_arm(False)
        exact_sr3d, contains_sr3d, c1_sr3d, c2_sr3d = sr3_arm(True)
        return (exact, contains, fit_ok, C_sel[:, 0], C_sel[:, 1],
                exact_sr3, contains_sr3, c1_sr3, c2_sr3,
                exact_sr3d, contains_sr3d, c1_sr3d, c2_sr3d,
                err_l2, aicc)

    beta, gamma = float(lv.P_TRUE[1]), float(lv.P_TRUE[2])

    @jax.jit
    @jax.vmap
    def oracle_stage(key, mag):
        """Identifiability-ceiling arm: the SAME selection stage (CV ladder
        + LM simulation-refit judge, identical budgets) fed PERFECT training
        targets — the true missing terms (−β·x·y, +γ·x·y) evaluated on the
        lane's own noisy samples.  Training error is eliminated; what limits
        this arm is only the information content of the 31 noisy samples, so
        its per-level exact rate is the ceiling the trained arm is scored
        against ("X% of a Y% ceiling").  The reference never computes such a
        bound — its rates exist only at runtime (loop_evaluation.jl:102-130).
        """
        k_noise, _ = jax.random.split(key)  # same lane data as adam_stage
        data = make_data(k_noise, mag)
        Xh = data
        Yh = jax.vmap(lambda u: jnp.stack([-beta * u[0] * u[1],
                                           gamma * u[0] * u[1]]))(Xh)
        theta_feat = basis.theta(Xh)

        def ladder(y):
            return sd.cv_ladder(theta_feat, y, opt_s, K_SEL, per_size=2,
                                extra_supports=masks1)

        sizes_r = jnp.repeat(jnp.arange(1, K_SEL + 1), 2)
        C_sel, _, _ = sd.select_by_simulation(
            [ladder(Yh[:, 0]), ladder(Yh[:, 1])], dense_rhs, data[0],
            0.0, t_end, data, ude.Tsit5(), n_step, sub=SUB,
            rel_factor=1.5, max_rel=1.0, refit_iters=REFIT_ITERS,
            loss_floor=1.3 * mag**2 * x_mean_sq + 1e-7,
            max_total_support=MAX_TOTAL_SUPPORT, sizes=[sizes_r, sizes_r],
            refit_top=REFIT_TOP, refit_method="lm")
        act1 = C_sel[:, 0] != 0.0
        act2 = C_sel[:, 1] != 0.0
        want = jnp.zeros(m, bool).at[i_xy].set(True)
        exact = jnp.all(act1 == want) & jnp.all(act2 == want)
        contains = act1[i_xy] & act2[i_xy]
        return exact, contains, C_sel[:, 0], C_sel[:, 1]

    def make_weak_stage(widths, p=5):
        """Factory for weak-form (training-free) arms: ``sindy.weak_pair``
        moves the derivative onto compactly supported test functions
        (Messenger & Bortz weak SINDy; see ``sindy/weak.py``), with the
        UDE's retained linear physics (α·x, −δ·y) on the target side, then
        the SAME CV-ladder + LM-simulation-judge selection as the trained
        arm.  No NN, no optimizer — each lane is two small matmuls plus
        the judge.  This is the "different statistics" answer to the
        measured high-noise training gap (module docstring): the weak rows
        average the sample noise over whole test windows instead of
        carrying it through a field fit.  The reference has no analogue
        (its loop regresses pointwise NN outputs,
        loop_recoveries.jl:91-128).  Different (widths, p) configurations
        carry different quadrature bias and fail on different lanes — the
        diversity the playoff exploits."""
        @jax.jit
        @jax.vmap
        def weak_stage(key, mag):
            k_noise, _ = jax.random.split(key)  # same lane data
            data = make_data(k_noise, mag)
            G, B = sd.weak_pair(
                ts, data, basis,
                lambda u: jnp.stack([alpha * u[0], -delta * u[1]]),
                widths=widths, p=p)

            def ladder(y):
                return sd.cv_ladder(G, y, opt_s, K_SEL, per_size=2,
                                    extra_supports=masks1)

            sizes_r = jnp.repeat(jnp.arange(1, K_SEL + 1), 2)
            C_sel, _, _ = sd.select_by_simulation(
                [ladder(B[:, 0]), ladder(B[:, 1])], dense_rhs, data[0],
                0.0, t_end, data, ude.Tsit5(), n_step, sub=SUB,
                rel_factor=1.5, max_rel=1.0, refit_iters=REFIT_ITERS,
                loss_floor=1.3 * mag**2 * x_mean_sq + 1e-7,
                max_total_support=MAX_TOTAL_SUPPORT, sizes=[sizes_r, sizes_r],
                refit_top=REFIT_TOP, refit_method="lm")
            act1 = C_sel[:, 0] != 0.0
            act2 = C_sel[:, 1] != 0.0
            want = jnp.zeros(m, bool).at[i_xy].set(True)
            exact = jnp.all(act1 == want) & jnp.all(act2 == want)
            contains = act1[i_xy] & act2[i_xy]
            return exact, contains, C_sel[:, 0], C_sel[:, 1]

        return weak_stage

    weak_stage = make_weak_stage(weak_widths)

    def _playoff_body(key, mag, cands1, cands2):
        """Cross-arm playoff core: ``cands1``/``cands2`` are (n_cand, m)
        stacked per-equation candidate coefficient vectors (one row per
        estimator arm); all n_cand² cross-equation combos enter ONE
        simulation-refit judge (``refit_all=True``) — the judge that
        already separates structures inside each arm also decides *between*
        the estimators, per lane, with no new machinery.  No training
        gate: when a lane's training went bad its trained candidate loses
        the playoff — usually by refit loss, though the judge's usual
        rules still apply (combos above ``max_total_support`` are gated
        out, and within the loss band the sparser structure wins)."""
        k_noise, _ = jax.random.split(key)  # same lane data as adam_stage
        data = make_data(k_noise, mag)
        n_cand = cands1.shape[0]
        cand1 = (cands1, jnp.ones((n_cand,), bool))
        cand2 = (cands2, jnp.ones((n_cand,), bool))
        sizes1 = (cands1 != 0.0).sum(axis=1)
        sizes2 = (cands2 != 0.0).sum(axis=1)
        C_sel, _, _ = sd.select_by_simulation(
            [cand1, cand2], dense_rhs, data[0], 0.0, t_end, data,
            ude.Tsit5(), n_step, sub=SUB, rel_factor=1.5, max_rel=1.0,
            refit_iters=REFIT_ITERS,
            loss_floor=1.3 * mag**2 * x_mean_sq + 1e-7,
            max_total_support=MAX_TOTAL_SUPPORT, sizes=[sizes1, sizes2],
            refit_all=True, refit_method="lm")
        act1 = C_sel[:, 0] != 0.0
        act2 = C_sel[:, 1] != 0.0
        want = jnp.zeros(m, bool).at[i_xy].set(True)
        exact = jnp.all(act1 == want) & jnp.all(act2 == want)
        contains = act1[i_xy] & act2[i_xy]
        return exact, contains, C_sel[:, 0], C_sel[:, 1]

    # n-candidate form: extras = stacked (n_runs, n_cand, m) per equation
    playoff_stage = jax.jit(jax.vmap(_playoff_body))

    @jax.jit
    @jax.vmap
    def combo_stage(key, mag, c1_t, c2_t, c1_w, c2_w):
        """Two-arm playoff (trained vs weak) — see ``_playoff_body``."""
        return _playoff_body(key, mag, jnp.stack([c1_t, c1_w]),
                             jnp.stack([c2_t, c2_w]))

    probe_stats = {}

    def pipeline(keys_c, mags_c, attempt=0, probe=False):
        """One lane-chunk through the full train→recover pipeline; returns
        the per-chunk archive tuple (rec fields + final loss).

        ``probe=True`` adds per-stage sync points and measures the tunnel's
        null-dispatch round trip, writing a device-compute vs dispatch-
        latency attribution of the chunk into ``probe_stats`` (read as
        ``st.probe_stats`` after the call; the steady-state probe — the
        second computed chunk — is what the benchmark row archives)."""
        if probe:
            # null-dispatch RTT: a cached trivial program round trip — the
            # per-dispatch cost the tunnel adds regardless of compute
            # (CLAUDE.md: drifts 24-69 ms between sessions, so it must be
            # measured HERE, not assumed)
            null = jax.jit(lambda x: x + 1.0)
            jax.block_until_ready(null(jnp.zeros(())))
            t_n = time.time()
            for _ in range(10):
                jax.block_until_ready(null(jnp.zeros(())))
            rtt = (time.time() - t_n) / 10
        t_s = time.time()
        keys_c, mags_c = shard(keys_c), shard(mags_c)
        att = shard(jnp.full((keys_c.shape[0],), attempt, jnp.int32))
        theta, data, hist_a = adam_stage(keys_c, mags_c, att)
        if probe:
            jax.block_until_ready(theta)
            t_adam, t_s = time.time() - t_s, time.time()
        loss = jnp.full((theta.shape[0],), jnp.inf, jnp.float32)
        hists = [hist_a]
        for _ in range(bfgs_rounds):
            theta, loss, h = bfgs_round(theta, data)
            hists.append(h)
        # per-lane ADAM+BFGS loss trajectory (the reference's archived
        # `losses` arrays); +inf marks iterations past a round's convergence.
        # Stored strided ×HIST_STRIDE in f16: the committed full-study
        # archive stays ~1.5 MB instead of 12, and the log-scale spaghetti
        # figure cannot resolve the difference.
        hist = jnp.concatenate(hists, axis=1)[:, ::HIST_STRIDE]
        # clamp finite samples below f16 max before the cast: an early-ADAM
        # loss above 65504 would overflow to +inf, which is this array's
        # past-convergence padding sentinel — the plot's forward-fill must
        # not mistake a huge-but-real early loss for padding
        hist = jnp.where(jnp.isfinite(hist),
                         jnp.minimum(hist, 6.5e4), jnp.inf)
        hist = hist.astype(jnp.float16)
        if probe:
            jax.block_until_ready(theta)
            t_bfgs, t_s = time.time() - t_s, time.time()
        for _ in range(lm_rounds):
            theta, loss = lm_round(theta, data)
        if probe:
            jax.block_until_ready(theta)
            t_lm, t_s = time.time() - t_s, time.time()
        # the recovery stage carries more refit work per lane than a
        # training round, so it can dispatch in watchdog-safe slices
        parts = [recover_stage(theta[r0:r0 + RECOVER_CHUNK],
                               data[r0:r0 + RECOVER_CHUNK],
                               loss[r0:r0 + RECOVER_CHUNK],
                               mags_c[r0:r0 + RECOVER_CHUNK])
                 for r0 in range(0, theta.shape[0], RECOVER_CHUNK)]
        rec = tuple(jnp.concatenate([p[i] for p in parts])
                    for i in range(len(parts[0])))
        if probe:
            jax.block_until_ready(rec[0])
            n_l = theta.shape[0]
            t_rec = time.time() - t_s
            total = t_adam + t_bfgs + t_lm + t_rec
            # dispatch attribution: the chunk issues 1 adam + BFGS_ROUNDS +
            # LM_ROUNDS + ceil(n/RECOVER_CHUNK) device programs; each pays
            # ~one null RTT of tunnel latency (host runahead can hide part
            # of it, so this bounds dispatch cost from above and device
            # share from below)
            n_disp = (1 + bfgs_rounds + lm_rounds
                      + -(-n_l // RECOVER_CHUNK))
            disp = n_disp * rtt
            probe_stats.update(
                rtt_ms=round(rtt * 1e3, 1), n_dispatches=n_disp,
                chunk_wall_s=round(total, 2), lanes=n_l,
                dispatch_s=round(disp, 2),
                device_time_share=round(1.0 - disp / total, 3),
                stage_walls_ms_per_lane=dict(
                    adam=round(t_adam / n_l * 1e3),
                    bfgs=round(t_bfgs / n_l * 1e3),
                    lm=round(t_lm / n_l * 1e3),
                    recover=round(t_rec / n_l * 1e3)))
            print(f"  stage walls ({n_l} lanes, ms/lane): "
                  f"adam {t_adam / n_l * 1e3:.0f}, "
                  f"bfgs {t_bfgs / n_l * 1e3:.0f}, "
                  f"lm {t_lm / n_l * 1e3:.0f}, "
                  f"recover {t_rec / n_l * 1e3:.0f} | "
                  f"null RTT {rtt * 1e3:.0f} ms x {n_disp} dispatches "
                  f"-> device share >= "
                  f"{probe_stats['device_time_share']:.0%}",
                  flush=True)
        return rec + (hist, loss)

    return types.SimpleNamespace(
        ts=ts, X=X, x_mean=x_mean, shard=shard, weak_widths=weak_widths,
        adam_stage=adam_stage, bfgs_round=bfgs_round, lm_round=lm_round,
        recover_stage=recover_stage, oracle_stage=oracle_stage,
        weak_stage=weak_stage, make_weak_stage=make_weak_stage,
        combo_stage=combo_stage, playoff_stage=playoff_stage,
        pipeline=pipeline, probe_stats=probe_stats)


def sample_thetas(per_level=5, runs_per_level=100,
                  out="lane_theta_samples.npz"):
    """Train the study's first ``per_level`` lanes per noise level (the SAME
    keys the 500-run study uses) and archive their trained parameter
    vectors + noisy initial states.  The default 5/level makes a 25-lane
    batch — exactly the study's compiled CHUNK shape, so the stage programs
    come straight from the XLA cache.  These are the actual trained-lane
    parameter excursions ``tests/test_lv_pipeline.py``'s lane-solver
    contract test integrates through — pinning that fixed-step Tsit5 at
    SUB=4 matches adaptive Vern7 at 1e-6 (the reference's training solver,
    loop_recoveries.jl:31-47) on the parameters training actually visits,
    not just on the true LV field."""
    st = build_stages()
    n_levels = len(NOISE_LEVELS)
    keys = jax.random.split(jax.random.PRNGKey(42),
                            n_levels * runs_per_level)
    idx = np.concatenate([np.arange(l * runs_per_level,
                                    l * runs_per_level + per_level)
                          for l in range(n_levels)])
    mags = jnp.repeat(jnp.asarray(NOISE_LEVELS, jnp.float32), per_level)
    att = jnp.zeros((idx.size,), jnp.int32)
    theta, data, _ = st.adam_stage(keys[jnp.asarray(idx)], mags, att)
    loss = None
    for _ in range(BFGS_ROUNDS):
        theta, loss, _ = st.bfgs_round(theta, data)
    for _ in range(LM_ROUNDS):
        theta, loss = st.lm_round(theta, data)
    path = Path(__file__).parent / "results" / out
    np.savez(path, theta=np.asarray(theta), mag=np.asarray(mags),
             u0=np.asarray(data[:, 0, :]), loss=np.asarray(loss),
             lane=idx)
    print(f"archived {idx.size} trained-lane parameter draws to {path}")
    print("  final losses:", np.round(np.asarray(loss), 5))


def attribution(chunk=CHUNK):
    """Judge-oracle attribution of the residual high-noise combo gap: run
    the SAME cross-arm playoff over the archived 500 study lanes with the
    TRUE structure injected as a third candidate per equation (support
    {x·y}, coefficients −β/+γ — the judge refits them anyway).  Per level
    this measures P(judge picks truth | truth is offered):

    * judge-oracle exact ≈ the oracle ceiling → the judge is NOT the
      limiter; the combo residual is estimator diversity (on the failing
      lanes neither the trained nor the weak arm OFFERED the truth).
    * judge-oracle exact ≪ ceiling → the judge's loss-band statistics are
      the limiter even when truth is on the table.

    Requires a completed study archive (``results/loop_study.npz`` with the
    weak/combo fields).  Results archived to ``results/attribution.npz``.
    Reference anchor: loop_evaluation.jl:102-130 (which never separates
    these failure modes — its rates exist only at runtime)."""
    res_dir = Path(__file__).parent / "results"
    z = np.load(res_dir / "loop_study.npz")
    c1_t, c2_t = np.asarray(z["coef1"]), np.asarray(z["coef2"])
    c1_w, c2_w = np.asarray(z["coef1_weak"]), np.asarray(z["coef2_weak"])
    exact_c = np.asarray(z["exact_combo"])
    exact_o = np.asarray(z["exact_oracle"])
    n_levels, runs_per_level = exact_c.shape
    n_runs = n_levels * runs_per_level
    m = len(BASIS)
    st = build_stages()
    tr1 = np.zeros(m, np.float32)
    tr1[I_XY] = -float(lv.P_TRUE[1])
    tr2 = np.zeros(m, np.float32)
    tr2[I_XY] = float(lv.P_TRUE[2])
    # non-finite candidates (a lane whose arm never produced a model) are
    # zeroed: a zero candidate has support 0 < 1 per equation and its combos
    # lose to any finite structure by refit loss
    c1_t = np.where(np.isfinite(c1_t), c1_t, 0.0).astype(np.float32)
    c2_t = np.where(np.isfinite(c2_t), c2_t, 0.0).astype(np.float32)
    cands1 = np.stack([c1_t, c1_w,
                       np.broadcast_to(tr1, c1_t.shape)], axis=1)
    cands2 = np.stack([c2_t, c2_w,
                       np.broadcast_to(tr2, c2_t.shape)], axis=1)
    keys = jax.random.split(jax.random.PRNGKey(42), n_runs)
    mags = jnp.repeat(jnp.asarray(NOISE_LEVELS, jnp.float32), runs_per_level)
    t0 = time.time()
    outs = []
    for c0 in range(0, n_runs, chunk):
        idx = jnp.arange(c0, min(c0 + chunk, n_runs))
        out = st.playoff_stage(keys[idx], mags[idx],
                               jnp.asarray(cands1)[idx],
                               jnp.asarray(cands2)[idx])
        jax.block_until_ready(out[0])
        outs.append(tuple(np.asarray(o) for o in out))
        print(f"  attribution {min(c0 + chunk, n_runs)}/{n_runs} lanes "
              f"({time.time() - t0:.0f}s)", flush=True)
    ex = np.concatenate([o[0] for o in outs]).reshape(n_levels,
                                                      runs_per_level)
    co = np.concatenate([o[1] for o in outs]).reshape(n_levels,
                                                      runs_per_level)
    np.savez(res_dir / "attribution.npz", exact=ex, contains=co,
             coef1=np.concatenate([o[2] for o in outs]),
             coef2=np.concatenate([o[3] for o in outs]),
             noise=np.asarray(NOISE_LEVELS),
             exact_combo=exact_c, exact_oracle=exact_o)
    print("judge-oracle attribution (truth injected as a 3rd playoff "
          "candidate on every archived lane):")
    print(f"{'noise':>8} | {'judge-oracle':>12} | {'combo':>6} | "
          f"{'ceiling':>7} | verdict")
    for lvl, mag in enumerate(NOISE_LEVELS):
        jo, cb, ce = ex[lvl].mean(), exact_c[lvl].mean(), exact_o[lvl].mean()
        verdict = ("judge ok -> diversity gap" if jo >= ce - 0.02
                   else "judge is the limiter")
        print(f"{mag:8.0e} | {jo:12.1%} | {cb:6.1%} | {ce:7.1%} | {verdict}")
    print(f"archived to {res_dir/'attribution.npz'} "
          f"({time.time() - t0:.0f}s)")
    return ex, co


def main(runs_per_level=100, plot=False, resume=True, archive=True,
         mesh=None, chunk=CHUNK, assert_gates=True, oracle=True, weak=True,
         bfgs_rounds=None, lm_rounds=None):
    """Drive the full noise-robustness study; see :func:`build_stages` for
    the mesh semantics.  ``chunk`` must divide by the mesh size.
    ``bfgs_rounds``/``lm_rounds`` override the training schedule (the
    LM-first throughput experiment's knob — benchmarks/lm_schedule.py)."""
    bfgs_rounds = BFGS_ROUNDS if bfgs_rounds is None else bfgs_rounds
    lm_rounds = LM_ROUNDS if lm_rounds is None else lm_rounds
    n_levels = len(NOISE_LEVELS)
    n_runs = n_levels * runs_per_level
    if mesh is not None:
        assert chunk % mesh.size == 0, (
            f"chunk {chunk} must be a multiple of the mesh size {mesh.size}")
    st = build_stages(mesh, bfgs_rounds=bfgs_rounds, lm_rounds=lm_rounds)
    pipeline = st.pipeline
    noise_mags = jnp.repeat(jnp.asarray(NOISE_LEVELS, jnp.float32),
                            runs_per_level)
    keys = jax.random.split(jax.random.PRNGKey(42), n_runs)

    print(f"{n_runs} recoveries ({n_levels} levels × {runs_per_level}); "
          f"chunks of {chunk} lanes"
          + (f" sharded over {mesh.size} devices" if mesh is not None else "")
          + f", {bfgs_rounds}×{BFGS_ITERS_PER_ROUND} BFGS + "
          f"{lm_rounds} LM rounds", flush=True)
    if (bfgs_rounds, lm_rounds) != (BFGS_ROUNDS, LM_ROUNDS):
        # chunk archives do not encode the schedule: a non-default run must
        # neither write checkpoints a default study would pick up NOR
        # resume default-schedule chunks as its own results
        assert not archive, "schedule overrides require archive=False"
        assert not resume, "schedule overrides require resume=False"
    # Per-chunk group-append checkpointing (loop_recoveries.jl:132-140 —
    # the reference appends each run to the shared JLD2 inside the loop, so
    # a killed study resumes where it stopped; our unit is the lane chunk).
    arch = KeyedArchive(Path(__file__).parent / "results")
    chunk_keys = ("exact", "contains", "fit_ok", "coef1", "coef2",
                  "exact_sr3", "contains_sr3", "coef1_sr3", "coef2_sr3",
                  "exact_sr3d", "contains_sr3d", "coef1_sr3d", "coef2_sr3d",
                  "err", "aicc", "loss_hist", "loss")
    t0 = time.time()
    results = []
    chunk_marks = []  # cumulative seconds at each computed chunk's completion
    for c0 in range(0, n_runs, chunk):
        gname = f"loop_chunk_r{runs_per_level}_{c0:04d}"
        n_expect = min(c0 + chunk, n_runs) - c0
        if resume and gname in arch:
            g = arch.load(gname)
            if all(k in g for k in chunk_keys):
                # the group name encodes the lane offset but not the chunk
                # size: resuming with a different --chunk/--mesh would mix
                # chunk grids (duplicated/missing lanes that only blow up
                # after the full recompute) — refuse instead
                n_got = np.asarray(g["err"]).shape[0]
                if n_got != n_expect:
                    raise SystemExit(
                        f"{gname} holds {n_got} lanes but this invocation "
                        f"expects {n_expect} (chunk={chunk}): resume with "
                        f"the chunk size the study was started with, or "
                        f"delete results/loop_chunk_r*.npz to restart")
                results.append(tuple(jnp.asarray(g[k]) for k in chunk_keys))
                print(f"  {min(c0+chunk, n_runs)}/{n_runs} lanes resumed "
                      f"from {gname}", flush=True)
                continue
            # older-schema archive (pre-denoise-arm / pre-err-aicc):
            # recompute the chunk so every field exists
        idx = np.arange(c0, min(c0 + chunk, n_runs))
        n_real = idx.size
        if mesh is not None and n_real % mesh.size:
            # pad a trailing partial chunk to the sharded batch size
            # (duplicates are sliced off below, like the restart pass)
            pad = (-n_real) % chunk
            idx = np.concatenate([idx, np.full(pad, c0, idx.dtype)])
        idx = jnp.asarray(idx)
        # stage-wall breakdown on the first computed chunk (sync points cost
        # nothing there and show where the per-recovery budget actually goes)
        # probe chunks 0 AND 1: chunk 0 shows where compile goes, chunk 1
        # is the steady-state stage-wall + dispatch attribution the
        # benchmark archives (probe_stats keeps the last = steady one)
        rec = pipeline(keys[idx], noise_mags[idx], probe=len(results) <= 1)
        rec = tuple(r[:n_real] for r in rec)
        results.append(rec)
        jax.block_until_ready(results[-1][0])
        if archive:
            # archive=False callers (the benchmark harness) must not write
            # resume checkpoints a later real study would silently pick up
            arch.save(gname, **dict(zip(chunk_keys, results[-1])))
        print(f"  {min(c0+chunk, n_runs)}/{n_runs} lanes done "
              f"({time.time()-t0:.0f}s)", flush=True)
        chunk_marks.append(time.time() - t0)
    fields = [
        np.concatenate([np.asarray(r[i]) for r in results])
        for i in range(len(chunk_keys))
    ]  # coef1/coef2: (n_runs, m) full recovered coefficient vectors

    # One deterministic re-init for lanes whose training missed the fit
    # gate (the hudson_bay seed-ladder pattern, CLAUDE.md).  The reference's
    # per-run try/catch (run_loops.jl:57-61) marks a run failed only after
    # its error path has run; our lockstep lanes cannot throw, so a
    # gate-failing lane gets ONE second init key — same noisy dataset —
    # and counts failed only if both attempts miss the gate.
    idx_fail = np.nonzero(~fields[2].astype(bool))[0]
    # pre-restart snapshot: the chunk archives alone reproduce THESE rates;
    # the published trained-arm rates additionally carry the restart
    # overlay below — archiving both makes the overlay independently
    # checkable from loop_study.npz (VERDICT r4 weak #5)
    exact_pre_restart = fields[0].copy()
    restart_wall = 0.0  # retraining seconds actually spent (0 when resumed)
    if idx_fail.size:
        gname = f"loop_restart_r{runs_per_level}"
        parts2 = None
        if resume and gname in arch:
            g = arch.load(gname)
            if ("idx" in g and np.array_equal(np.asarray(g["idx"]), idx_fail)
                    and all(k in g for k in chunk_keys)):
                parts2 = tuple(np.asarray(g[k]) for k in chunk_keys)
                print(f"  restart pass resumed from {gname}", flush=True)
        if parts2 is None:
            t_restart = time.time()
            # pad to the compiled CHUNK batch size so no new XLA program
            # is built for the (dynamic-size) failed set; with very few
            # failed lanes most of the padded chunk is duplicate compute,
            # which is still cheaper than compiling a smaller batch program
            # for a one-shot pass (compile ≫ one chunk of lane work)
            pad = (-idx_fail.size) % chunk
            idx_p = np.concatenate(
                [idx_fail, np.full(pad, idx_fail[0], idx_fail.dtype)])
            outs = [pipeline(keys[jnp.asarray(idx_p[r0:r0 + chunk])],
                             noise_mags[jnp.asarray(idx_p[r0:r0 + chunk])],
                             attempt=1)
                    for r0 in range(0, idx_p.size, chunk)]
            parts2 = tuple(np.concatenate([np.asarray(o[i]) for o in outs])
                           for i in range(len(chunk_keys)))
            restart_wall = time.time() - t_restart
            if archive:
                arch.save(gname, idx=jnp.asarray(idx_fail),
                          **dict(zip(chunk_keys, parts2)))
        take = parts2[2].astype(bool)[:idx_fail.size]  # retrain passed gate
        sel = idx_fail[take]
        for f, p2 in zip(fields, parts2):
            f[sel] = p2[:idx_fail.size][take]
        print(f"  restart pass: {idx_fail.size} gate-failed lanes "
              f"re-inited, {int(take.sum())} recovered", flush=True)

    (exact, contains, fit_ok, c1, c2, exact_sr3, contains_sr3, c1_sr3,
     c2_sr3, exact_sr3d, contains_sr3d, c1_sr3d, c2_sr3d, err, aicc,
     loss_hist, fin_loss) = fields
    wall = time.time() - t0

    exact = exact.reshape(n_levels, runs_per_level)
    contains = contains.reshape(n_levels, runs_per_level)
    fit_ok = fit_ok.reshape(n_levels, runs_per_level)
    exact_sr3 = exact_sr3.reshape(n_levels, runs_per_level)
    contains_sr3 = contains_sr3.reshape(n_levels, runs_per_level)
    exact_sr3d = exact_sr3d.reshape(n_levels, runs_per_level)
    contains_sr3d = contains_sr3d.reshape(n_levels, runs_per_level)
    print(f"total wall-clock: {wall:.1f}s "
          f"({wall/n_runs*1e3:.0f} ms per full recovery)")
    print("selection arms on the same trained lanes: 'judge' = simulation-"
          "judged STLSQ ladder; 'sr3' = the reference's SR3→STRRidge "
          "two-stage protocol (loop_recoveries.jl:100-125), without/with "
          "its published denoise=true (loop_recoveries.jl:107)")
    print(f"{'noise':>8} | {'trained':>8} | {'x*y found':>9} | {'exact':>6} "
          f"| {'sr3 x*y':>8} | {'sr3 exact':>9} | {'sr3d x*y':>8} "
          f"| {'sr3d exact':>10}")
    for lvl, mag in enumerate(NOISE_LEVELS):
        print(f"{mag:8.0e} | {fit_ok[lvl].mean():8.1%} | "
              f"{contains[lvl].mean():9.1%} | {exact[lvl].mean():6.1%} | "
              f"{contains_sr3[lvl].mean():8.1%} | "
              f"{exact_sr3[lvl].mean():9.1%} | "
              f"{contains_sr3d[lvl].mean():8.1%} | "
              f"{exact_sr3d[lvl].mean():10.1%}")

    def selection_pass(stage, label, suffix, extras=(), cfg=()):
        """Chunked, resumable selection-only pass (no training): shared by
        the oracle (identifiability-ceiling), weak-form, and combo arms.
        One stage dispatch per lane chunk (same watchdog budget as the
        recovery stage); per-chunk groups resume like the training chunks.
        ``extras``: per-lane (n_runs, ...) arrays passed to the stage after
        (keys, mags) — the combo playoff's candidate coefficients.
        ``cfg``: hashable stage configuration (e.g. the weak arm's window
        widths).  Both cfg and the extras arrays are digested into the
        chunk group names, so rerunning with different widths — or after
        the restart pass changed the trained coefficients a combo pass
        consumes — recomputes instead of silently resuming stale chunks
        (ADVICE r4)."""
        import hashlib

        # the judge constants are part of every selection arm's program:
        # bake them into the key so a budget change recomputes instead of
        # silently resuming chunks judged under the old budget
        judge_cfg = (REFIT_ITERS, MAX_TOTAL_SUPPORT, K_SEL, REFIT_TOP)
        h = hashlib.sha1(repr((cfg, judge_cfg)).encode())
        for e in extras:
            h.update(np.ascontiguousarray(np.asarray(e)).tobytes())
        tag = h.hexdigest()[:8]
        t_p = time.time()
        akeys = tuple(f"{f}_{suffix}" for f in
                      ("exact", "contains", "coef1", "coef2"))
        parts = []
        for c0 in range(0, n_runs, chunk):
            gname = f"loop_{label}_r{runs_per_level}_{tag}_{c0:04d}"
            n_expect = min(c0 + chunk, n_runs) - c0
            if resume and gname in arch:
                g = arch.load(gname)
                if (all(k in g for k in akeys)
                        and np.asarray(g[akeys[0]]).shape[0] == n_expect):
                    parts.append(tuple(np.asarray(g[k]) for k in akeys))
                    continue
            idx = np.arange(c0, min(c0 + chunk, n_runs))
            n_real = idx.size
            if mesh is not None and n_real % mesh.size:
                idx = np.concatenate(
                    [idx, np.full((-n_real) % chunk, c0, idx.dtype)])
            jidx = jnp.asarray(idx)
            out = stage(st.shard(keys[jidx]), st.shard(noise_mags[jidx]),
                        *[st.shard(jnp.asarray(e)[jidx]) for e in extras])
            out = tuple(np.asarray(o[:n_real]) for o in out)
            parts.append(out)
            if archive:
                arch.save(gname, **dict(zip(akeys, out)))
            print(f"  {label} {min(c0 + chunk, n_runs)}/{n_runs} lanes "
                  f"({time.time() - t_p:.0f}s)", flush=True)
        ex, co, c1_, c2_ = (np.concatenate([p[i] for p in parts])
                            for i in range(4))
        return (ex.reshape(n_levels, runs_per_level),
                co.reshape(n_levels, runs_per_level), c1_, c2_,
                time.time() - t_p)

    exact_o = contains_o = None
    oracle_wall = 0.0
    if oracle:
        exact_o, contains_o, c1_o, c2_o, oracle_wall = selection_pass(
            st.oracle_stage, "oracle", "o")
        print("identifiability ceiling (same selection on perfect training "
              "targets — true ±x·y terms at the lane's noisy samples):")
        print(f"{'noise':>8} | {'ceiling x*y':>11} | {'ceiling exact':>13} "
              f"| {'trained exact / ceiling':>23}")
        for lvl, mag in enumerate(NOISE_LEVELS):
            ce = exact_o[lvl].mean()
            tr = exact[lvl].mean()
            frac = tr / ce if ce > 0 else float("nan")
            print(f"{mag:8.0e} | {contains_o[lvl].mean():11.1%} | "
                  f"{ce:13.1%} | {tr:.1%} of {ce:.1%} = {frac:8.1%}")

    exact_w = contains_w = None
    weak_wall = 0.0
    exact_c = contains_c = None
    combo_wall = 0.0
    if weak:
        exact_w, contains_w, c1_w, c2_w, weak_wall = selection_pass(
            st.weak_stage, "weak", "w", cfg=("widths", st.weak_widths))
        print("weak-form arm (training-free: integral regression on the "
              "same noisy lanes + the same judge — sindy/weak.py):")
        print(f"{'noise':>8} | {'weak x*y':>9} | {'weak exact':>10} "
              f"| {'trained exact':>13}")
        for lvl, mag in enumerate(NOISE_LEVELS):
            print(f"{mag:8.0e} | {contains_w[lvl].mean():9.1%} | "
                  f"{exact_w[lvl].mean():10.1%} | "
                  f"{exact[lvl].mean():13.1%}")
        # cross-arm playoff: both arms' selected models through one judge
        exact_c, contains_c, c1_c, c2_c, combo_wall = selection_pass(
            st.combo_stage, "combo", "c", extras=(c1, c2, c1_w, c2_w))
        print("combo arm (per-lane playoff: trained vs weak selections, "
              "judged by simulation refit):")
        print(f"{'noise':>8} | {'combo x*y':>9} | {'combo exact':>11} "
              f"| {'trained':>7} | {'weak':>6} | {'ceiling':>7}")
        for lvl, mag in enumerate(NOISE_LEVELS):
            ce = (f"{exact_o[lvl].mean():7.1%}" if exact_o is not None
                  else "    n/a")
            print(f"{mag:8.0e} | {contains_c[lvl].mean():9.1%} | "
                  f"{exact_c[lvl].mean():11.1%} | {exact[lvl].mean():7.1%} "
                  f"| {exact_w[lvl].mean():6.1%} | {ce}")

    if archive:
        arch.save("loop_study", exact=jnp.asarray(exact),
                  exact_pre_restart=jnp.asarray(
                      exact_pre_restart.reshape(n_levels, runs_per_level)),
                  contains=jnp.asarray(contains), coef1=jnp.asarray(c1),
                  coef2=jnp.asarray(c2), noise=jnp.asarray(NOISE_LEVELS),
                  final_loss=jnp.asarray(fin_loss),
                  exact_sr3=jnp.asarray(exact_sr3),
                  contains_sr3=jnp.asarray(contains_sr3),
                  coef1_sr3=jnp.asarray(c1_sr3),
                  coef2_sr3=jnp.asarray(c2_sr3),
                  exact_sr3d=jnp.asarray(exact_sr3d),
                  contains_sr3d=jnp.asarray(contains_sr3d),
                  coef1_sr3d=jnp.asarray(c1_sr3d),
                  coef2_sr3d=jnp.asarray(c2_sr3d),
                  err=jnp.asarray(err), aicc=jnp.asarray(aicc),
                  loss_hist=jnp.asarray(loss_hist),
                  **(dict(exact_oracle=jnp.asarray(exact_o),
                          contains_oracle=jnp.asarray(contains_o),
                          coef1_oracle=jnp.asarray(c1_o),
                          coef2_oracle=jnp.asarray(c2_o))
                     if exact_o is not None else {}),
                  **(dict(exact_weak=jnp.asarray(exact_w),
                          contains_weak=jnp.asarray(contains_w),
                          coef1_weak=jnp.asarray(c1_w),
                          coef2_weak=jnp.asarray(c2_w))
                     if exact_w is not None else {}),
                  **(dict(exact_combo=jnp.asarray(exact_c),
                          contains_combo=jnp.asarray(contains_c),
                          coef1_combo=jnp.asarray(c1_c),
                          coef2_combo=jnp.asarray(c2_c))
                     if exact_c is not None else {}))
        print(f"archived to {arch.root}/loop_study.npz")
    if plot:
        # judge-oracle overlay when an attribution run has been archived —
        # keeps --plot and --plot-only producing the same figure
        attr_path = Path(__file__).parent / "results" / "attribution.npz"
        exact_j = None
        if attr_path.exists():
            with np.load(attr_path) as za:
                if za["exact"].shape == (n_levels, runs_per_level):
                    exact_j = za["exact"]
        write_plots(exact, contains, c1, c2, np.asarray(NOISE_LEVELS),
                    fin_loss, err=err, aicc=aicc, loss_hist=loss_hist,
                    exact_o=exact_o, contains_o=contains_o,
                    exact_w=exact_w, contains_w=contains_w, exact_j=exact_j)
    # gates at the measured band minus a reproducibility margin (measured
    # r2 full study with the restart pass: contains 96/96%, exact 96/95%
    # at 1e-3/5e-3); small runs keep a wider margin — at 4/level one
    # flipped lane moves the average 12.5 points
    if assert_gates:  # False only for reduced-budget path-parity tests
        gate_c, gate_e = (0.85, 0.85) if runs_per_level >= 20 else (0.75, 0.7)
        low_noise_rate = (contains[0].mean() + contains[1].mean()) / 2
        assert low_noise_rate >= gate_c, \
            f"low-noise x*y recovery rate too low: {low_noise_rate:.0%}"
        low_noise_exact = (exact[0].mean() + exact[1].mean()) / 2
        assert low_noise_exact >= gate_e, \
            f"low-noise exact-structure rate too low: {low_noise_exact:.0%}"
    return dict(exact=exact.mean(axis=1).tolist(),
                contains=contains.mean(axis=1).tolist(),
                exact_sr3=exact_sr3.mean(axis=1).tolist(),
                contains_sr3=contains_sr3.mean(axis=1).tolist(),
                exact_sr3d=exact_sr3d.mean(axis=1).tolist(),
                contains_sr3d=contains_sr3d.mean(axis=1).tolist(),
                err=err.tolist(), aicc=aicc.tolist(), wall=wall,
                chunk_walls=chunk_marks, restart_wall=restart_wall,
                restart_lanes=int(idx_fail.size),
                probe=dict(st.probe_stats),
                exact_oracle=(exact_o.mean(axis=1).tolist()
                              if exact_o is not None else None),
                contains_oracle=(contains_o.mean(axis=1).tolist()
                                 if contains_o is not None else None),
                oracle_wall=oracle_wall,
                exact_weak=(exact_w.mean(axis=1).tolist()
                            if exact_w is not None else None),
                contains_weak=(contains_w.mean(axis=1).tolist()
                               if contains_w is not None else None),
                weak_wall=weak_wall,
                exact_combo=(exact_c.mean(axis=1).tolist()
                             if exact_c is not None else None),
                contains_combo=(contains_c.mean(axis=1).tolist()
                                if contains_c is not None else None),
                combo_wall=combo_wall)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=100)
    ap.add_argument("--plot", action="store_true",
                    help="write loop_evaluation.jl figure analogues")
    ap.add_argument("--plot-only", action="store_true",
                    help="re-plot from the saved archive without retraining")
    ap.add_argument("--theta-samples", action="store_true",
                    help="train 2 study lanes per noise level and archive "
                         "their trained parameter vectors (the solver-"
                         "contract test's excursion draws)")
    ap.add_argument("--attribution", action="store_true",
                    help="judge-oracle attribution: rerun the playoff over "
                         "the archived study lanes with the TRUE structure "
                         "injected as a 3rd candidate (requires a completed "
                         "loop_study.npz with the weak/combo fields)")
    ap.add_argument("--fresh", action="store_true",
                    help="discard per-chunk checkpoints and recompute "
                         "(default resumes an interrupted study, the "
                         "loop_recoveries.jl append-mode behavior)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard lane chunks over all local devices "
                         "(ensemble data parallelism, SURVEY.md §2.4); "
                         "--chunk must divide by the device count")
    ap.add_argument("--chunk", type=int, default=None,
                    help=f"lanes per dispatch (default {CHUNK}; with --mesh "
                         f"defaults to the largest device-count multiple "
                         f"≤ {CHUNK})")
    args = ap.parse_args()
    if args.fresh:
        for pat in ("loop_chunk_*.npz", "loop_restart_*.npz",
                    "loop_oracle_*.npz", "loop_weak_*.npz",
                    "loop_combo_*.npz"):
            for p in (Path(__file__).parent / "results").glob(pat):
                p.unlink()
    if args.theta_samples:
        sample_thetas()
    elif args.attribution:
        attribution()
    elif args.plot_only:
        attr_path = Path(__file__).parent / "results" / "attribution.npz"
        exact_j = None
        if attr_path.exists():
            with np.load(attr_path) as za:
                exact_j = za["exact"]
        with np.load(Path(__file__).parent / "results" / "loop_study.npz") as z:
            write_plots(z["exact"], z["contains"], z["coef1"], z["coef2"],
                        z["noise"], exact_j=exact_j,
                        final_loss=(z["final_loss"]
                                    if "final_loss" in z.files else None),
                        err=z["err"] if "err" in z.files else None,
                        aicc=z["aicc"] if "aicc" in z.files else None,
                        loss_hist=(z["loss_hist"]
                                   if "loss_hist" in z.files else None),
                        exact_o=(z["exact_oracle"]
                                 if "exact_oracle" in z.files else None),
                        contains_o=(z["contains_oracle"]
                                    if "contains_oracle" in z.files else None),
                        exact_w=(z["exact_weak"]
                                 if "exact_weak" in z.files else None),
                        contains_w=(z["contains_weak"]
                                    if "contains_weak" in z.files else None))
    else:
        mesh = None
        chunk = args.chunk or CHUNK
        if args.mesh:
            from universal_differential_equations_tpu.parallel import (
                ensemble_mesh,
            )

            mesh = ensemble_mesh()
            if args.chunk is None:
                chunk = max(CHUNK // mesh.size, 1) * mesh.size
        main(runs_per_level=args.runs_per_level, plot=args.plot, mesh=mesh,
             chunk=chunk)
