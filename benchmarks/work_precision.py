"""Work-precision sets across the explicit/stabilized solver shelf.

The SciML ecosystem's standard solver-comparison artifact is the
WorkPrecisionSet (error vs. cost as tolerance tightens); the reference picks
its solvers from exactly such diagrams (Vern7 for 1e-12 truth runs,
`scenario_1.jl:41`; Tsit5 for training loops; ROCK4 over ROCK2 for stiff
columns, `Climate/NeuralPDE/npde.jl:61,122`).  This harness reproduces the
artifact for OUR shelf, giving every solver a measured placement:

* non-stiff set — Lotka-Volterra over [0, 5]: Bosh3 / Tsit5 / Dopri5 / Vern7
  (+ Heun as the low-order floor), error vs. an x64 Vern7 solve at 1e-13.
* stiff set — the climate 1-D diffusion column (rho(D2) ≈ 192):
  RKC1 / RKC2 / ROCK2 / ROCK4 vs. an x64 reference, showing the
  order-2-cheap-at-loose / order-4-wins-at-tight crossover that justifies
  the reference's ROCK4 choice.
* SDE set — scalar geometric Brownian motion with a closed-form solution:
  EulerMaruyama vs. EulerHeun (Stratonovich, drift-corrected GBM) strong
  error at matched path counts, halving dt.

Counts (num_rhs_evals) and errors are device-independent, so the harness
forces CPU+x64 for clean reference errors; run anywhere.  Each point also
carries a measured ``time_s`` (median synchronized wall of the compiled
solve on THIS host — the artifact records the platform so rounds compare
like with like).

Prints one JSON line per (set, solver, tol/dt) point:
  {"set", "solver", "rtol"|"dt", "rhs_evals", "err", "time_s"}
``--out FILE`` commits the rows as the per-round artifact
(e.g. benchmarks/work_precision_r04.json); ``--plot`` writes the
work-precision figures to benchmarks/plots/; ``--from FILE`` re-plots from
a committed artifact without re-measuring.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# --tpu-times (VERDICT r4 next #4): keep the default (TPU) backend in f32
# and measure the time axis on the device the README banner claims, with
# the chained/null-subtracted dispatch discipline of the other benchmark
# rows (the tunneled per-dispatch RTT drifts 24-69 ms between sessions —
# CLAUDE.md — so a naive per-solve wall on TPU times the wire).  Reference
# trajectories are still computed in float64 on the host CPU (the x64_host
# pattern; f64 on the TPU worker can crash it outright).
# exact-literal sniff, gated on THIS script being the entry point: an
# importlib load from another process whose argv happens to contain
# --tpu-times must NOT skip the CPU/x64 forcing (f64 issued to the TPU
# backend can crash the worker), and argparse prefix abbreviations
# (--tpu) are rejected below so the flag either matches here or errors.
TPU_TIMES = ("--tpu-times" in sys.argv
             and Path(sys.argv[0]).name == Path(__file__).name)
if not TPU_TIMES:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.models import climate_npde as cn
from universal_differential_equations_tpu.models import lotka_volterra as lv
from universal_differential_equations_tpu.solvers.sde import sdeint
from universal_differential_equations_tpu.utils import enable_compilation_cache
from universal_differential_equations_tpu.utils.profiling import benchmark

RTOLS = tuple(10.0 ** -e for e in range(3, 10))
# f32 adaptive-control floor on the TPU: below ~1e-7 the stepper exhausts
# max_steps (and err readings would measure the dtype, not the method)
RTOLS_TPU = tuple(10.0 ** -e for e in range(3, 8))
CHAIN_K = 8


def _solve(prob, solver, rtol, saveat, max_steps=65536):
    sol = ude.solve(prob, solver, saveat=saveat, rtol=rtol, atol=rtol * 1e-2,
                    adjoint=ude.NoAdjoint(), max_steps=max_steps)
    return sol


def _timed(prob, solver, rtol, saveat, max_steps=65536):
    """Median synchronized wall of the compiled solve (the 'work' axis in
    seconds; rhs_evals stays the device-independent work measure)."""
    stats = benchmark(
        lambda: _solve(prob, solver, rtol, saveat, max_steps).ys,
        repeats=5, warmup=1)
    return stats["median_s"]


def _timed_chained(prob, solver, rtol, saveat, max_steps=65536, K=CHAIN_K):
    """TPU time axis: K solves chained inside ONE device program (each
    re-seeded with a numerically-null, compiler-opaque u0 perturbation so
    XLA cannot CSE them), minus a measured null dispatch, divided by K —
    the climate-adjoint row's discipline, so the artifact times the
    solver, not the tunnel."""
    u00 = prob.u0

    @jax.jit
    def chain(u0):
        def body(i, carry):
            s, u = carry
            sol = ude.solve(ude.remake(prob, u0=u), solver, saveat=saveat,
                            rtol=rtol, atol=rtol * 1e-2,
                            adjoint=ude.NoAdjoint(), max_steps=max_steps)
            last = jnp.sum(sol.ys[-1])
            return s + last, u0 + 1e-30 * last
        return jax.lax.fori_loop(
            0, K, body, (jnp.zeros((), u00.dtype), u0))[0]

    null = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(chain(u00))
    jax.block_until_ready(null(u00))
    best_c, best_n = float("inf"), float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(u00))
        best_c = min(best_c, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(null(u00))
        best_n = min(best_n, time.perf_counter() - t0)
    return max(best_c - best_n, 1e-12) / K


def _host_f64_ref(f, u0, tspan, args, ts, rtol=1e-13):
    """float64 reference trajectory on the host CPU (the x64_host
    pattern) — shared by both platforms; in --tpu-times mode f64 must not
    touch the TPU worker."""
    cpu = jax.devices("cpu")[0]
    to64 = lambda a: (jnp.asarray(np.asarray(a), jnp.float64)
                      if a is not None else None)
    with jax.enable_x64(True), jax.default_device(cpu):
        prob = ude.ODEProblem(f, to64(u0), tspan, jax.tree.map(to64, args))
        ref = _solve(prob, ude.Vern7(), rtol, to64(ts))
        assert bool(ref.success)
        return np.asarray(ref.ys)


def nonstiff_set():
    dtype = jnp.float32 if TPU_TIMES else jnp.float64
    ts = jnp.linspace(0.0, 5.0, 51, dtype=dtype)
    prob = ude.ODEProblem(lv.lotka_rhs, lv.U0.astype(dtype),
                          (0.0, 5.0), lv.P_TRUE.astype(dtype))
    ref_ys = _host_f64_ref(lv.lotka_rhs, lv.U0, (0.0, 5.0), lv.P_TRUE, ts)
    scale = np.abs(ref_ys).max()
    shelf = [("Heun", ude.Heun()), ("Bosh3", ude.Bosh3()),
             ("Tsit5", ude.Tsit5()), ("Dopri5", ude.Dopri5()),
             ("Vern7", ude.Vern7())]
    timed = _timed_chained if TPU_TIMES else _timed
    rows = []
    for name, solver in shelf:
        for rtol in (RTOLS_TPU if TPU_TIMES else RTOLS):
            sol = _solve(prob, solver, rtol, ts)
            if not bool(sol.success):
                continue
            err = float(np.abs(np.asarray(sol.ys) - ref_ys).max() / scale)
            rows.append(dict(set="lotka_volterra", solver=name, rtol=rtol,
                             rhs_evals=int(sol.num_rhs_evals),
                             err=float(f"{err:.3g}"),
                             time_s=float(f"{timed(prob, solver, rtol, ts):.3g}")))
    return rows


def stiff_set():
    dtype = jnp.float32 if TPU_TIMES else jnp.float64
    D1, D2, eig = cn.getops(32)
    D1, D2 = jnp.asarray(D1, dtype), jnp.asarray(D2, dtype)
    u0 = jnp.asarray(cn.get_u0(32), dtype)
    ts = jnp.linspace(0.0, 1.5, 16, dtype=dtype)
    prob = ude.ODEProblem(cn.true_rhs, u0, (0.0, 1.5), (D1, D2))
    ref_ys = _host_f64_ref(cn.true_rhs, u0, (0.0, 1.5), (D1, D2), ts,
                           rtol=1e-12)
    scale = np.abs(ref_ys).max()
    shelf = [
        ("RKC1", ude.RKC1(stages=24, rho=float(eig) * 1.1)),
        ("RKC2", ude.RKC2(stages=24, rho=float(eig) * 1.1)),
        ("ROCK2", ude.ROCK2.for_problem(float(eig) * 1.1, (0.0, 1.5))),
        ("ROCK4", ude.ROCK4.for_problem(float(eig) * 1.1, (0.0, 1.5))),
    ]
    timed = _timed_chained if TPU_TIMES else _timed
    rows = []
    # stabilized-explicit floors: ~1e-9 in f64, ~1e-6 in f32 on the TPU
    rtols = RTOLS_TPU[:4] if TPU_TIMES else RTOLS[:6]
    for name, solver in shelf:
        for rtol in rtols:
            sol = _solve(prob, solver, rtol, ts)
            if not bool(sol.success):
                continue
            err = float(np.abs(np.asarray(sol.ys) - ref_ys).max() / scale)
            rows.append(dict(set="climate_column", solver=name, rtol=rtol,
                             rhs_evals=int(sol.num_rhs_evals),
                             err=float(f"{err:.3g}"),
                             time_s=float(f"{timed(prob, solver, rtol, ts):.3g}")))
    return rows


def sde_set(n_paths=256):
    """Strong error on GBM: dX = mu X dt + sigma X dW (Ito),
    X_T = X0 exp((mu - sigma^2/2) T + sigma W_T).  EulerHeun integrates the
    Stratonovich form (drift reduced by sigma^2/2 X), converging to the SAME
    Ito solution — the standard Ito/Stratonovich consistency check."""
    mu, sigma, T = 0.7, 0.5, 1.0
    dtype = jnp.float32 if TPU_TIMES else jnp.float64
    f_ito = lambda t, x, a: mu * x
    f_strat = lambda t, x, a: (mu - 0.5 * sigma**2) * x
    g = lambda t, x, a: sigma * x
    x0 = jnp.ones((1,), dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), n_paths)
    rows = []
    for n_steps in (8, 16, 32, 64, 128, 256):
        for name, f in (("EulerMaruyama", f_ito), ("EulerHeun", f_strat)):
            solver = (ude.EulerMaruyama() if name == "EulerMaruyama"
                      else ude.EulerHeun())
            prob = ude.SDEProblem(f=f, g=g, u0=x0, tspan=(0.0, T))

            def one(key):
                # return_increments hands back the exact increments the
                # stepper consumed — the supported reconstruction path (a
                # private re-draw would silently break if sdeint's key
                # consumption ever changed)
                sol, dws = sdeint(prob, solver, key=key, n_steps=n_steps,
                                  return_increments=True)
                w_T = jnp.sum(dws)
                exact = x0[0] * jnp.exp((mu - 0.5 * sigma**2) * T
                                        + sigma * w_T)
                return jnp.abs(sol.ys[-1][0] - exact)

            run = jax.jit(jax.vmap(one))
            errs = run(keys)
            if TPU_TIMES:
                # the path batch is tiny (256 short EM scans — microseconds
                # of device compute vs a ~25 ms tunnel RTT with ~ms jitter):
                # chain 4096 batches (keys folded per iteration — no CSE)
                # inside ONE program so the chained wall rises well above
                # the dispatch noise, and subtract the best-of null
                K_SDE = 4096

                @jax.jit
                def chain(ks):
                    def body(i, s):
                        e = jax.vmap(one)(jax.vmap(
                            lambda k: jax.random.fold_in(k, i))(ks))
                        return s + jnp.sum(e)
                    return jax.lax.fori_loop(
                        0, K_SDE, body, jnp.zeros((), x0.dtype))

                null = jax.jit(lambda x: x + 1.0)
                c_stats = benchmark(lambda: chain(keys), repeats=5, warmup=1)
                n_stats = benchmark(lambda: null(x0), repeats=5, warmup=1)
                t_val = max(c_stats["min_s"] - n_stats["min_s"],
                            1e-12) / K_SDE
            else:
                t_stats = benchmark(lambda: run(keys), repeats=5, warmup=1)
                t_val = t_stats["median_s"]
            rows.append(dict(set="gbm_strong", solver=name,
                             dt=float(T / n_steps),
                             rhs_evals=n_steps * (1 if name == "EulerMaruyama"
                                                  else 2),
                             err=float(f"{float(jnp.mean(errs)):.3g}"),
                             time_s=float(f"{t_val:.3g}")))
    return rows


def write_plots(rows):
    from universal_differential_equations_tpu import viz

    outdir = Path(__file__).resolve().parent / "plots"
    have_time = all("time_s" in r for r in rows)
    axes_specs = [("rhs_evals", "RHS evaluations", "")]
    if have_time:
        axes_specs.append(("time_s", "wall time [s] (compiled, synced)",
                           "_time"))
    for set_name in ("lotka_volterra", "climate_column", "gbm_strong"):
        sub = [r for r in rows if r["set"] == set_name]
        if not sub:
            continue
        for xkey, xlabel, suffix in axes_specs:
            fig, ax = viz.new_figure(4.8, 3.4)
            solvers = sorted({r["solver"] for r in sub})
            for i, s in enumerate(solvers):
                pts = sorted(((r[xkey], r["err"]) for r in sub
                              if r["solver"] == s))
                ax.loglog([p[0] for p in pts],
                          [max(p[1], 1e-16) for p in pts],
                          "o-", color=viz.SERIES[i % len(viz.SERIES)],
                          markersize=3.5, linewidth=1.2, label=s)
            ax.set_xlabel(xlabel)
            ax.set_ylabel("max relative error" if set_name != "gbm_strong"
                          else "mean strong error")
            ax.set_title(f"work-precision: {set_name}")
            ax.legend(fontsize=7)
            viz.save(fig, outdir / f"work_precision_{set_name}{suffix}.pdf")
    print(f"plots written to {outdir}")


def main():
    ap = argparse.ArgumentParser(allow_abbrev=False)
    ap.add_argument("--sets", default="nonstiff,stiff,sde")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--tpu-times", action="store_true",
                    help="measure the time axis on the default (TPU) "
                         "backend in f32, chained + null-subtracted; "
                         "errors score against a host-CPU f64 reference")
    ap.add_argument("--out", default=None,
                    help="write rows to this JSON artifact "
                         "(e.g. benchmarks/work_precision_r04.json)")
    ap.add_argument("--from", dest="from_file", default=None,
                    help="re-plot from a committed artifact, no re-measure")
    args = ap.parse_args()
    if args.from_file:
        payload = json.loads(Path(args.from_file).read_text())
        write_plots(payload["rows"])
        return
    enable_compilation_cache()
    rows = []
    sets = args.sets.split(",")
    if "nonstiff" in sets:
        rows += nonstiff_set()
    if "stiff" in sets:
        rows += stiff_set()
    if "sde" in sets:
        rows += sde_set()
    for r in rows:
        print(json.dumps(r))
    if args.out:
        payload = dict(platform=jax.devices()[0].platform,
                       device=str(jax.devices()[0]),
                       x64=bool(jax.config.jax_enable_x64),
                       time_def=("chained K=%d device programs, null "
                                 "dispatch subtracted, best of 5 "
                                 "(f32 on device; errors vs host-CPU f64 "
                                 "Vern7 reference)" % CHAIN_K
                                 if TPU_TIMES else
                                 "median synced wall of the compiled "
                                 "solve, 5 repeats"), rows=rows)
        Path(args.out).write_text(json.dumps(payload, indent=1) + "\n")
        print(f"wrote {args.out}")
    if args.plot:
        write_plots(rows)


if __name__ == "__main__":
    main()
