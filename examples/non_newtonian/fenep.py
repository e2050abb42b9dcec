"""FENE-P rheology UDE: learning a closure against a stiff DAE ground truth.

Reproduction of ``NonNewtonianFluids/FENEP.jl`` on TPU: exact shear stress
from the native BDF DAE solver (reference: Sundials IDA), a 1-state UDE with
two 2→4→1 tanh nets trained across strain rates γ̇=12cos(ωt), ω∈1.0:0.2:2.0,
tested on held-out γ̇=12cos(1.5t) over (0,10), with the linear-model baseline
comparison (``FENEP.jl:83-99``).

Run: python examples/non_newtonian/fenep.py [--quick]
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
from universal_differential_equations_tpu.models import fenep
from universal_differential_equations_tpu.train import fit
from universal_differential_equations_tpu.utils import enable_compilation_cache

enable_compilation_cache()

TSPAN = (0.0, 6.2831)
OMEGAS = np.arange(1.0, 2.01, 0.2)


def build_data():
    ts = jnp.linspace(TSPAN[0], TSPAN[1], 100)
    sig = []
    for w in OMEGAS:
        s, ok = fenep.find_sigma_exact(ts, lambda t: 12.0 * jnp.cos(w * t))
        assert bool(ok), f"DAE solve failed for omega={w}"
        sig.append(s)
    ts10 = jnp.linspace(0.0, 10.0, 100)
    s_test, ok = fenep.find_sigma_exact(ts10, lambda t: 12.0 * jnp.cos(1.5 * t))
    assert bool(ok)
    return ts, jnp.stack(sig), ts10, s_test


def make_loss(f1, f0, ts, sigmas):

    def predict_sigma(params, omega, tgrid, t_end):
        def rhs(t, u, p):
            gd = 12.0 * jnp.cos(omega * t)
            return f1.apply(p["f1"], jnp.concatenate([u, gd[None]]))

        prob = ude.ODEProblem(rhs, jnp.zeros(1), (0.0, t_end), params)
        sol = ude.solve(prob, ude.Tsit5(), saveat=tgrid, rtol=1e-5, atol=1e-7,
                        adjoint=ude.DiscreteAdjoint(), max_steps=256)
        gd = 12.0 * jnp.cos(omega * tgrid)
        inp = jnp.stack([sol.ys[:, 0], gd], axis=1)
        return jax.vmap(lambda x: f0.apply(params["f0"], x)[0])(inp)

    t_end = float(ts[-1])

    def loss(params):
        per_mode = jax.vmap(
            lambda w, s: jnp.sum((predict_sigma(params, w, ts, t_end) - s) ** 2)
        )(jnp.asarray(OMEGAS), sigmas)
        return jnp.sum(per_mode)

    return loss, predict_sigma


def crosscheck_implicit_solvers(ts10, sigma_test):
    """Cross-validate the BDF DAE truth with the ESDIRK shelf: the index-1
    reduction of FENE-P (``models.fenep.fenep_stiff_rhs``) solved with
    Kvaerno3/SDIRK4/SDIRK3 must reproduce the IDA-role τ12 (``FENEP.jl:35-39``).
    """
    scale = float(jnp.max(jnp.abs(sigma_test)))
    for name, solver in (("Kvaerno3", ude.Kvaerno3()),
                         ("SDIRK4", ude.SDIRK4()),
                         ("SDIRK3", ude.SDIRK3()),
                         ("Rosenbrock23", ude.Rosenbrock23())):
        s_ode, ok = fenep.find_sigma_exact_ode(
            ts10, lambda t: 12.0 * jnp.cos(1.5 * t), solver)
        assert bool(ok), f"{name} stiff-ODE solve failed"
        rel = float(jnp.max(jnp.abs(s_ode - sigma_test))) / scale
        print(f"  {name} stiff-ODE vs BDF DAE: max rel dev {rel:.2e}")
        assert rel < 1e-3, f"{name} disagrees with the DAE truth: {rel:.2e}"


def main(quick=False, plot=False):
    t0 = time.time()
    ts, sigmas, ts10, sigma_test = build_data()
    print(f"DAE data generation: {time.time()-t0:.1f}s "
          f"({len(OMEGAS)} train modes + 1 test)")
    crosscheck_implicit_solvers(ts10, sigma_test)

    results, preds = {}, {}
    for tag, linear in [("neural", False), ("linear", True)]:
        f1, f0, params0 = fenep.make_surrogate(jax.random.PRNGKey(3), linear=linear)
        loss, predict_sigma = make_loss(f1, f0, ts, sigmas)
        t1 = time.time()
        res = fit(loss, params0, optax.adam(0.015),
                  300 if quick else 2000, callback_every=500)
        test_pred = predict_sigma(res.params, 1.5, ts10, float(ts10[-1]))
        test_err = float(jnp.sum((test_pred - sigma_test) ** 2))
        wall = time.time() - t1
        print(f"{tag}: train loss {res.final_loss:.2f}, "
              f"test err {test_err:.2f} ({wall:.0f}s)")
        results[tag] = test_err
        preds[tag] = np.asarray(test_pred)

    assert results["neural"] < results["linear"], \
        "NN surrogate must beat the linear baseline (FENEP.jl comparison)"
    print(f"NN beats linear baseline by {results['linear']/results['neural']:.1f}x")

    if plot:
        # Plotfigs.jl analogue: held-out stress response γ̇ = 12cos(1.5t) —
        # exact FENE-P DAE vs the NN surrogate vs the linear baseline
        from universal_differential_equations_tpu import viz

        outdir = Path(__file__).resolve().parent / "plots"
        fig, ax = viz.new_figure()
        tt = np.asarray(ts10)
        ax.plot(tt, np.asarray(sigma_test), color=viz.SERIES[0], linewidth=2.4,
                alpha=0.35, label="exact DAE")
        ax.plot(tt, preds["neural"], color=viz.SERIES[0], linewidth=1.3,
                linestyle="--", label="NN surrogate")
        ax.plot(tt, preds["linear"], color=viz.SERIES[1], linewidth=1.2,
                linestyle=":", label="linear model")
        ax.set_xlabel("t")
        ax.set_ylabel("shear stress τ₁₂")
        ax.set_title("held-out test: γ̇(t) = 12·cos(1.5t)")
        ax.legend(fontsize=8)
        viz.save(fig, outdir / "fenep_test_response.pdf")
        print(f"plots written to {outdir}")

    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="write the Plotfigs.jl figure analogue")
    _a = ap.parse_args()
    main(quick=_a.quick, plot=_a.plot)
