"""LV scenario 3: universal PDE with reaction recovery.

Reproduction of ``LotkaVolterra/scenario_3.jl`` on TPU: a 1-D Fisher-KPP
universal PDE (Nx=26, Float32) whose learnable model is a per-point reaction
MLP 1→5→5→5→1 plus a learnable periodic 3-tap stencil with zero-sum
constraint and diffusion scale D0 (``scenario_3.jl:83-114``); after training,
SINDy on the flattened (state → learned reaction) pairs with
``monomial_basis(u, 10)`` recovers the closed-form reaction
(``scenario_3.jl:189-204``).

Run: python examples/lotka_volterra/scenario_3.py [--quick]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu import sindy as sd
from universal_differential_equations_tpu.models import fisher_kpp as fk
from universal_differential_equations_tpu.nn import MLP
from universal_differential_equations_tpu.train import fit, levenberg_marquardt
from universal_differential_equations_tpu.utils import enable_compilation_cache

import optax

enable_compilation_cache()


def main(quick=False, plot=False):
    ts, data = fk.generate_data()
    print(f"universal-PDE data: {data.shape} (Nx={fk.NX}, Float32)")

    # scenario-3 model: reaction MLP 1→5→5→5→1 + stencil + D0 (:83-114)
    rx = MLP([1, 5, 5, 5, 1], activation="tanh")
    key = jax.random.PRNGKey(3)
    params0 = {
        "rx": rx.init(key),
        "w": jnp.array([1.1, -2.5, 1.0], jnp.float32),
        "D0": jnp.array(6.5, jnp.float32),
    }

    def rhs(t, u, p):
        w = p["w"]
        conv = w[0] * jnp.roll(u, 1) + w[1] * u + w[2] * jnp.roll(u, -1)
        return rx.apply(p["rx"], u[:, None])[:, 0] + p["D0"] * conv

    def residuals(p):
        sol = ude.solve(
            ude.ODEProblem(rhs, data[0], (0.0, fk.T_END), p), ude.Tsit5(),
            saveat=ts, rtol=1e-4, atol=1e-6,
            adjoint=ude.ForwardSensitivity(), max_steps=192,
        )
        pen = jnp.sqrt(fk.zero_sum_penalty(p) + 1e-30)
        # weight decay on the reaction net: the traveling wave concentrates
        # samples at the plateaus, so the mid-front reaction is only weakly
        # constrained — regularization keeps it smooth enough to recover
        flat_rx = jax.flatten_util.ravel_pytree(p["rx"])[0]
        rr = jnp.sqrt(3e-3 / flat_rx.size) * flat_rx
        return jnp.concatenate([(sol.ys - data).ravel(), pen[None], rr])

    def loss(p):
        r = residuals(p)
        return jnp.sum(r * r)

    t0 = time.time()
    params, best = params0, float("inf")
    for round_ in range(2 if quick else 4):  # alternate ADAM basin-hops + LM
        warm = fit(loss, params, optax.adam(0.01), 150 if quick else 500,
                   callback_every=150, early_stop_loss=0.005)
        res = levenberg_marquardt(residuals, warm.params,
                                  maxiters=30 if quick else 100,
                                  loss_tol=0.005)
        params, best = res.params, float(res.loss)
        print(f"  round {round_}: adam {warm.final_loss:.4f} -> "
              f"LM {best:.5f}")
        if best < 0.005:
            break
    print(f"training done: loss {best:.5f} ({time.time()-t0:.0f}s)")
    p_tr = params
    assert best < 0.05

    # -- SINDy on flattened (state, learned-reaction) pairs (:189-204)
    sol = ude.solve(ude.ODEProblem(rhs, data[0], (0.0, fk.T_END), p_tr),
                    ude.Tsit5(), saveat=ts, rtol=1e-6, atol=1e-8,
                    adjoint=ude.NoAdjoint(), max_steps=512)
    u_flat = sol.ys.reshape(-1, 1)  # (11·26, 1)
    r_flat = jax.vmap(lambda u: rx.apply(p_tr["rx"], u))(u_flat)  # (N, 1)
    basis = sd.monomial_basis(1, 10) + sd.Basis(
        (sd.Term("poly", exponents=(0,)),), 1
    )  # powers u^1..u^10 plus constant
    lams = tuple(10.0 ** e for e in np.arange(-4.0, 2.0, 0.05))
    # the trained reaction carries smooth wiggles the dense polynomials can
    # chase; a generous parsimony factor keeps the physical 2-term model
    rec = sd.sindy(sd.DirectDataDrivenProblem(u_flat, r_flat), basis,
                   sd.STLSQ(lams), normalize=True,
                   sampler=sd.DataSampler(4), exhaustive_k=2,
                   cv_tolerance=100.0)
    print("recovered reaction:", rec.equations("dr")[0])
    # acceptance is functional: the traveling wave only samples the plateaus
    # densely, so u², u³ alias on-data — any sparse model must match the true
    # reaction u−u² as a *function* on [0, 1]
    k = int(rec.sparsity[0])
    ug = jnp.linspace(0.0, 1.0, 101)[:, None]
    r_rec = jax.vmap(lambda u: rec(u))(ug)[:, 0]
    ferr = float(jnp.abs(r_rec - (ug[:, 0] * (1 - ug[:, 0]))).max())
    print(f"sparsity {k}, max |recovered - u(1-u)| on [0,1] = {ferr:.4f} "
          f"(true reaction peak 0.25)")
    # sparsity varies run-to-run (u², u³ alias on plateau-heavy samples and
    # TPU reductions are nondeterministic); the functional claim is what the
    # case study asserts
    assert ferr < 0.08, f"recovered reaction functionally wrong: {ferr}"

    if plot:
        # scenario_3.jl figure analogues: universal-PDE field fit and the
        # recovered sparse reaction vs u(1−u) on [0, 1]
        from universal_differential_equations_tpu import viz

        outdir = Path(__file__).resolve().parent / "plots"
        extent = (0.0, fk.T_END, 0.0, fk.NX * fk.DX)
        viz.save(viz.plot_field(np.asarray(data).T, extent,
                                title="ρ(x, t) truth", cbar_label="ρ"),
                 outdir / "scenario_3_truth.pdf")
        viz.save(viz.plot_field(np.asarray(sol.ys).T, extent,
                                title="ρ(x, t) learned universal PDE",
                                cbar_label="ρ"),
                 outdir / "scenario_3_learned.pdf")
        nn_react = jax.vmap(lambda u: rx.apply(p_tr["rx"], u))(ug)[:, 0]
        fig, ax = viz.new_figure()
        ugg = np.asarray(ug[:, 0])
        ax.plot(ugg, ugg * (1 - ugg), color=viz.SERIES[0], linewidth=2.4,
                alpha=0.35, label="r·u(1−u) truth")
        ax.plot(ugg, np.asarray(nn_react), color=viz.SERIES[0], linewidth=1.3,
                linestyle="--", label="NN reaction")
        ax.plot(ugg, np.asarray(r_rec), color=viz.SERIES[1], linewidth=1.3,
                linestyle=":", label="SINDy recovered")
        ax.set_xlabel("ρ")
        ax.set_ylabel("reaction")
        ax.set_title("reaction recovery (scenario 3)")
        ax.legend(fontsize=8)
        viz.save(fig, outdir / "scenario_3_reaction.pdf")
        print(f"plots written to {outdir}")

    return dict(equations=rec.equations(), loss=best, func_err=ferr)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="write scenario_3.jl figure analogues")
    _a = ap.parse_args()
    main(quick=_a.quick, plot=_a.plot)
