"""Climate 1-D neural PDE: learned flux in a diffusion-advection column.

Reproduction of ``Climate/NeuralPDE/npde.jl`` on TPU: ghost-node D1/D2
operators with spectral-radius estimate feeding the stabilized stiff solver
(the reference's ROCK4 ``eigen_est`` hook → the derived ROCK4 here), truth with the
nonlinear flux Φ(u)=cos(sin u³ + sin cos u²), a 30→8→30 tanh network learning
the flux inside ``D1·NN(u) + D2·u``, trained quasi-Newton-only like the
reference's raw ``Optim.optimize`` BFGS (``npde.jl:114-118``) — here
Levenberg-Marquardt, which is the Gauss-Newton upgrade of that choice.

Run: python examples/climate/neural_pde.py [--quick]
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
from universal_differential_equations_tpu.models import climate_npde as cn
from universal_differential_equations_tpu.train import fit, levenberg_marquardt
from universal_differential_equations_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main(quick=False, plot=False):
    D1, D2, eig = cn.getops(32)
    u0 = cn.get_u0(32)
    ts = jnp.linspace(0.0, 1.5, 30, dtype=jnp.float32)
    rkc = ude.ROCK4.for_problem(eig * 1.1, (0.0, 1.5), n_steps_hint=40)
    print(f"operators: 30 interior points, ρ(D2)={eig:.1f}, "
          f"ROCK4 stages={rkc.stages} (reference: ROCK4 with eigen_est)")

    # truth with Tsit5: at N=32 the stiffness is mild, and RKC's s²-amplified
    # f32 rounding cannot meet 1e-6 tolerances (it shines at coarser tols and
    # finer grids — used for the long rollout below)
    truth = ude.solve(
        ude.ODEProblem(cn.true_rhs, u0, (0.0, 1.5), (D1, D2)), ude.Tsit5(),
        saveat=ts, rtol=1e-6, atol=1e-8, adjoint=ude.NoAdjoint(),
        max_steps=4096,
    )
    assert bool(truth.success)
    data = truth.ys

    rhs, params0, net = cn.make_neural_rhs(jax.random.PRNGKey(0))

    def residuals(p):
        sol = ude.solve(
            ude.ODEProblem(rhs, u0, (0.0, 1.5), (p, D1, D2)), ude.Tsit5(),
            saveat=ts, rtol=1e-4, atol=1e-6,
            adjoint=ude.ForwardSensitivity(), max_steps=1024,
        )
        return (sol.ys - data).ravel()

    def loss(p):
        r = residuals(p)
        return jnp.sum(r * r)

    t0 = time.time()
    warm = fit(loss, params0, optax.adam(0.01), 100 if quick else 300,
               callback_every=100)
    res = levenberg_marquardt(residuals, warm.params,
                              maxiters=20 if quick else 60, loss_tol=1e-4)
    wall = time.time() - t0
    print(f"training: adam {warm.final_loss:.4f} → LM {float(res.loss):.6f} "
          f"in {wall:.1f}s ({int(res.iterations)} LM iters)")
    assert float(res.loss) < 0.05

    # adjoint-evaluation timing — the reference's committed measurement is
    # 0.879 s per loss+gradient (Climate/NeuralPDE/timing.txt)
    vg = jax.jit(jax.value_and_grad(
        lambda p: jnp.sum((ude.solve(
            ude.ODEProblem(rhs, u0, (0.0, 1.5), (p, D1, D2)), ude.Tsit5(),
            saveat=ts, rtol=1e-4, atol=1e-6,
            adjoint=ude.InterpolatingAdjoint(), max_steps=1024,
        ).ys - data) ** 2)
    ))
    l, g = vg(res.params)
    jax.block_until_ready(l)
    t0 = time.time()
    for _ in range(10):
        l, g = vg(res.params)
    jax.block_until_ready(l)
    per_eval = (time.time() - t0) / 10
    print(f"adjoint loss+gradient: {per_eval*1e3:.1f} ms "
          f"(reference measured 879 ms → {0.879/per_eval:.1f}x)")

    # long-horizon rollout with the stabilized solver (npde.jl:121-123)
    long = ude.solve(
        ude.ODEProblem(rhs, u0, (0.0, 10.0), (res.params, D1, D2)),
        ude.ROCK4.for_problem(eig * 1.1, (0.0, 10.0), n_steps_hint=60),
        saveat=jnp.linspace(0.0, 10.0, 30), rtol=1e-4, atol=1e-4,
        adjoint=ude.NoAdjoint(), max_steps=8192,
    )
    print(f"t=10 rollout with ROCK4: success={bool(long.success)}, "
          f"finite={bool(jnp.all(jnp.isfinite(long.ys)))}")

    # first-order stabilized contrast (RKC1, the damped Chebyshev smoother):
    # same trained flux, same tolerance — it must land on the same
    # trajectory, and its accepted-step count shows why the reference runs
    # ROCK4 (npde.jl:122): order 1 pays ~2× the steps already at rtol 1e-4
    # (measured 177 vs 90 on the true flux), widening as tolerance tightens
    rkc1 = ude.RKC1(stages=16, rho=float(eig) * 1.1)
    long1 = ude.solve(
        ude.ODEProblem(rhs, u0, (0.0, 10.0), (res.params, D1, D2)), rkc1,
        saveat=jnp.linspace(0.0, 10.0, 30), rtol=1e-4, atol=1e-4,
        adjoint=ude.NoAdjoint(), max_steps=8192,
    )
    dev1 = float(jnp.linalg.norm(long1.ys - long.ys)
                 / jnp.linalg.norm(long.ys))
    print(f"t=10 rollout with RKC1(s=16): success={bool(long1.success)}, "
          f"dev vs ROCK4 = {dev1:.2e}, steps {int(long1.num_accepted)} "
          f"vs ROCK4's {int(long.num_accepted)}")
    assert bool(long1.success) and dev1 < 0.05

    # ROCK2 arm — the reference's own lower-order stabilized configuration
    # (npde.jl:122 solves this exact rollout with ROCK2(eigen_est)): same
    # trained flux, same tolerance, RHS-eval counts side by side.  Order 2
    # must land on the ROCK4 trajectory; at this loose rtol=1e-4 the two
    # are comparable (measured 1659 vs 1911 evals, ROCK2 slightly cheaper)
    # — ROCK4's advantage opens as tolerance tightens (the benchmarked ~6×
    # at rtol 1e-8, README), which is why the reference's truth solves at
    # 1e-9 use ROCK4 (npde.jl:61) and only this rollout uses ROCK2.
    rock2 = ude.ROCK2.for_problem(eig * 1.1, (0.0, 10.0), n_steps_hint=60)
    long2 = ude.solve(
        ude.ODEProblem(rhs, u0, (0.0, 10.0), (res.params, D1, D2)), rock2,
        saveat=jnp.linspace(0.0, 10.0, 30), rtol=1e-4, atol=1e-4,
        adjoint=ude.NoAdjoint(), max_steps=8192,
    )
    dev2 = float(jnp.linalg.norm(long2.ys - long.ys)
                 / jnp.linalg.norm(long.ys))
    print(f"t=10 rollout with ROCK2(s={rock2.stages}): "
          f"success={bool(long2.success)}, dev vs ROCK4 = {dev2:.2e}, "
          f"RHS evals {int(long2.num_rhs_evals)} vs ROCK4's "
          f"{int(long.num_rhs_evals)} at equal tolerance")
    assert bool(long2.success) and dev2 < 0.05

    if plot:
        # npde.jl figure analogues: learned flux vs Φ(u) over the visited
        # state range, and the stabilized long rollout as a z-t field
        from universal_differential_equations_tpu import viz
        import numpy as np

        outdir = Path(__file__).resolve().parent / "plots"
        u_lo, u_hi = float(data.min()), float(data.max())
        uu = jnp.linspace(u_lo, u_hi, 200, dtype=jnp.float32)
        # pointwise truth Φ vs the network evaluated on constant profiles
        phi_true = np.asarray(jnp.cos(jnp.sin(uu**3) + jnp.sin(jnp.cos(uu**2))))
        phi_net = np.asarray(jax.vmap(
            lambda v: net.apply(res.params, jnp.full((30,), v, jnp.float32))[15]
        )(uu))
        # the flux enters through D1 only: an additive constant is unobservable
        # (D1·(Φ+c·1) = D1·Φ for the interior rows) — compare mean-centered
        viz.save(viz.plot_function_comparison(
            np.asarray(uu), phi_net - phi_net.mean(),
            phi_true - phi_true.mean(),
            labels=("NN flux", "Φ(u) truth"), xlabel="u",
            ylabel="flux (mean-centered)",
            title="learned nonlinear flux (up to the D1-null constant)"),
            outdir / "npde_flux.pdf")
        viz.save(viz.plot_field(
            np.asarray(long.ys).T, (0.0, 10.0, 0.0, 1.0),
            title="neural-PDE rollout to t=10 (ROCK4)", ylabel="z",
            cbar_label="u"), outdir / "npde_rollout.pdf")
        print(f"plots written to {outdir}")

    return dict(loss=float(res.loss), adjoint_ms=per_eval * 1e3,
                rock4_evals=int(long.num_rhs_evals),
                rock2_evals=int(long2.num_rhs_evals))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="write npde.jl figure analogues")
    _a = ap.parse_args()
    main(quick=_a.quick, plot=_a.plot)
