"""100-dimensional Hamilton-Jacobi-Bellman equation via deep BSDE.

Reproduction of ``highdim_pde/lambaem.jl`` on TPU: the LQG control problem
u_t + Δu − λ‖∇u‖² = 0, u(T,x) = g(x) = log(½ + ½‖x‖²), solved at x0 = 0 with
two ReLU networks (100→110→110→1 and 101→110→110→110→100), m = 100
trajectories, ADAM(0.03), validated against the 10⁵-sample analytic
Monte-Carlo value with the reference's rel-L2 < 0.2 assertion.

Run: python examples/highdim_pde/hjb_100d.py [--quick]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from universal_differential_equations_tpu.deepbsde import (
    NNPDENS,
    TerminalPDEProblem,
    mc_analytical_hjb,
    solve_terminal_pde,
)
from universal_differential_equations_tpu.nn import MLP
from universal_differential_equations_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main(quick=False, plot=False, adaptive=False, mesh="auto"):
    if mesh == "auto":
        # trajectory batching is the distributed axis (SURVEY.md §2.4): on a
        # multi-chip host the m=100 Brownian paths shard over the chips with
        # no code change — XLA inserts the gradient psum over ICI.  The mesh
        # is the largest device prefix that divides m=100 (lambaem.jl:10).
        from universal_differential_equations_tpu.parallel import ensemble_mesh

        n_dev = len(jax.devices())
        n_mesh = max(k for k in range(1, n_dev + 1) if 100 % k == 0)
        mesh = ensemble_mesh(n_mesh) if n_mesh > 1 else None
    d = 100
    lam = 1.0
    x0 = jnp.zeros(d, jnp.float32)
    tspan = (0.0, 1.0)

    g = lambda x: jnp.log(0.5 + 0.5 * jnp.sum(x * x))
    f = lambda t, x, u, z: -lam * jnp.sum(z * z)
    mu = lambda t, x: jnp.zeros_like(x)
    sigma = lambda t, x: jnp.sqrt(2.0)  # √2·I

    prob = TerminalPDEProblem(g, f, mu, sigma, x0, tspan)
    hls = d + 10
    alg = NNPDENS(
        u0_net=MLP([d, hls, hls, 1], activation="relu"),
        grad_net=MLP([d + 1, hls, hls, hls, d], activation="relu"),
    )

    if mesh is not None:
        print(f"sharding {100} trajectories over a {mesh.size}-device "
              f"'{mesh.axis_names[0]}' mesh")
    t0 = time.time()
    res = solve_terminal_pde(
        prob, alg, jax.random.PRNGKey(0), trajectories=100, mesh=mesh,
        n_steps=20 if quick else 50,
        maxiters=1400 if quick else 2500,  # 600 stalls at u0~2.3; 1400 → rel 0.003
        learning_rate=0.03, pabstol=1e-2, verbose=True,
        # --adaptive: the reference's ``alg=LambaEM(), abstol, reltol`` mode
        # (lambaem.jl:33-34) — an AdaptiveEM pilot picks the grid and
        # pinned-grid refinement stops when u(0,x0) stops moving
        adaptive=adaptive, sde_abstol=2e-2, sde_reltol=2e-2,
        max_refinements=1 if quick else 2,
    )
    wall = time.time() - t0
    if adaptive:
        print(f"adaptive grid: final n_steps = {res.n_steps}")

    analytical = float(mc_analytical_hjb(g, x0, 1.0, lam, jax.random.PRNGKey(7)))
    u0 = float(res.u0)
    rel_l2 = abs(u0 - analytical) / abs(u0)
    print(f"deep-BSDE u(0,0) = {u0:.4f}  (analytical MC {analytical:.4f})")
    print(f"rel L2 error = {rel_l2:.4f}  [reference asserts < 0.2]")
    print(f"training: {len(res.losses)} iters in {wall:.1f}s, "
          f"final loss {float(res.losses[-1]):.4f}, converged={res.converged}")
    assert rel_l2 < 0.2, "HJB accuracy assertion failed"

    if plot:
        # lambaem.jl figure analogue: terminal-condition loss over training,
        # annotated with the final u(0,0) vs the analytic MC value
        from pathlib import Path

        from universal_differential_equations_tpu import viz

        outdir = Path(__file__).resolve().parent / "plots"
        fig = viz.plot_loss_history(
            res.losses, title="deep-BSDE terminal loss (100-D HJB)")
        ax = fig.axes[0]
        ax.annotate(f"u(0,0) = {u0:.3f}   analytic MC = {analytical:.3f}   "
                    f"rel L2 = {rel_l2:.4f}",
                    (0.02, 0.04), xycoords="axes fraction", fontsize=8)
        viz.save(fig, outdir / "hjb_loss.pdf")
        print(f"plots written to {outdir}")

    return dict(u0=u0, analytical=analytical, rel_l2=rel_l2, wall=wall)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="write the training-loss figure analogue")
    ap.add_argument("--adaptive", action="store_true",
                    help="error-controlled time grid (the LambaEM role): "
                         "AdaptiveEM pilot + pinned-grid refinement")
    ap.add_argument("--no-mesh", action="store_true",
                    help="disable the automatic multi-device trajectory "
                         "sharding (single-device vmap only)")
    _a = ap.parse_args()
    main(quick=_a.quick, plot=_a.plot, adaptive=_a.adaptive,
         mesh=None if _a.no_mesh else "auto")
