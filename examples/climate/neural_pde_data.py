"""Climate 1-D neural PDE trained on the generated 3-D RT dataset.

Reproduction of ``Climate/NeuralPDE/npde_data.jl`` on TPU: load the
horizontal-average buoyancy profiles b̄(z, t) written by the 3-D
Rayleigh-Taylor data run (``data_generation.py``), build the ghost-node
D1/D2 column operators (``npde_data.jl:17-39``), learn the flux with a
5-layer tanh network inside ``du/dt = D1·Φ(u) + D2·u``
(``npde_data.jl:62-74``), and train against the whole timeseries with the
continuous interpolating adjoint — the reference's
``SensitivityAlg(quad=false, backsolve=false)`` checkpointed adjoint
(``npde_data.jl:76-82``) — under ADAM(0.01) (``npde_data.jl:107-109``).

Run:  python examples/climate/neural_pde_data.py [--quick]
(generates a small dataset on the fly if data_generation.py hasn't run)
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import universal_differential_equations_tpu as ude  # noqa: E402
from universal_differential_equations_tpu.models import climate_npde as cn  # noqa: E402
from universal_differential_equations_tpu.models.climate_datagen import (  # noqa: E402
    coarse_grain,
    rayleigh_taylor_3d,
)
from universal_differential_equations_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def load_or_generate(quick: bool):
    path = os.path.join(os.path.dirname(__file__), "data",
                        "rt_horizontal_averages.npz")
    if os.path.exists(path) and not quick:
        d = np.load(path)
        return d["t"], d["z"], d["b"]
    shape, endt = ((16, 2, 16), 1.0) if quick else ((48, 4, 48), 4.0)
    print(f"generating RT data on a {shape} grid ...")
    return rayleigh_taylor_3d(N=shape, end_time=endt, save_every=0.1,
                              key=jax.random.PRNGKey(1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true",
                    help="write npde_data.jl figure analogues")
    args = ap.parse_args()

    t, z, b = load_or_generate(args.quick)
    # column resolution: reference trains at the full 128 levels; 32 keeps
    # the (N-2)^2 dense layers MXU-tile-sized without changing the physics
    n_grid = 16 if args.quick else 32
    if b.shape[1] != n_grid:
        b = np.asarray(coarse_grain(b, b.shape[1] // n_grid))
    ts = jnp.asarray(t, jnp.float32)
    data = jnp.asarray(b[:, 1:-1], jnp.float32)  # interior (:46 u0=[2:end-1])
    u0 = data[0]
    n = n_grid - 2
    print(f"{data.shape[0]} profiles at {n_grid} levels over t in "
          f"[0, {float(ts[-1]):.1f}]")

    D1, D2, eig = cn.getops(n_grid)
    tspan = (float(ts[0]), float(ts[-1]))

    # 5 x Dense(n, n, tanh), all-tanh like the reference Chain (:62-63)
    net = ude.MLP([n] * 6, activation="tanh", final_activation="tanh")
    params0 = net.init(jax.random.PRNGKey(0), jnp.float32)

    def rhs(tt, u, p):
        return D1 @ net.apply(p, u) + D2 @ u

    def loss_fn(p):
        sol = ude.solve(
            ude.ODEProblem(rhs, u0, tspan, p), ude.Tsit5(),
            saveat=ts, rtol=1e-4, atol=1e-6,
            adjoint=ude.InterpolatingAdjoint(), max_steps=2048,
        )
        return jnp.sum((sol.ys - data) ** 2)

    l0 = float(jax.jit(loss_fn)(params0))
    t0 = time.time()
    # track the best loss/params seen at callback boundaries: plain ADAM's
    # LAST step can be a noisy jump (measured 20.5 -> 46.9 on the final
    # chunk), and both the quality gate and the rollout should reflect what
    # training achieved, not where the last step happened to land —
    # npde_data.jl's implicit convention of taking the trained model
    best = {"loss": float("inf"), "params": params0}

    def track(step, l, p):
        if l < best["loss"]:
            best["loss"], best["params"] = l, p
        print(f"  step {step:4d}  loss {l:.4e}")
        return False

    res = ude.fit(loss_fn, params0, optax.adam(0.01),
                  30 if args.quick else 300, callback_every=30,
                  callback=track)
    wall = time.time() - t0
    print(f"ADAM(0.01): loss {l0:.4e} -> best {best['loss']:.4e} "
          f"(final {res.final_loss:.4e}) in {wall:.1f}s")

    # rollout with the stabilized solver + eigen_est, reference's ROCK4 hook
    rkc = ude.ROCK4.for_problem(eig * 1.1, tspan, n_steps_hint=60)
    sol = ude.solve(ude.ODEProblem(rhs, u0, tspan, best["params"]), rkc,
                    saveat=ts, rtol=1e-3, atol=1e-4,
                    adjoint=ude.NoAdjoint(), max_steps=8192)
    rel = float(jnp.linalg.norm(sol.ys - data) / jnp.linalg.norm(data))
    print(f"ROCK4 rollout (stages={rkc.stages}): success={bool(sol.success)}, "
          f"rel-L2 vs data = {rel:.4f}")

    if not args.quick:
        assert best["loss"] < 0.2 * l0, "training did not reduce loss 5x"
        assert bool(sol.success) and rel < 0.6

    if args.plot:
        # npde_data.jl figure analogue: data vs neural-PDE rollout on the
        # real horizontal-average profiles, as z-t fields
        from universal_differential_equations_tpu import viz

        outdir = os.path.join(os.path.dirname(__file__), "plots")
        # physical vertical coordinate: coarse-grained interior levels of the
        # centered RT domain (matches data_generation.py's rt_averages.pdf)
        zc = np.asarray(coarse_grain(np.asarray(z)[None, :],
                                     z.shape[0] // n_grid))[0]
        extent = (tspan[0], tspan[1], float(zc[1]), float(zc[-2]))
        viz.save(viz.plot_field(np.asarray(data).T, extent,
                                title="b̄(z, t) data (interior levels)",
                                ylabel="z", cbar_label="b̄"),
                 os.path.join(outdir, "npde_data_truth.pdf"))
        viz.save(viz.plot_field(np.asarray(sol.ys).T, extent,
                                title="neural-PDE ROCK4 rollout",
                                ylabel="z", cbar_label="b̄"),
                 os.path.join(outdir, "npde_data_rollout.pdf"))
        print(f"plots written to {outdir}")

    print("OK")


if __name__ == "__main__":
    main()
