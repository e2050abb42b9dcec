"""Climate training-data generation (SURVEY.md C26).

TPU-native equivalents of the reference's Oceananigans data runs:

* ``Climate/DataGeneration/advection_diffusion_3d.jl`` — forced tracer
  diffusion on a 3-D grid with Neumann top/bottom, adaptive-dt wizard,
  horizontal-average output every 0.01 time units.
* ``Climate/DataGeneration/rayleigh_taylor_instability_3d.jl`` — an
  incompressible Boussinesq Rayleigh-Taylor slab (128×2×128 in the
  reference); the horizontal buoyancy averages b̄(z, t) it writes are the
  training dataset of ``Climate/Training``.

Produces ``examples/climate/data/rt_horizontal_averages.npz`` consumed by
``training_rt.py``, and reports wall-time per simulation step (the
reference's progress printouts report ≈7–10 ms/step on CPU at 128³).

Run:  python examples/climate/data_generation.py [--quick] [--full-res]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax.numpy as jnp  # noqa: E402

from universal_differential_equations_tpu.models.climate_datagen import (  # noqa: E402
    advection_diffusion_3d,
    rayleigh_taylor_3d,
)

import jax  # noqa: E402

from universal_differential_equations_tpu.utils import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--full-res", action="store_true",
                    help="reference-scale grids (128 tracer, 128x2x128 RT)")
    ap.add_argument("--plot", action="store_true",
                    help="write the horizontal-average evolution figure")
    ap.add_argument("--bc", default="periodic",
                    choices=("periodic", "rigid_lid"),
                    help="RT vertical boundary treatment: periodic-z "
                         "(single-FFT fast path, default) or the "
                         "reference tank's rigid lids "
                         "(rayleigh_taylor_instability_3d.jl:23-32, "
                         "image-charge FFT pressure solve)")
    args = ap.parse_args()

    # --- forced advection-diffusion tracer (advection_diffusion_3d.jl) ---
    N = 128 if args.full_res else (16 if args.quick else 48)
    end = 0.05 if args.quick else 1.5
    t0 = time.perf_counter()
    ts, prof = advection_diffusion_3d(
        N=N, end_time=end, key=jax.random.PRNGKey(0))
    wall = time.perf_counter() - t0
    print(f"advection-diffusion: N={N}^3, {len(ts)} saves to t={ts[-1]:.3f} "
          f"in {wall:.2f}s")
    assert np.isfinite(prof).all()
    # forcing F(c) > 0 for small c: the mean tracer must grow
    assert prof[-1].mean() > prof[0].mean()

    # --- Rayleigh-Taylor instability (rayleigh_taylor_instability_3d.jl) ---
    if args.full_res:
        shape, endt = (128, 2, 128), 4.0  # the reference's slab (:13-15)
    elif args.quick:
        shape, endt = (16, 2, 16), 0.2
    else:
        shape, endt = (64, 4, 64), 4.0
    t0 = time.perf_counter()
    ts, z, b = rayleigh_taylor_3d(
        N=shape, end_time=endt, save_every=0.1, key=jax.random.PRNGKey(1),
        bc=args.bc)
    wall = time.perf_counter() - t0
    n_cells = shape[0] * shape[1] * shape[2]
    print(f"rayleigh-taylor: {shape} grid ({n_cells} cells, bc={args.bc}), "
          f"{len(ts)} saves to t={ts[-1]:.3f} in {wall:.2f}s")
    assert np.isfinite(b).all()
    if not args.quick:
        # mixing: the initial ±1 step profile homogenizes — the mid-depth
        # gradient magnitude must shrink
        mid = len(z) // 2
        g0 = abs(b[0, mid + 1] - b[0, mid - 1])
        g1 = abs(b[-1, mid + 1] - b[-1, mid - 1])
        print(f"  mid-depth |db/dz| step drop: {g0:.3f} -> {g1:.3f}")
        assert g1 < 0.9 * g0, "no RT mixing observed"

    out_dir = os.path.join(os.path.dirname(__file__), "data")
    os.makedirs(out_dir, exist_ok=True)
    # --quick smoke runs must not clobber the committed training dataset
    out_name = ("rt_horizontal_averages_quick.npz" if args.quick
                else "rt_horizontal_averages.npz")
    if args.bc != "periodic":
        # a rigid-lid run must not clobber the committed periodic dataset
        out_name = out_name.replace(".npz", f"_{args.bc}.npz")
    out = os.path.join(out_dir, out_name)
    np.savez(out, t=ts, z=z, b=b)
    print(f"wrote {out} (b shape {b.shape})")

    if args.plot:
        # the reference's horizontal-average JLD2 diagnostic, as one figure
        from universal_differential_equations_tpu import viz

        plot_dir = os.path.join(os.path.dirname(__file__), "plots")
        viz.save(viz.plot_field(
            b.T, (float(ts[0]), float(ts[-1]), float(z[0]), float(z[-1])),
            title="Rayleigh-Taylor b̄(z, t) horizontal averages",
            ylabel="z", cbar_label="b̄", diverging=True),
            os.path.join(plot_dir, "rt_averages.pdf"))
        print(f"plots written to {plot_dir}")

    print("OK")


if __name__ == "__main__":
    main()
