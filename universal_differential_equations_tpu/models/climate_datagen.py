"""3-D climate training-data generation (SURVEY.md C26).

TPU-native replacement for the reference's Oceananigans runs
(``Climate/DataGeneration/``): finite-difference stencils over the full 3-D
grid are exactly the VPU's sweet spot (fused rolls over contiguous lanes),
and the incompressible pressure projection is one batched FFT.

Two generators, mirroring the two reference scripts:

* ``advection_diffusion_3d`` (``advection_diffusion_3d.jl``): tracer-only
  ∂c/∂t = κ∇²c + F(c), F = cos(sin c³) + sin(cos c²), horizontally periodic
  with Neumann top/bottom, Gaussian-sheet initial condition, CFL-style
  adaptive dt wizard, horizontal-average diagnostics.  (In the reference the
  momentum field is zero throughout — no momentum forcing — so the faithful
  reduction is tracer-only.)
* ``rayleigh_taylor_3d`` (``rayleigh_taylor_instability_3d.jl:13-43``): an
  incompressible Boussinesq solve — velocity + buoyancy tracer b, unstable
  interface ``0.05·sin(6πx)`` with b=+1 below / −1 above, ν=κ=1e-4.  Two
  vertical boundary treatments: the periodic-z default (single-FFT Leray
  projection — the fast path) and ``bc="rigid_lid"``, which matches the
  reference tank's bounded z (free-slip no-penetration lids, no-flux
  buoyancy) with an image-charge FFT pressure solve on the mirror-doubled
  grid (``_project_rigid``).  The measured b̄(z, t) dataset shift between
  the two is small (see ``tests/test_climate_datagen.py`` and the
  committed benchmark note).

Both step with an adaptive-dt wizard (``TimeStepWizard(cfl=…)``) recomputed
every ``Ni`` steps, and return horizontal averages on a regular save grid —
the training dataset of ``Climate/Training``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["advection_diffusion_3d", "rayleigh_taylor_3d", "coarse_grain",
           "rt_step_seconds", "load_oceananigans_averages"]


def load_oceananigans_averages(path, field: str = "b"):
    """Ingest an Oceananigans horizontal-average JLD2 output file.

    JLD2 is HDF5 underneath, so the reference's *committed dataset* —
    ``rayleigh_taylor_instability_3d_horizontal_averages.jld2``, the training
    data of ``npde_data.jl:41-55`` — loads directly (data, not code): profile
    snapshots live at ``timeseries/<field>/<iteration>`` with matching
    scalars at ``timeseries/t/<iteration>`` and the vertical extent under
    ``grid/``.  Returns ``(t (Nt,), z (Nz,), profiles (Nt, Nz))`` sorted by
    time, matching :func:`rayleigh_taylor_3d`'s output convention.

    Requires ``h5py``; raises ImportError if unavailable (callers fall back
    to regenerating data with :func:`rayleigh_taylor_3d`).
    """
    import h5py
    import numpy as np

    with h5py.File(path, "r") as f:
        iters = sorted(f["timeseries/t"].keys(), key=int)
        t = np.array([f[f"timeseries/t/{i}"][()] for i in iters])
        prof = np.stack([f[f"timeseries/{field}/{i}"][()] for i in iters])
        nz = int(f["grid/Nz"][()])
        lz = float(f["grid/Lz"][()])
    assert prof.shape == (len(iters), nz), prof.shape
    # npde_data.jl:60 uses grid = range(0, 1, length=N) — node coordinates
    # spanning the Lz extent
    z = np.linspace(0.0, lz, nz)
    return (t.astype(np.float32), z.astype(np.float32),
            prof.astype(np.float32))


def _lap_periodic(c, dx):
    out = jnp.zeros_like(c)
    for ax in range(3):
        out += (jnp.roll(c, 1, ax) - 2.0 * c + jnp.roll(c, -1, ax)) / dx[ax] ** 2
    return out


def _lap_neumann_z(c, dx):
    """Periodic in x, y; zero-flux (Neumann) top/bottom in z."""
    out = (jnp.roll(c, 1, 0) - 2.0 * c + jnp.roll(c, -1, 0)) / dx[0] ** 2
    out += (jnp.roll(c, 1, 1) - 2.0 * c + jnp.roll(c, -1, 1)) / dx[1] ** 2
    up = jnp.concatenate([c[:, :, 1:], c[:, :, -1:]], axis=2)
    dn = jnp.concatenate([c[:, :, :1], c[:, :, :-1]], axis=2)
    out += (up - 2.0 * c + dn) / dx[2] ** 2
    return out


def advection_diffusion_3d(
    N: int = 64,
    L: float = 1.0,
    kappa: float = 0.05,
    end_time: float = 1.5,
    save_every: float = 0.01,
    cfl: float = 0.1,
    max_dt: float = 1e-1,
    ni: int = 20,
    key=None,
    dtype=jnp.float32,
    mesh=None,
    mesh_axis: str = "x",
):
    """Forced diffusion tracer run; returns (save_ts, c_profiles (T, N)).

    ``mesh`` domain-decomposes the 128³-class tracer grid along its first
    axis over ``mesh_axis`` (same SPMD recipe as :func:`_rt_stepper`: the
    field carries a ``NamedSharding`` and XLA supplies the roll halos —
    this is the largest grid in the pipeline, so it is where multi-chip
    scaling actually pays)."""
    dx = (L / N,) * 3
    z = (jnp.arange(N, dtype=dtype) + 0.5) * dx[2]
    c = jnp.exp(-200.0 * (z - 0.75) ** 2)[None, None, :] * jnp.ones(
        (N, N, 1), dtype
    )
    if key is not None:
        c = c + 1e-8 * jax.random.normal(key, c.shape, dtype)

    def rhs(c):
        F = jnp.cos(jnp.sin(c**3)) + jnp.sin(jnp.cos(c**2))
        return kappa * _lap_neumann_z(c, dx) + F

    def chunk_fn(c, dt):
        def step(c, _):
            # RK2 (Heun) — forcing is smooth, diffusion bounds dt
            k1 = rhs(c)
            k2 = rhs(c + dt * k1)
            return c + 0.5 * dt * (k1 + k2), None

        c, _ = jax.lax.scan(step, c, None, length=ni)
        return c, jnp.max(jnp.abs(rhs(c)))

    if mesh is None:
        chunk = jax.jit(chunk_fn)
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        assert N % mesh.shape[mesh_axis] == 0, (
            f"N={N} not divisible by mesh axis '{mesh_axis}' size "
            f"{mesh.shape[mesh_axis]}")
        sh = NamedSharding(mesh, PartitionSpec(mesh_axis))
        rep = NamedSharding(mesh, PartitionSpec())
        c = jax.device_put(c, sh)
        chunk = jax.jit(chunk_fn, in_shardings=(sh, rep),
                        out_shardings=(sh, rep))

    # stability-limited dt wizard: diffusive limit + forcing-CFL analogue.
    # The save-cadence cap mirrors rayleigh_taylor_3d: one save per chunk,
    # so the chunk span must not exceed save_every.
    diff_dt = cfl * dx[0] ** 2 / (6.0 * kappa)
    dt_save_cap = save_every / ni
    t, dt = 0.0, min(1e-4, diff_dt, dt_save_cap)
    save_ts, profiles = [], []
    next_save = 0.0
    while t < end_time:
        if t >= next_save:
            save_ts.append(t)
            profiles.append(np.asarray(c.mean(axis=(0, 1))))
            next_save += save_every
        c, fmax = chunk(c, jnp.asarray(dt, dtype))
        t += ni * dt
        # wizard: grow toward the stability budget, cap change at 1.2×
        dt_target = min(diff_dt, cfl * 1.0 / max(float(fmax), 1e-8), max_dt)
        dt = min(dt * 1.2, dt_target, dt_save_cap)
    save_ts.append(t)
    profiles.append(np.asarray(c.mean(axis=(0, 1))))
    return np.asarray(save_ts), np.stack(profiles)


def _wavenumbers(n: int, l: float):
    """FFT wavenumbers with the Nyquist mode zeroed: an unpaired ±n/2
    coefficient of a real field has no well-defined spectral derivative, and
    taking ``.real`` after the inverse FFT would leave its divergence
    un-projected."""
    k = jnp.fft.fftfreq(n, d=l / n) * 2 * jnp.pi
    if n % 2 == 0:
        k = k.at[n // 2].set(0.0)
    return k


def _project(u, v, w, kx, ky, kz):
    """Incompressible (Leray) projection via FFT: û ← (I − k kᵀ/|k|²) û."""
    uh, vh, wh = jnp.fft.fftn(u), jnp.fft.fftn(v), jnp.fft.fftn(w)
    k2 = kx**2 + ky**2 + kz**2
    s = jnp.where(k2 > 0,
                  (kx * uh + ky * vh + kz * wh) / jnp.maximum(k2, 1e-30),
                  0.0)
    return (jnp.fft.ifftn(uh - kx * s).real,
            jnp.fft.ifftn(vh - ky * s).real,
            jnp.fft.ifftn(wh - kz * s).real)


def _ext_even(f):
    """Mirror-even extension along z (cell-centered): f_{-1-j} = f_j."""
    return jnp.concatenate([f, f[:, :, ::-1]], axis=2)


def _ext_odd(f):
    """Mirror-odd extension along z: f_{-1-j} = -f_j (zero at the walls)."""
    return jnp.concatenate([f, -f[:, :, ::-1]], axis=2)


def _project_rigid(u, v, w, kx, ky, kz):
    """Leray projection with rigid lids in z (image-charge FFT variant).

    The reference's RT tank is bounded in z
    (``rayleigh_taylor_instability_3d.jl:23-32`` — RegularCartesianGrid
    rigid lids); the periodic-z default documents its deviation in the
    module docstring.  This solves the wall-bounded pressure Poisson
    problem exactly in the symmetric subspace: extend (u, v) mirror-even
    and w mirror-odd along z (so w's trigonometric interpolant vanishes at
    both walls — no penetration — and p picks up homogeneous Neumann
    walls), run the standard periodic spectral projection on the doubled
    domain, and restrict.  Parity is preserved by the isotropic projector,
    so the restriction is the DCT/DST mixed-basis solve without needing a
    DST primitive.  ``kx/ky/kz`` must be the doubled-grid wavenumbers."""
    ue, ve, we = _ext_even(u), _ext_even(v), _ext_odd(w)
    ue, ve, we = _project(ue, ve, we, kx, ky, kz)
    nz = u.shape[2]
    return ue[:, :, :nz], ve[:, :, :nz], we[:, :, :nz]


def _lap_dirichlet_z(c, dx):
    """Periodic in x, y; odd-mirror (zero at the wall faces) top/bottom in
    z — the free-slip rigid-lid Laplacian for the wall-normal velocity."""
    out = (jnp.roll(c, 1, 0) - 2.0 * c + jnp.roll(c, -1, 0)) / dx[0] ** 2
    out += (jnp.roll(c, 1, 1) - 2.0 * c + jnp.roll(c, -1, 1)) / dx[1] ** 2
    up = jnp.concatenate([c[:, :, 1:], -c[:, :, -1:]], axis=2)
    dn = jnp.concatenate([-c[:, :, :1], c[:, :, :-1]], axis=2)
    out += (up - 2.0 * c + dn) / dx[2] ** 2
    return out


def _adv(f, u, v, w, dx):
    """Upwind (donor-cell) advection −(u·∇)f on the periodic grid.

    First-order upwinding is deliberately diffusive: at training-data grid
    Péclet numbers (u·Δx/ν ~ 10²–10³) centered differences ring and blow up
    under explicit stepping; donor-cell stays monotone and the horizontal
    b̄(z) averages the training pipeline consumes are insensitive to the
    extra smoothing."""
    out = jnp.zeros_like(f)
    for ax, vel, h in ((0, u, dx[0]), (1, v, dx[1]), (2, w, dx[2])):
        bwd = (f - jnp.roll(f, 1, ax)) / h
        fwd = (jnp.roll(f, -1, ax) - f) / h
        out -= jnp.where(vel > 0, vel * bwd, vel * fwd)
    return out


def _adv_bounded_z(f, u, v, w, dx, parity):
    """Donor-cell advection −(u·∇)f: periodic in x, y; mirrored ghost
    cells in z — ``parity=+1`` (zero-gradient walls: scalars and
    tangential velocities under free slip) or ``-1`` (zero at the wall
    faces: the wall-normal velocity)."""
    out = jnp.zeros_like(f)
    for ax, vel, h in ((0, u, dx[0]), (1, v, dx[1])):
        bwd = (f - jnp.roll(f, 1, ax)) / h
        fwd = (jnp.roll(f, -1, ax) - f) / h
        out -= jnp.where(vel > 0, vel * bwd, vel * fwd)
    dn = jnp.concatenate([parity * f[:, :, :1], f[:, :, :-1]], axis=2)
    up = jnp.concatenate([f[:, :, 1:], parity * f[:, :, -1:]], axis=2)
    bwd = (f - dn) / dx[2]
    fwd = (up - f) / dx[2]
    out -= jnp.where(w > 0, w * bwd, w * fwd)
    return out


def _rt_stepper(N, L, nu, kappa, b_amp, ni, key, dtype, mesh=None,
                mesh_axis: str = "x", bc: str = "periodic"):
    """Initial state + jitted ``ni``-step Heun/Leray chunk for the RT slab.

    Shared by :func:`rayleigh_taylor_3d` (the data generator's adaptive-CFL
    outer loop) and :func:`rt_step_seconds` (the step-time benchmark
    reproducing the reference's 7-10 ms/step progress lines,
    ``Climate/DataGeneration/output.txt``).

    With ``mesh`` the slab is domain-decomposed along its first (x) axis
    across ``mesh_axis`` of a :class:`jax.sharding.Mesh` — the TPU-native
    multi-chip story for the 3-D generator: the fields carry a
    ``NamedSharding``, and XLA's SPMD partitioner inserts the halo
    exchanges for the rolled stencils and the transpose collectives for
    the sharded Leray FFT (no hand-written ppermute).  ``N[0]`` must be
    divisible by the mesh-axis size.

    ``bc="periodic"`` (default) is the one-FFT fully periodic slab;
    ``bc="rigid_lid"`` matches the reference tank's bounded z
    (``rayleigh_taylor_instability_3d.jl:23-32``): free-slip no-penetration
    lids for velocity, no-flux for buoyancy, with the wall-bounded pressure
    solve done by the image-charge FFT (:func:`_project_rigid`)."""
    assert bc in ("periodic", "rigid_lid"), bc
    rigid = bc == "rigid_lid"
    Nx, Ny, Nz = N
    dx = (L[0] / Nx, L[1] / max(Ny, 1), L[2] / Nz)
    x = -L[0] / 2 + (jnp.arange(Nx, dtype=dtype) + 0.5) * dx[0]
    z = -L[2] / 2 + (jnp.arange(Nz, dtype=dtype) + 0.5) * dx[2]
    zz = z[None, None, :]
    xx = x[:, None, None]
    interface = 0.05 * jnp.sin(6 * jnp.pi * xx)
    # smooth tanh interface (width ~2 cells) instead of the reference's sharp
    # sign jump — a sharp jump on a centered-difference grid rings at the
    # Nyquist mode; the tanh is the grid-resolvable version of the same IC
    b = -b_amp * jnp.tanh((zz - interface) / (2 * dx[2])) * jnp.ones(
        (1, Ny, 1), dtype
    )
    if key is not None:
        b = b + 1e-4 * jax.random.normal(key, b.shape, dtype)
    u = jnp.zeros((Nx, Ny, Nz), dtype)
    v = jnp.zeros_like(u)
    w = jnp.zeros_like(u)

    nz_sp = 2 * Nz if rigid else Nz  # doubled image grid for rigid lids
    lz_sp = 2.0 * L[2] if rigid else L[2]
    kx = _wavenumbers(Nx, L[0]).astype(dtype)[:, None, None] * jnp.ones(
        (1, Ny, nz_sp), dtype)
    ky = _wavenumbers(Ny, L[1]).astype(dtype)[None, :, None] * jnp.ones(
        (Nx, 1, nz_sp), dtype)
    kz = _wavenumbers(nz_sp, lz_sp).astype(dtype)[None, None, :] * jnp.ones(
        (Nx, Ny, 1), dtype)

    def chunk_fn(state, dt):
        def step(state, _):
            u, v, w, b = state

            def tend(u, v, w, b):
                if rigid:
                    du = (_adv_bounded_z(u, u, v, w, dx, 1.0)
                          + nu * _lap_neumann_z(u, dx))
                    dv = (_adv_bounded_z(v, u, v, w, dx, 1.0)
                          + nu * _lap_neumann_z(v, dx))
                    dw = (_adv_bounded_z(w, u, v, w, dx, -1.0)
                          + nu * _lap_dirichlet_z(w, dx) + b)
                    db = (_adv_bounded_z(b, u, v, w, dx, 1.0)
                          + kappa * _lap_neumann_z(b, dx))
                else:
                    du = _adv(u, u, v, w, dx) + nu * _lap_periodic(u, dx)
                    dv = _adv(v, u, v, w, dx) + nu * _lap_periodic(v, dx)
                    dw = _adv(w, u, v, w, dx) + nu * _lap_periodic(w, dx) + b
                    db = _adv(b, u, v, w, dx) + kappa * _lap_periodic(b, dx)
                return du, dv, dw, db

            # Heun step + projection
            d1 = tend(u, v, w, b)
            u1, v1, w1, b1 = (u + dt * d1[0], v + dt * d1[1],
                              w + dt * d1[2], b + dt * d1[3])
            d2 = tend(u1, v1, w1, b1)
            u2 = u + 0.5 * dt * (d1[0] + d2[0])
            v2 = v + 0.5 * dt * (d1[1] + d2[1])
            w2 = w + 0.5 * dt * (d1[2] + d2[2])
            b2 = b + 0.5 * dt * (d1[3] + d2[3])
            project = _project_rigid if rigid else _project
            u2, v2, w2 = project(u2, v2, w2, kx, ky, kz)
            return (u2, v2, w2, b2), None

        state, _ = jax.lax.scan(step, state, None, length=ni)
        u, v, w, b = state
        umax = jnp.maximum(jnp.max(jnp.abs(u)),
                           jnp.maximum(jnp.max(jnp.abs(v)),
                                       jnp.max(jnp.abs(w))))
        return state, umax

    state = (u, v, w, b)
    if mesh is None:
        chunk = jax.jit(chunk_fn)
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        assert Nx % mesh.shape[mesh_axis] == 0, (
            f"Nx={Nx} not divisible by mesh axis '{mesh_axis}' size "
            f"{mesh.shape[mesh_axis]}")
        sh = NamedSharding(mesh, PartitionSpec(mesh_axis))
        rep = NamedSharding(mesh, PartitionSpec())
        state = jax.device_put(state, (sh,) * 4)
        chunk = jax.jit(chunk_fn, in_shardings=((sh,) * 4, rep),
                        out_shardings=((sh,) * 4, rep))
    return state, z, chunk, dx


def tracer_step_seconds(
    N: int = 128,
    ni: int = 50,
    repeats: int = 5,
    dtype=jnp.float32,
    mesh=None,
):
    """Steady-state wall-clock per forced-tracer solver step at the
    reference's 128³ grid (``advection_diffusion_3d.jl:11-16`` — N=128,
    κ=0.05; the reference commits no timing for this generator, so the row
    has no baseline).  Times the jitted ``ni``-step Heun chunk post-compile
    and returns seconds per step; ``mesh`` exercises the spatially-sharded
    path on a device mesh instead."""
    from ..utils import benchmark

    dx = (1.0 / N,) * 3
    z = (jnp.arange(N, dtype=dtype) + 0.5) * dx[2]
    c = jnp.exp(-200.0 * (z - 0.75) ** 2)[None, None, :] * jnp.ones(
        (N, N, 1), dtype)
    kappa = 0.05

    def rhs(c):
        F = jnp.cos(jnp.sin(c**3)) + jnp.sin(jnp.cos(c**2))
        return kappa * _lap_neumann_z(c, dx) + F

    def chunk_fn(c, dt):
        def step(c, _):
            k1 = rhs(c)
            k2 = rhs(c + dt * k1)
            return c + 0.5 * dt * (k1 + k2), None

        c, _ = jax.lax.scan(step, c, None, length=ni)
        return c, jnp.max(jnp.abs(rhs(c)))

    if mesh is None:
        chunk = jax.jit(chunk_fn)
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        rep = NamedSharding(mesh, PartitionSpec())
        c = jax.device_put(c, sh)
        chunk = jax.jit(chunk_fn, in_shardings=(sh, rep),
                        out_shardings=(sh, rep))
    dt = jnp.asarray(1e-4, dtype)
    stats = benchmark(chunk, c, dt, repeats=repeats, warmup=1)
    return stats["min_s"] / ni


def rt_step_seconds(
    N: Tuple[int, int, int] = (128, 2, 128),
    ni: int = 10,
    repeats: int = 5,
    dtype=jnp.float32,
    bc: str = "periodic",
):
    """Steady-state wall-clock per RT solver step at the reference's grid.

    Reference: ≈7-10 ms/step at 128×2×128 after warmup
    (``Climate/DataGeneration/output.txt`` progress lines).  Times the
    jitted ``ni``-step chunk post-compile (``utils.benchmark`` min-of-repeats)
    and returns seconds per step.  ``bc="rigid_lid"`` times the
    image-charge-FFT wall-bounded variant instead.
    """
    from ..utils import benchmark

    state, _, chunk, dx = _rt_stepper(
        N, (1.0, N[1] / N[0], 1.0), 1e-4, 1e-4, 1.0, ni, None, dtype, bc=bc)
    dt = jnp.asarray(1e-4, dtype)
    stats = benchmark(chunk, state, dt, repeats=repeats, warmup=1)
    return stats["min_s"] / ni


def rayleigh_taylor_3d(
    N: Tuple[int, int, int] = (64, 4, 64),
    L: Tuple[float, float, float] = (1.0, 0.0625, 1.0),
    nu: float = 1e-4,
    kappa: float = 1e-4,
    b_amp: float = 1.0,
    end_time: float = 2.0,
    save_every: float = 0.1,
    cfl: float = 0.2,
    ni: int = 10,
    key=None,
    dtype=jnp.float32,
    mesh=None,
    mesh_axis: str = "x",
    bc: str = "periodic",
):
    """Buoyancy-driven RT mixing; returns (save_ts, z, b_profiles (T, Nz)).

    Matches the reference's 128×2×128 slab (``:13-15``) at configurable
    resolution on the centered domain (−L/2, L/2): interface
    ``0.05·sin(6πx)`` with b=+1 below / −1 above (``:39-43``), ν=κ=1e-4
    (``:18-19``), horizontal b̄(z) averages on the save grid (``:60-76``).
    ``mesh`` domain-decomposes the slab along x across the mesh axis
    (see :func:`_rt_stepper`); the saved b̄(z) profiles are identical.
    ``bc="rigid_lid"`` reproduces the reference tank's bounded z
    (``:23-32``) via the image-charge FFT pressure solve — see
    :func:`_rt_stepper`/:func:`_project_rigid`; the periodic-z default is
    the single-FFT fast path.
    """
    state, z, chunk, dx = _rt_stepper(N, L, nu, kappa, b_amp, ni, key, dtype,
                                      mesh=mesh, mesh_axis=mesh_axis, bc=bc)
    Ny = N[1]
    min_dx = min(dx[0], dx[2]) if Ny <= 4 else min(dx)
    # buoyancy free-fall CFL: velocities reach ~sqrt(b·Δx) within a cell
    # before the velocity-based CFL can see them — bound dt by it up front
    # (the reference wizard's max_Δt cap plays this role)
    buoy_dt = cfl * (min_dx / max(b_amp, 1e-12)) ** 0.5
    diff_dt = 0.2 * min_dx**2 / (6.0 * max(nu, kappa))
    # cap the jitted chunk's span at save_every: the loop saves at most one
    # profile per chunk, so an adaptively-grown dt would otherwise skip
    # save points and deliver a sparser grid than requested
    dt_save_cap = save_every / ni
    t, dt = 0.0, min(1e-4, buoy_dt, diff_dt, dt_save_cap)
    save_ts, profiles = [], []
    next_save = 0.0
    while t < end_time:
        if t >= next_save:
            save_ts.append(t)
            profiles.append(np.asarray(state[3].mean(axis=(0, 1))))
            next_save += save_every
        state, umax = chunk(state, jnp.asarray(dt, dtype))
        t += ni * dt
        adv_dt = cfl * min_dx / max(float(umax), 1e-6)
        dt = min(dt * 1.2, adv_dt, buoy_dt, diff_dt, dt_save_cap)
    save_ts.append(t)
    profiles.append(np.asarray(state[3].mean(axis=(0, 1))))
    return np.asarray(save_ts), np.asarray(z), np.stack(profiles)


def coarse_grain(profile, factor: int):
    """Block-average a vertical profile (``coarse_grain``,
    ``neural_pde_rayleigh_taylor_instability.jl:55-66``)."""
    n = profile.shape[-1]
    assert n % factor == 0
    return profile.reshape(*profile.shape[:-1], n // factor, factor).mean(-1)
