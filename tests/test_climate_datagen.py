"""Tests for the 3-D climate data generators (SURVEY.md C26)."""
import jax
import jax.numpy as jnp
import numpy as np

from universal_differential_equations_tpu.models.climate_datagen import (
    _lap_neumann_z,
    _project,
    _wavenumbers,
    advection_diffusion_3d,
    coarse_grain,
    rayleigh_taylor_3d,
)


def test_projection_removes_divergence():
    key = jax.random.PRNGKey(0)
    N = 8
    u, v, w = jax.random.normal(key, (3, N, N, N))
    k = _wavenumbers(N, 1.0)
    kx = k[:, None, None] * jnp.ones((1, N, N))
    ky = k[None, :, None] * jnp.ones((N, 1, N))
    kz = k[None, None, :] * jnp.ones((N, N, 1))
    up, vp, wp = _project(u, v, w, kx, ky, kz)
    div = kx * jnp.fft.fftn(up) + ky * jnp.fft.fftn(vp) + kz * jnp.fft.fftn(wp)
    assert float(jnp.abs(div).max()) < 1e-8
    # projecting twice is a no-op (P is idempotent)
    up2, vp2, wp2 = _project(up, vp, wp, kx, ky, kz)
    assert float(jnp.abs(up2 - up).max()) < 1e-10


def test_neumann_laplacian_constant_in_z():
    # a z-constant field has zero z-flux; x/y periodic terms also vanish
    c = jnp.ones((8, 8, 8))
    out = _lap_neumann_z(c, (0.1, 0.1, 0.1))
    assert float(jnp.abs(out).max()) < 1e-10
    # zero-flux: diffusion alone conserves the total tracer
    key = jax.random.PRNGKey(1)
    c = jax.random.normal(key, (8, 8, 8))
    lap = _lap_neumann_z(c, (0.1, 0.1, 0.1))
    assert abs(float(lap.sum())) < 1e-8 * float(jnp.abs(c).sum())


def test_advection_diffusion_runs_and_grows():
    ts, prof = advection_diffusion_3d(N=8, end_time=0.02, ni=5,
                                      key=jax.random.PRNGKey(0))
    assert np.isfinite(prof).all()
    assert prof.shape[1] == 8
    # F(c)=cos(sin c^3)+sin(cos c^2) > 0 near c~0..1: the mean must grow
    assert prof[-1].mean() > prof[0].mean()
    assert ts[-1] >= 0.02


def test_rayleigh_taylor_mixes_and_stays_bounded():
    ts, z, b = rayleigh_taylor_3d(N=(8, 2, 8), end_time=0.6, save_every=0.1,
                                  ni=5, key=jax.random.PRNGKey(1))
    assert np.isfinite(b).all()
    # donor-cell advection is monotone: b stays within the initial range
    assert abs(b).max() <= 1.0 + 1e-5
    # the unstable interface homogenizes: mid-depth jump shrinks
    mid = len(z) // 2
    g0 = abs(b[0, mid + 1] - b[0, mid - 1])
    g1 = abs(b[-1, mid + 1] - b[-1, mid - 1])
    assert g1 < g0
    # centered domain from the reference setup (z in (-L/2, L/2))
    assert z[0] < 0 < z[-1]


def test_advection_diffusion_sharded_matches_single_device():
    """Same SPMD recipe on the forced-tracer generator (roll halos only,
    no FFT): sharded profiles match single-device."""
    from jax.sharding import Mesh

    kwargs = dict(N=16, end_time=0.05, save_every=0.01, ni=5,
                  key=jax.random.PRNGKey(0))
    ts0, p0 = advection_diffusion_3d(**kwargs)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
    ts1, p1 = advection_diffusion_3d(**kwargs, mesh=mesh)
    np.testing.assert_allclose(ts1, ts0, rtol=1e-6)
    np.testing.assert_allclose(p1, p0, atol=5e-6)


def test_rayleigh_taylor_sharded_matches_single_device():
    """Domain decomposition along x over the 8-device mesh: XLA's SPMD
    partitioner supplies the stencil halos and the sharded-FFT transposes;
    the saved b̄(z) profiles must match the single-device run to roundoff
    accumulation."""
    from jax.sharding import Mesh

    kwargs = dict(N=(16, 2, 16), end_time=0.4, save_every=0.1, ni=5,
                  key=jax.random.PRNGKey(1))
    ts0, z0, b0 = rayleigh_taylor_3d(**kwargs)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
    ts1, z1, b1 = rayleigh_taylor_3d(**kwargs, mesh=mesh)
    np.testing.assert_allclose(ts1, ts0, rtol=1e-6)
    # sharded reductions/FFTs reassociate float sums; bound the drift tight
    np.testing.assert_allclose(b1, b0, atol=5e-5)


def test_coarse_grain_block_average():
    x = np.arange(16.0)
    cg = np.asarray(coarse_grain(x, 4))
    assert cg.shape == (4,)
    np.testing.assert_allclose(cg, [1.5, 5.5, 9.5, 13.5])
    # batched over leading axes
    xb = np.stack([x, 2 * x])
    np.testing.assert_allclose(np.asarray(coarse_grain(xb, 4))[1], 2 * cg)


def test_rt_step_benchmark_helper():
    # §6 baseline-table row: the step-timer must run the same jitted chunk
    # as the generator and report a positive steady-state per-step time
    from universal_differential_equations_tpu.models.climate_datagen import (
        rt_step_seconds,
    )

    per = rt_step_seconds(N=(8, 2, 8), ni=4, repeats=2)
    assert 0.0 < per < 1.0


def test_load_oceananigans_averages_reference_dataset():
    # ingest the reference's committed Oceananigans horizontal-average
    # output (data, not code) — the training set of npde_data.jl:41-55
    import os

    import pytest

    path = ("/root/reference/Climate/DataGeneration/"
            "rayleigh_taylor_instability_3d_horizontal_averages.jld2")
    h5py = pytest.importorskip("h5py")  # noqa: F841
    if not os.path.exists(path):
        pytest.skip("reference dataset not present")
    from universal_differential_equations_tpu.models.climate_datagen import (
        load_oceananigans_averages,
    )

    t, z, b = load_oceananigans_averages(path)
    assert b.shape == (len(t), len(z)) == (101, 128)
    assert t[0] == 0.0 and 9.5 < t[-1] < 10.5
    assert (np.diff(t) > 0).all()
    # buoyancy profiles: ±1 RT step mixing toward 0, monotone z-extent
    assert np.isfinite(b).all() and np.abs(b).max() <= 1.0 + 1e-6
    assert abs(b[0, 0] - 1.0) < 0.1 and abs(b[0, -1] + 1.0) < 0.1
    mid = b.shape[1] // 2
    assert abs(b[-1, mid + 1] - b[-1, mid - 1]) < abs(b[0, mid + 1]
                                                      - b[0, mid - 1])
