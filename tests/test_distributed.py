"""Multi-host (DCN) glue test: 2-process localhost ``jax.distributed``.

`parallel/distributed.py` is the pod-slice scaling story (SURVEY.md §2.4:
ensemble data parallelism is the one first-class distributed capability).
This test runs the REAL multi-process path — two separate Python processes,
a localhost coordinator, gloo CPU collectives — and checks that
``initialize_distributed`` + ``global_ensemble_mesh`` produce a global mesh
over both processes' devices through which a cross-process reduction
returns the correct value on every host.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent(
    """
    import sys

    import jax

    # Each process gets 2 CPU devices -> 4 global. Configure BEFORE any
    # backend use; gloo provides the cross-process CPU collectives.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # package import must NOT initialize the XLA backend, or
    # jax.distributed.initialize below would be too late (regression guard:
    # module-level device constants are lazy)
    from universal_differential_equations_tpu.parallel import (
        global_ensemble_mesh,
        initialize_distributed,
        is_distributed,
        process_count,
    )

    pid = int(sys.argv[1])
    port = sys.argv[2]
    assert not is_distributed()
    ok = initialize_distributed(
        coordinator_address=f"localhost:{{port}}", num_processes=2,
        process_id=pid,
    )
    assert ok and is_distributed()
    assert process_count() == 2, process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    mesh = global_ensemble_mesh()
    assert mesh.axis_names == ("ensemble",)
    assert mesh.devices.size == 4

    # one ensemble lane per global device; each process contributes its
    # local rows and the jitted global mean runs a genuine DCN (here:
    # cross-process gloo) reduction
    sharding = NamedSharding(mesh, P("ensemble"))
    local = (np.arange(2 * 3, dtype=np.float32).reshape(2, 3)
             + 100.0 * pid)
    garr = jax.make_array_from_process_local_data(sharding, local, (4, 3))
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(garr)
    expected = float(np.arange(6).sum() * 2 + 100.0 * 6)
    assert abs(float(total) - expected) < 1e-5, (float(total), expected)
    print(f"proc {{pid}}: global sum {{float(total)}} OK")
    """
).format(repo=str(REPO))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_jax_distributed_cpu(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    # the conftest's 8-device force flag and any TPU plugin selection must
    # not leak into the workers (they configure their own CPU backend)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: global sum 630.0 OK" in out, out


def _import_run_loops(monkeypatch):
    import sys as _sys

    _sys.path.insert(0, str(REPO / "examples" / "lotka_volterra"))
    import run_loops as rl

    # shrink every stage so the tests compile + run in seconds (the module
    # defaults are the full-study budget); shrinking does not change the
    # placement semantics under test
    monkeypatch.setattr(rl, "BFGS_ROUNDS", 1)
    monkeypatch.setattr(rl, "BFGS_ITERS_PER_ROUND", 20)
    monkeypatch.setattr(rl, "LM_ROUNDS", 1)
    monkeypatch.setattr(rl, "K_SEL", 2)
    monkeypatch.setattr(rl, "MAX_TOTAL_SUPPORT", 3)
    monkeypatch.setattr(rl, "REFIT_ITERS", 2)
    monkeypatch.setattr(rl, "REFIT_TOP", (2, 2))
    monkeypatch.setattr(rl, "RECOVER_CHUNK", 8)
    return rl


def test_run_loops_recover_stage_sharded_matches_vmap(monkeypatch):
    """VERDICT r2 item 1 (identity half): the study's recovery stage — the
    judge + both SR3 arms, the deterministic part of a lane — produces the
    same per-lane results when its inputs are sharded over an 8-device mesh
    as on one device.  (The *training* stages are chaotic at f32: the
    partitioned XLA program rounds differently and marginal BFGS basins
    flip, per CLAUDE.md — so the contract is placement-invariance of the
    deterministic stage plus end-to-end execution of the sharded pipeline,
    tested below.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rl = _import_run_loops(monkeypatch)
    from universal_differential_equations_tpu.parallel import (
        ensemble_mesh,
        shard_ensemble,
    )

    st = rl.build_stages()
    lanes = 8
    keys = jax.random.split(jax.random.PRNGKey(5), lanes)
    mags = jnp.full((lanes,), 1e-2, jnp.float32)
    att = jnp.zeros((lanes,), jnp.int32)
    theta, data, _ = st.adam_stage(keys, mags, att)
    loss = jnp.full((lanes,), 1e-4, jnp.float32)  # pass the fit gate

    ref = st.recover_stage(theta, data, loss, mags)

    mesh = ensemble_mesh(8)
    sharded_in = shard_ensemble((theta, data, loss, mags), mesh)
    out = st.recover_stage(*sharded_in)

    for i, (r, o) in enumerate(zip(ref, out)):
        r, o = np.asarray(r), np.asarray(o)
        if r.dtype == bool:
            # selections (exact/contains/fit_ok flags) must match EXACTLY
            np.testing.assert_array_equal(r, o, err_msg=f"recover output {i}")
        else:
            # coefficients/metrics: the partitioned program reassociates a
            # handful of reductions — measured 1-ulp differences on ~3% of
            # elements (4e-16 abs) with identical selections
            np.testing.assert_allclose(r, o, rtol=1e-9, atol=1e-12,
                                       err_msg=f"recover output {i}")


def test_run_loops_resume_rejects_chunk_mismatch(monkeypatch, tmp_path):
    """Resume checkpoints are keyed by lane offset, not chunk size: resuming
    with a different --chunk must refuse up front (mixed chunk grids would
    duplicate/drop lanes and only blow up after the full recompute)."""
    import pytest

    rl = _import_run_loops(monkeypatch)
    from universal_differential_equations_tpu.io import KeyedArchive

    monkeypatch.setattr(rl, "KeyedArchive", lambda root: KeyedArchive(tmp_path))
    rl.main(runs_per_level=1, archive=True, resume=False, chunk=5,
            assert_gates=False)
    # same offsets, different chunk: the guard fires before any recompute
    with pytest.raises(SystemExit, match="chunk"):
        rl.main(runs_per_level=1, archive=True, resume=True, chunk=3,
                assert_gates=False)


def test_run_loops_mesh_pipeline_end_to_end(monkeypatch):
    """VERDICT r2 item 1 (product half): `run_loops.main(mesh=...)` — the
    actual 500-run-study driver — executes its full train→judge→archive
    pipeline with lane chunks sharded over a multi-device mesh."""
    import numpy as np

    rl = _import_run_loops(monkeypatch)
    from universal_differential_equations_tpu.parallel import ensemble_mesh

    mesh = ensemble_mesh(5)
    out = rl.main(runs_per_level=1, archive=False, resume=False, chunk=5,
                  mesh=mesh, assert_gates=False)
    assert out["wall"] > 0
    err = np.asarray(out["err"])
    assert err.shape == (5,) and np.all(np.isfinite(err))
    assert np.all(np.isfinite(np.asarray(out["aicc"])))
    for k in ("exact", "contains", "exact_sr3d"):
        assert len(out[k]) == 5
