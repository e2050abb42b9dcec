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
