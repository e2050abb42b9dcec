"""Flat-parameter utilities (SURVEY.md C13).

TPU-native replacement for the reference's ``ComponentArrays`` named flat
vectors (``scenario_2.jl:87-88``) and Flux ``destructure/restructure``
(``Fisher-KPP-CNN.jl:104-109``): ``jax.flatten_util.ravel_pytree`` plus small
helpers for gradient raveling with non-differentiable leaves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .profiling import StepTimer, benchmark, null_dispatch_seconds, trace

__all__ = ["ravel_pytree", "flat_dim", "zeros_like_tree", "tree_where",
           "tree_add", "tree_scale", "rescale_problem",
           "enable_compilation_cache", "benchmark", "trace", "StepTimer",
           "probe_device", "wait_for_device"]


def probe_device(timeout_s: float = 60.0) -> bool:
    """True if the accelerator answers a trivial dispatch.

    Failure-detection half of the fault-tolerance story (SURVEY §5): the
    TPU worker crashes sporadically under sustained load, and afterwards
    dispatches *hang* rather than error — so the probe runs in a child
    process that can be killed.  On runtimes with exclusive device access
    the child can fail simply because THIS process still holds the device
    client; that is a healthy device answering "busy", not a hang, so
    busy-flavoured errors count as alive (the parent's next dispatch is the
    real test).
    """
    import subprocess
    import sys

    code = "import jax; jax.jit(lambda x: x + 1)(1.0); print('ok')"
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False
    if r.returncode == 0:
        return True
    busy_markers = ("already in use", "in use by", "resource busy",
                    "device or resource busy", "already been initialized",
                    "unavailable: no tpu", "libtpu is already in use")
    err = (r.stderr or "").lower()
    return any(m in err for m in busy_markers)


def wait_for_device(deadline_s: float = 600.0, poll_s: float = 30.0) -> bool:
    """Poll :func:`probe_device` until it answers or ``deadline_s`` passes.

    The recovery half of crash-resilient training loops (see
    ``examples/climate/neural_pde_data.py`` and ``bench.py``): after a
    worker crash the device can stay unreachable for minutes, so callers
    park here before re-dispatching instead of hanging on a dead client.
    """
    import time

    deadline = time.time() + deadline_s
    while True:
        if probe_device():
            return True
        if time.time() >= deadline:
            return False
        time.sleep(poll_s)


def enable_compilation_cache(path=None):
    """Persist XLA compilations across processes.

    Adaptive-solver programs (nested scans/while loops) compile in minutes on
    TPU; the cache turns every later run of the same example/benchmark into a
    sub-second load.  Call before the first jit.

    The default directory is fingerprinted by host CPU features and jax
    version: XLA:CPU entries are ahead-of-time machine code, and loading a
    cache written on a different host type risks SIGILL (the loader only
    warns).  A cache dir inherited from another machine must not be reused.
    """
    if path is None:
        import hashlib
        import platform

        try:
            with open("/proc/cpuinfo") as fh:
                flags = next((ln for ln in fh if ln.startswith("flags")), "")
        except OSError:
            flags = platform.processor()
        tag = hashlib.md5(
            (flags + jax.__version__).encode()
        ).hexdigest()[:10]
        path = f"/tmp/ude_tpu_jax_cache_{tag}"
    jax.config.update("jax_compilation_cache_dir", path)
    # Persist even sub-second compiles: over the TPU tunnel each tiny eager
    # op costs ~0.4 s to compile, and data-generation/setup code dispatches
    # dozens of them — measured 38 s → 1.6 s per process start when these
    # are cached too (entries are a few KB each).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Deliberately unbounded: jax's max-size LRU needs per-entry -atime
    # sidecars from the directory's creation and breaks (write failures) on
    # caches that predate the setting or are shared by concurrent processes.
    # Entries are a few KB; delete the directory to reclaim space.


def flat_dim(tree) -> int:
    """Total number of scalar entries in a pytree."""
    return sum(jnp.size(leaf) for leaf in jax.tree.leaves(tree))


def zeros_like_tree(tree):
    return jax.tree.map(jnp.zeros_like, tree)


def tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_scale(c, a):
    return jax.tree.map(lambda x: c * x, a)


def rescale_problem(problem, scales):
    """Diagonal state rescaling: solve in units ``v = scales ⊙ u``.

    Exactly preserves the dynamics (``dv/dt = scales ⊙ f(t, v/scales)``) while
    conditioning all state components to O(1) — essential for float32 TPU
    training of systems whose states span many decades (e.g. the SEIR case:
    susceptibles ~1 vs infected ~1e-5; SURVEY.md C27).  ``scales`` is a pytree
    matching ``u0``.  Returns a new problem; map solutions back with
    ``ys / scales``.
    """
    import dataclasses

    s_flat = jax.tree.map(jnp.asarray, scales)
    f = problem.f

    def f_scaled(t, v, args):
        u = jax.tree.map(lambda vv, ss: vv / ss, v, s_flat)
        du = f(t, u, args)
        return jax.tree.map(lambda dd, ss: dd * ss, du, s_flat)

    u0_s = jax.tree.map(lambda uu, ss: uu * ss, problem.u0, s_flat)
    return dataclasses.replace(problem, f=f_scaled, u0=u0_s)
