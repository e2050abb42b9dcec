"""FENE-P micro-benchmark: UDE surrogate solve vs exact DAE solve.

The reference commits a ``@btime`` harness comparing the trained 1-state
UDE surrogate against the full 6-equation FENE-P DAE solve
(``NonNewtonianFluids/FENEP.jl:127-139``; numbers were never recorded
in-repo — BASELINE.md row 9).  This reproduces the comparison on TPU: one
periodic strain cycle, matched tolerances, chained solves per device
program to amortize dispatch latency.

Prints one JSON line:
  {"surrogate_us_per_solve", "dae_us_per_solve", "speedup"}
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.models import fenep
from universal_differential_equations_tpu.solvers.bdf import daeint
from universal_differential_equations_tpu.utils import enable_compilation_cache

T_END = 6.2831  # one 2π strain cycle (FENEP.jl:88)


def measure():
    """Time one surrogate solve (chained, null-subtracted) and one exact DAE
    solve; returns the comparison dict (also consumed by run_all.py row 10)."""
    enable_compilation_cache()
    ts = jnp.linspace(0.0, T_END, 50)

    # exact DAE (the ground-truth generator; IDA role).  find_sigma_exact is
    # a host-side driver (x64-host dispatch inside), so it is timed at the
    # host level rather than through utils.benchmark's jit wrapper.
    import time

    def time_host(fn, repeats=5):
        jax.block_until_ready(fn())  # warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    t_dae = time_host(
        lambda: fenep.find_sigma_exact(ts, lambda t: 12.0 * jnp.cos(t))[0])

    # trained-architecture UDE surrogate (untrained weights time identically)
    f1, f0, params = fenep.make_surrogate(jax.random.PRNGKey(0))

    # Chain K solves in ONE device program (sequential lax.map over distinct
    # inputs) and subtract a measured null dispatch — a single ~ms solve per
    # dispatch would time the ~25 ms tunnel round trip, not the solve
    # (CLAUDE.md).  The DAE side runs on the host CPU (x64-host path), so it
    # has no tunnel to amortize.
    def surrogate_from(e):
        def rhs(t, u, p):
            gd = 12.0 * jnp.cos(t)
            return f1.apply(p["f1"], jnp.concatenate([u, gd[None]]))

        sol = ude.solve(
            ude.ODEProblem(rhs, jnp.zeros(1) + e, (0.0, T_END), params),
            ude.Tsit5(), saveat=ts, rtol=1e-5, atol=1e-7,
            adjoint=ude.NoAdjoint(), max_steps=256,
        )
        gd = 12.0 * jnp.cos(ts)
        inp = jnp.stack([sol.ys[:, 0], gd], axis=1)
        return jax.vmap(lambda x: f0.apply(params["f0"], x)[0])(inp).sum()

    K = 64
    eps = jnp.linspace(0.0, 1e-4, K)
    chain = jax.jit(lambda es: jax.lax.map(surrogate_from, es).sum())
    null = jax.jit(lambda x: x + 1.0)
    t_chain = time_host(lambda: chain(eps))
    t_null = time_host(lambda: null(jnp.zeros(())))
    t_sur = max(t_chain - t_null, 1e-9) / K
    return {
        "surrogate_us_per_solve": round(t_sur * 1e6, 1),
        "dae_us_per_solve": round(t_dae * 1e6, 1),
        "speedup": round(t_dae / t_sur, 1),
    }


def main():
    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
