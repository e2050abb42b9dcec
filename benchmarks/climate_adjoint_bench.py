"""Driver benchmark: climate neural-PDE adjoint loss+gradient on real TPU.

Reproduces the one wall-clock measurement committed in the reference:
``Climate/NeuralPDE/timing.txt`` records 0.879/0.938/0.896 s for a single
adjoint loss+gradient evaluation of the 1-D neural PDE (GeForce MX150-era
hardware).  This benchmark runs the same-shaped evaluation — 30-point column,
D1·NN(u)+D2·u right-hand side, 30-point saveat grid, continuous interpolating
adjoint — jitted on the TPU, and reports median wall-clock per loss+grad.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_seconds / ours (>1 means faster than the reference).

``--compare-adjoints`` additionally measures InterpolatingAdjoint vs
QuadratureAdjoint (the λ-only backward, ``adjoint/sensitivity.py``) on the
reference-width (518-param) and a production-width (82k-param) neural flux,
reporting wall-clock AND the compiled program's temp-buffer footprint — the
memory story that motivates the quadrature variant: its backward state is
state-sized, not state+parameter-sized.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.models import climate_npde as cn

BASELINE_SECONDS = 0.879  # Climate/NeuralPDE/timing.txt:1


def compare_adjoints():
    """InterpolatingAdjoint vs QuadratureAdjoint: wall-clock + compiled
    temp-buffer bytes at 518 and 82k parameters (VERDICT r1 §next-round 5)."""
    D1, D2, _ = cn.getops(32)
    u0 = cn.get_u0(32)
    ts = jnp.linspace(0.0, 1.5, 30, dtype=jnp.float32)
    truth = ude.solve(
        ude.ODEProblem(cn.true_rhs, u0, (0.0, 1.5), (D1, D2)), ude.Tsit5(),
        saveat=ts, rtol=1e-6, atol=1e-8, adjoint=ude.NoAdjoint(),
        max_steps=4096,
    )
    data = truth.ys
    rows = []
    for hidden, tag in ((8, "518p"), (1344, "82k"), (8192, "500k")):
        rhs, params0, _ = cn.make_neural_rhs(jax.random.PRNGKey(0),
                                             hidden=hidden)
        n_params = sum(x.size for x in jax.tree.leaves(params0))

        def make_vg(adjoint):
            def loss(params):
                sol = ude.solve(
                    ude.ODEProblem(rhs, u0, (0.0, 1.5), (params, D1, D2)),
                    ude.Tsit5(), saveat=ts, rtol=1e-4, atol=1e-6,
                    adjoint=adjoint, max_steps=2048,
                )
                return jnp.sum((sol.ys - data) ** 2)

            return jax.jit(jax.value_and_grad(loss))

        grads = {}
        adjoints = [("interpolating", ude.InterpolatingAdjoint()),
                    ("quadrature", ude.QuadratureAdjoint())]
        if hidden == 8:
            # BacksolveAdjoint row at the reference width: re-integrating
            # the state backward through κ∂²z is exponentially unstable
            # (the reason npde_data.jl:82 pins backsolve=false) — the row
            # documents by how much the gradient degrades, not a win
            adjoints.append(("backsolve", ude.BacksolveAdjoint()))
        for name, adj in adjoints:
            vg = make_vg(adj)
            lowered = vg.lower(params0)
            compiled = lowered.compile()
            try:
                temp_mb = compiled.memory_analysis().temp_size_in_bytes / 2**20
            except Exception:
                temp_mb = float("nan")
            l, g = vg(params0)
            jax.block_until_ready((l, g))
            assert jnp.isfinite(l), f"{name}/{tag}: non-finite loss {l}"
            times = []
            for _ in range(10):
                t0 = time.perf_counter()
                l, g = vg(params0)
                jax.block_until_ready((l, g))
                times.append(time.perf_counter() - t0)
            times.sort()
            grads[name] = jax.flatten_util.ravel_pytree(g)[0]
            rows.append({
                "metric": f"climate_adjoint_{tag}_{name}",
                "params": int(n_params),
                "wall_ms": round(times[len(times) // 2] * 1e3, 2),
                "temp_mb": round(temp_mb, 2),
            })
            print(json.dumps(rows[-1]))
        # relative L2 over the whole gradient vector: elementwise ratios on
        # the tail of ~1e5 near-zero entries only measure f32 noise
        base = jnp.linalg.norm(grads["interpolating"]) + 1e-30
        for other in grads:
            if other == "interpolating":
                continue
            rel = float(jnp.linalg.norm(grads[other]
                                        - grads["interpolating"]) / base)
            print(json.dumps({
                "metric": f"climate_adjoint_{tag}_{other}_grad_agreement",
                "rel_l2": float(f"{rel:.3g}") if np.isfinite(rel) else "inf",
            }))
    return rows


def main():
    D1, D2, eig = cn.getops(32)
    u0 = cn.get_u0(32)
    ts = jnp.linspace(0.0, 1.5, 30, dtype=jnp.float32)

    # ground truth (npde.jl:59-63); tolerance relaxed to f32-reachable
    truth = ude.solve(
        ude.ODEProblem(cn.true_rhs, u0, (0.0, 1.5), (D1, D2)), ude.Tsit5(),
        saveat=ts, rtol=1e-6, atol=1e-8, adjoint=ude.NoAdjoint(),
        max_steps=4096,
    )
    data = truth.ys

    rhs, params0, net = cn.make_neural_rhs(jax.random.PRNGKey(0))

    def loss(params):
        sol = ude.solve(
            ude.ODEProblem(rhs, u0, (0.0, 1.5), (params, D1, D2)), ude.Tsit5(),
            saveat=ts, rtol=1e-4, atol=1e-6,
            adjoint=ude.InterpolatingAdjoint(), max_steps=2048,
        )
        return jnp.sum((sol.ys - data) ** 2)

    value_and_grad = jax.jit(jax.value_and_grad(loss))

    # warmup/compile
    l, g = value_and_grad(params0)
    jax.block_until_ready((l, g))
    assert jnp.isfinite(l), f"non-finite loss {l}"

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        l, g = value_and_grad(params0)
        jax.block_until_ready((l, g))
        times.append(time.perf_counter() - t0)
    times.sort()
    median = times[len(times) // 2]

    # in-band reconciliation with run_all.py row 3 (which reports CHAINED
    # device time, null dispatch subtracted): this bench's per-dispatch
    # median includes one tunnel RTT, measured here with the shared
    # definition so the two committed numbers explain their own gap
    from universal_differential_equations_tpu.utils import (
        null_dispatch_seconds,
    )

    rtt_ms = null_dispatch_seconds()["mean_s"] * 1e3
    print(json.dumps({
        "metric": "climate_npde_adjoint_loss_grad",
        "value": round(median * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_SECONDS / median, 2),
        "extra": {
            "null_dispatch_ms": round(rtt_ms, 1),
            "definition": "per-dispatch median wall incl. one tunnel RTT; "
                          "results_r*.json row climate_adjoint_loss_grad "
                          "is the chained null-subtracted device time",
        },
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--compare-adjoints", action="store_true",
                    help="also benchmark InterpolatingAdjoint vs "
                         "QuadratureAdjoint at 518 and 82k params "
                         "(wall-clock + compiled temp bytes)")
    args = ap.parse_args()
    if args.compare_adjoints:
        compare_adjoints()
    else:
        main()
