"""Driver benchmark: Fisher-KPP universal-PDE training wall-clock on TPU.

The reference's headline timed result: full training of the Fourier-reaction
universal PDE to loss < 0.01 takes ≈236.8 s on CPU (mean of 5 runs pasted in
``FisherKPP/Fisher-KPP-CNN-Fourier.jl:305-329``; BASELINE.md row 1).  This
benchmark runs the same task end-to-end on one TPU chip — same data grid,
same model family (3-parameter spectral reaction + learnable 3-tap stencil +
D0), same convergence criterion — using the framework's Levenberg-Marquardt
trainer with forward-mode Jacobians through the adaptive stepper.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_seconds / ours (>1 ⇒ faster than the reference).
A secondary benchmark (climate neural-PDE adjoint evaluation vs the
reference's measured 0.879 s) lives in benchmarks/climate_adjoint_bench.py.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

import universal_differential_equations_tpu as ude
from universal_differential_equations_tpu.models import fisher_kpp as fk
from universal_differential_equations_tpu.train import levenberg_marquardt
from universal_differential_equations_tpu.utils import enable_compilation_cache

BASELINE_SECONDS = 236.8  # Fisher-KPP-CNN-Fourier.jl:305-329, mean of 5 runs


def make_residuals(rhs, ts, data):
    def residuals(p):
        # Unstable candidate params that exhaust max_steps are mapped to inf
        # residuals so LM rejects them instead of fitting a silently clamped
        # dense-output tail (accepted iterates need ≤45 steps, measured).
        sol = ude.solve(
            ude.ODEProblem(rhs, data[0], (0.0, fk.T_END), p), ude.Tsit5(),
            saveat=ts, rtol=1e-4, atol=1e-6,
            adjoint=ude.ForwardSensitivity(), max_steps=192,
        )
        pen = jnp.sqrt(fk.zero_sum_penalty(p) + 1e-30)
        r = jnp.concatenate([(sol.ys - data).ravel(), pen[None]])
        return jnp.where(sol.success, r, jnp.inf)

    return residuals


def train_run(seed, residuals):
    # rhs is seed-independent (the key only draws the initial reaction
    # weights), so one residual closure serves every seed and the LM core's
    # jit cache makes runs after the first retrace-free.
    _, params0 = fk.make_model(jax.random.PRNGKey(seed), "fourier")
    t0 = time.perf_counter()
    res = levenberg_marquardt(residuals, params0, maxiters=100, loss_tol=0.01)
    jax.block_until_ready(res.loss)
    wall = time.perf_counter() - t0
    return wall, float(res.loss)


# child-process device probe with busy-marker handling — shared with the
# crash-resilient example training loops
from universal_differential_equations_tpu.utils import probe_device  # noqa: E402


def main():
    enable_compilation_cache()
    ts, data = fk.generate_data()
    rhs, _ = fk.make_model(jax.random.PRNGKey(0), "fourier")
    residuals = make_residuals(rhs, ts, data)
    walls, losses = [], []
    # The TPU worker crashes sporadically (watchdog); a crashed run raises.
    # Retry each seed once ONLY after the device answers a probe again —
    # after a crash dispatches hang rather than error (CLAUDE.md), so
    # retrying against a wedged device would block forever.  If the probe
    # deadline passes without recovery, stop and report over the runs that
    # completed (≥2 required).
    device_dead = False
    for seed in range(4):  # seed 0 includes compile; report median
        if device_dead:
            break
        for attempt in range(2):
            try:
                wall, loss = train_run(seed, residuals)
            except Exception as e:  # noqa: BLE001 — device/runtime faults
                print(f"# seed {seed} attempt {attempt} failed: {e!r}",
                      file=sys.stderr)
                deadline = time.time() + 600
                recovered = False
                while time.time() < deadline:
                    if probe_device():
                        recovered = True
                        break
                    time.sleep(30)
                if not recovered:
                    print("# device did not recover; stopping retries",
                          file=sys.stderr)
                    device_dead = True
                    break
                continue
            walls.append(wall)
            losses.append(loss)
            break
    assert len(walls) >= 2, f"only {len(walls)} benchmark runs completed"
    assert all(l < 0.01 for l in losses), f"convergence failed: {losses}"
    # null-dispatch RTT: the tunnel adds 24-69 ms per dispatch between
    # sessions (CLAUDE.md).  Each LM train run is a handful of device
    # programs, so session drift alone moves the headline by ~0.05-0.1 s —
    # recording the measured RTT in-band lets a reader reconcile this
    # number with the same metric in benchmarks/results_r*.json without
    # external context (one shared definition: utils.null_dispatch_seconds)
    from universal_differential_equations_tpu.utils import (
        null_dispatch_seconds,
    )

    rtt_ms = null_dispatch_seconds()["mean_s"] * 1e3
    walls_raw = list(walls)
    walls.sort()
    median = walls[len(walls) // 2]
    print(json.dumps({
        "metric": "fisherkpp_fourier_train_to_loss_0.01",
        "value": round(median, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / median, 1),
        "extra": {
            "walls_s": [round(w, 3) for w in walls_raw],
            "null_dispatch_ms": round(rtt_ms, 1),
            "definition": "median wall over seeds (seed 0 carries cached-"
                          "compile warmup); per-dispatch tunnel RTT above "
                          "— session drift in it explains cross-artifact "
                          "differences on this metric",
        },
    }))


if __name__ == "__main__":
    main()
