"""LM-first training-schedule experiment for the LV recovery study.

The r04 steady-state probe attributes ~279 of ~433 ms/lane to the BFGS
stage (4 rounds x 250 strong-Wolfe iterations — sequential-depth bound on
the tunneled TPU), while each LM round is ~12 damped-Newton steps whose
Jacobian tangent sims batch in parallel.  This experiment asks whether an
LM-heavier schedule reaches the same recovery rates cheaper (the
`select_by_simulation` refit_method="lm" precedent cut the judge 4x).

Runs the full train+judge pipeline (archive off, oracle/weak arms off) at
``--runs-per-level`` lanes per noise level under several
(bfgs_rounds, lm_rounds) schedules and reports, per schedule: steady-state
ms per recovery (the row-5 definition: chunks after the first + the
restart pass) and per-level exact/contains rates.  Writes a committed
artifact with ``--out`` (e.g. benchmarks/lm_schedule_r05.json).

Usage: python benchmarks/lm_schedule.py [--runs-per-level 20]
       [--schedules 4:2,2:3,1:4] [--out benchmarks/lm_schedule_r05.json]
"""
import argparse
import importlib.util
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax

from universal_differential_equations_tpu.utils import enable_compilation_cache


def _load_run_loops():
    path = ROOT / "examples/lotka_volterra/run_loops.py"
    spec = importlib.util.spec_from_file_location("run_loops", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def measure_schedule(rl, bfgs_rounds, lm_rounds, runs_per_level):
    t0 = time.time()
    out = rl.main(runs_per_level=runs_per_level, archive=False, resume=False,
                  oracle=False, weak=False, assert_gates=False,
                  bfgs_rounds=bfgs_rounds, lm_rounds=lm_rounds)
    wall = time.time() - t0
    n_runs = runs_per_level * len(rl.NOISE_LEVELS)
    marks = out["chunk_walls"]
    restart_wall = out.get("restart_wall", 0.0)
    if len(marks) >= 2:
        lanes_per_chunk = n_runs / len(marks)
        per = ((marks[-1] - marks[0] + restart_wall)
               / (n_runs - lanes_per_chunk) * 1e3)
    else:
        per = marks[-1] / n_runs * 1e3
    return dict(schedule=f"{bfgs_rounds}x{rl.BFGS_ITERS_PER_ROUND}bfgs"
                         f"+{lm_rounds}lm",
                bfgs_rounds=bfgs_rounds, lm_rounds=lm_rounds,
                steady_ms_per_run=round(per, 0),
                total_wall_s=round(out["wall"], 1),
                experiment_wall_s=round(wall, 1),
                restart_lanes=out.get("restart_lanes", 0),
                exact=[round(x, 3) for x in out["exact"]],
                contains=[round(x, 3) for x in out["contains"]],
                probe=out.get("probe", {}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=20)
    ap.add_argument("--schedules", default="4:2,2:3,1:4")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    enable_compilation_cache()
    rl = _load_run_loops()
    results = []
    for spec_s in args.schedules.split(","):
        b, l = (int(x) for x in spec_s.split(":"))
        print(f"=== schedule bfgs_rounds={b}, lm_rounds={l} ===", flush=True)
        r = measure_schedule(rl, b, l, args.runs_per_level)
        results.append(r)
        print(json.dumps(r), flush=True)
    print("\n| schedule | steady ms/run | exact rates |")
    print("|---|---|---|")
    for r in results:
        print(f"| {r['schedule']} | {r['steady_ms_per_run']} | "
              f"{'/'.join(f'{100 * x:.0f}' for x in r['exact'])}% |")
    if args.out:
        payload = dict(platform=jax.devices()[0].platform,
                       device=str(jax.devices()[0]),
                       runs_per_level=args.runs_per_level, rows=results)
        Path(args.out).write_text(json.dumps(payload, indent=1) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
