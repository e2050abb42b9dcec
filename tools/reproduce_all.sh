#!/bin/bash
# Reproduce every README number on a TPU host, sequentially.
# Each example asserts its scientific claim and writes its figures;
# benchmarks print one JSON line each.  Total wall-clock: ~1.5 h warm
# (first run compiles more; the persistent cache makes reruns fast).
set -ex   # -e: a failing test run or benchmark must abort, not report success
cd "$(dirname "$0")/.."

python -m pytest tests/ -q                                   # CPU, ~10 min

python bench.py                                              # headline metric
python benchmarks/run_all.py                                 # baseline table (11 rows)
python benchmarks/pallas_rhs_bench.py                        # kernel accuracy/speed
python benchmarks/fenep_bench.py                             # surrogate vs DAE
python benchmarks/climate_adjoint_bench.py                   # adjoint eval time
python benchmarks/work_precision.py --plot                   # solver-shelf curves (CPU)

for ex in \
    examples/lotka_volterra/scenario_1.py \
    examples/lotka_volterra/scenario_2.py \
    examples/lotka_volterra/scenario_3.py \
    examples/lotka_volterra/hudson_bay.py \
    examples/lotka_volterra/run_loops.py \
    examples/seir_exposure/seir_exposure.py \
    examples/fisher_kpp/fisher_kpp.py \
    examples/non_newtonian/fenep.py \
    examples/climate/data_generation.py \
    examples/climate/neural_pde.py \
    examples/climate/neural_pde_data.py \
    examples/climate/training_rt.py \
    examples/highdim_pde/hjb_100d.py; do
  python "$ex" --plot || exit 1
done

# the remaining Fisher-KPP study variants (the fourier default ran above)
for v in fourier5 fourier7 small small7 small4; do
  python examples/fisher_kpp/fisher_kpp.py --variant "$v" || exit 1
done

python __graft_entry__.py                                    # driver gates
