#!/usr/bin/env bash
# Phase 0: synthesize a population and rasterize it to the 5-min grid
# (orchestration parity with the reference's scripts/test_rgen/process_train
# pipeline, adapted to this framework's CLIs).
set -euo pipefail
OUT=${OUT:-runs/test_rgen}
N=${N:-42817}
mkdir -p "$OUT/data"

python - <<PY
from ananke_abm_tpu.data_generator.population import generate_population_activities
generate_population_activities($N, seed=0).to_csv("$OUT/data/activities.csv", index=False)
print("activities written")
PY

rgen_schedule prepare --activities "$OUT/data/activities.csv" --grid 5 \
    --out "$OUT/data/train_5min.npz" --val-frac 0.1 --seed 42
