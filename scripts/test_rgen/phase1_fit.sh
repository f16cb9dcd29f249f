#!/usr/bin/env bash
# Phase 1: train the baseline CNN schedule VAE (reference phase1 config).
set -euo pipefail
OUT=${OUT:-runs/test_rgen}
CONFIG=${CONFIG:-configs/phase1.yaml}

python - <<PY
import yaml
cfg = yaml.safe_load(open("$CONFIG"))
cfg["data"]["npz"] = "$OUT/data/train_5min.npz"
yaml.safe_dump(cfg, open("$OUT/phase1_resolved.yaml", "w"))
PY

rgen_schedule fit --config "$OUT/phase1_resolved.yaml" \
    --output-dir "$OUT/vae" --seed 123
