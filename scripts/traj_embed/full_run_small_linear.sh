#!/usr/bin/env bash
# Small TrajEmbed run with the linear-CRF head (reference
# scripts/traj_embed/full_run_small_linear.sh shape).
set -euo pipefail
OUT=${OUT:-runs/traj_embed_small}
ACTS=${ACTS:-runs/test_rgen/data/activities.csv}

ananke make-purposes --activities-csv "$ACTS" --out-csv "$OUT/purposes.csv"
ananke traj-embed --activities-csv "$ACTS" --purposes-csv "$OUT/purposes.csv" \
    --crf-mode linear --epochs 1000 --batch 32 --outdir "$OUT"
ananke gval-traj --ckpt "$OUT/ckpt_best.ckpt" --num-gen 10000 \
    --gen-csv "$OUT/gen.csv" --val-csv "$ACTS" \
    --summary-json "$OUT/summary.json"
ananke visualize-combined-traj --trajectory-csv "$OUT/gen.csv" --outdir "$OUT/figs"
