#!/usr/bin/env bash
# Full TrajEmbed run with the semi-CRF head and 300-min duration cap
# (reference scripts/m3/run_full_semi.sh shape: long run, 100k generations).
set -euo pipefail
OUT=${OUT:-runs/traj_embed_semi}
ACTS=${ACTS:-runs/test_rgen/data/activities.csv}

ananke traj-embed --activities-csv "$ACTS" --crf-mode semi \
    --semi-dmax-minutes 300 --epochs 3000 --batch 32 --outdir "$OUT"
ananke gval-traj --ckpt "$OUT/ckpt_best.ckpt" --num-gen 100000 \
    --gen-csv "$OUT/gen.csv" --val-csv "$ACTS" --crf-mode semi \
    --semi-dmax-minutes 300 --summary-json "$OUT/summary.json"
