#!/bin/bash
# Full linear-CRF TrajEmbed submission (reference scripts/m3/
# run_full_linear.sh budgets: 3000 epochs, 500k generations, figures).
#SBATCH --job-name=fullMelbAct_linear
#SBATCH --output=fullMelb_linear.out
#SBATCH --error=fullMelb_linear.err
#SBATCH --time=90:00:00
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=4
set -euo pipefail

OUT=${OUT:-runs/cluster_full_linear}
ACTS=${ACTS:-runs/test_rgen/data/activities.csv}
mkdir -p "$OUT"

ananke traj-embed \
  --activities-csv "$ACTS" \
  --crf-mode linear \
  --outdir "$OUT" \
  --epochs 3000 \
  --batch 32 \
  --lr 1e-3 \
  --val-ratio 0.2 \
  --data-parallel

ananke gval-traj \
  --ckpt "$OUT/ckpt_best.ckpt" \
  --num-gen 500000 \
  --gen-csv "$OUT/gen_activities.csv" \
  --val-csv "$ACTS" \
  --eval-step-minutes 5 \
  --crf-mode linear \
  --summary-json "$OUT/summary.json"

ananke visualize-combined-traj \
  --trajectory-csv "$OUT/gen_activities.csv" \
  --outdir "$OUT/img"
