#!/bin/bash
# Small-scale TrajEmbed submission (reference scripts/m3/run_small.sh
# budgets: 200 epochs, batch 32, lr 1e-3, val 0.2). The reference targets
# Monash M3 SLURM + GPUs; on a TPU queue swap the partition/gres lines
# for your site's TPU resource directives.
#SBATCH --job-name=smallMelbAct
#SBATCH --output=smallMelb.out
#SBATCH --error=smallMelb.err
#SBATCH --time=60:00:00
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=4
set -euo pipefail

OUT=${OUT:-runs/cluster_small}
ACTS=${ACTS:-runs/test_rgen/data/activities.csv}
PURP=${PURP:-}
mkdir -p "$OUT"
[ -n "$PURP" ] || {
  PURP="$OUT/purposes.csv"
  ananke make-purposes --activities-csv "$ACTS" --out-csv "$PURP"
}

ananke traj-embed \
  --activities-csv "$ACTS" \
  --purposes-csv "$PURP" \
  --outdir "$OUT" \
  --epochs 200 \
  --batch 32 \
  --lr 1e-3 \
  --val-ratio 0.2
