#!/bin/bash
# VAE-only full submission (reference scripts/m3/run_vae_only_full.sh
# budgets: 5000 epochs, 500k generations + diagnostics + figures).
#SBATCH --job-name=VAE_only_full
#SBATCH --output=VAE_only_full.out
#SBATCH --error=VAE_only_full.err
#SBATCH --time=90:00:00
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=4
set -euo pipefail

OUT=${OUT:-runs/cluster_vae_only}
ACTS=${ACTS:-runs/test_rgen/data/activities.csv}
mkdir -p "$OUT"

ananke traj-embed \
  --activities-csv "$ACTS" \
  --vae-only \
  --outdir "$OUT" \
  --epochs 5000 \
  --batch 32 \
  --lr 1e-3 \
  --val-ratio 0.2

python - <<PY
from ananke_abm_tpu.models.traj_syn.pipeline.vae_only import (
    analyze_vae, synthesize_vae,
)
npz = synthesize_vae("$OUT/ckpt_best.ckpt", 500000, "$OUT/gen_vae.npz")
analyze_vae(npz, "$OUT/vae_diag.json")
PY
