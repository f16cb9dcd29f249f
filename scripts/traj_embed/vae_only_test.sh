#!/usr/bin/env bash
# VAE-only variant (reference scripts/traj_embed/vae_only_test.sh shape).
set -euo pipefail
OUT=${OUT:-runs/traj_vae_only}
ACTS=${ACTS:-runs/test_rgen/data/activities.csv}

ananke traj-embed --activities-csv "$ACTS" --vae-only --epochs 500 --outdir "$OUT"
python - <<PY
from ananke_abm_tpu.models.traj_syn.pipeline.vae_only import synthesize_vae, analyze_vae
npz = synthesize_vae("$OUT/ckpt_best.ckpt", 10000, "$OUT/syn.npz")
analyze_vae(npz, "$OUT/analysis.json")
PY
