#!/usr/bin/env bash
# Full phase0->3 decode-variant sweep — one command reproduces the
# reference's whole scripts/test_rgen matrix on synthetic data
# (VERDICT r3 #6).
#
# Reference orchestration mirrored (scripts/test_rgen/ in the
# reference repo):
#   process_train/phase0*.sh        -> phase 0 below
#   base_cnn/{base_train,phase1,phase1_rejection}.sh
#                                   -> base_cnn fit + VAE_CNN{,_rejection}
#   only_pmd/{pmd_train,phase2,phase2_rejection}.sh
#                                   -> auto_pmd fit + AUTO_PMD{,_rejection}
#   crf/prep/phase3_prep_{base,pmd}_crf.sh
#                                   -> per-family CRF data prep + training
#   crf/base/phase3_base_crf{,_rejection,_nonhome}.sh
#                                   -> VAE_CNN_CRF{,_rejection,_constrained}
#   crf/pmd/phase3_pmd{,_rejection,_nonhome}.sh
#                                   -> AUTO_PMD_CRF{,_rejection,_constrained}
#   hold/phase2_given_pds.sh        -> pmd_given_pds fit + PMD_GIVEN_PDS
#   hold/compare.sh                 -> compare-samples over the matrix
#
# Sample-file stems are the model names the comparison tables/plots key
# on. Every variant lands in $OUT/samples so metric-tables,
# plot-overview and compare-samples see the full matrix at once.
#
# Env knobs: OUT (workdir), N (population size), EPOCHS / CRF_EPOCHS
# (training budgets — the reference's 500-epoch defaults when unset),
# GRID (minutes per bin; 5 = the reference's grid, coarser for smokes).
set -euo pipefail
cd "$(dirname "$0")/../.."
# console script when the package is installed; module run otherwise
if ! command -v rgen_schedule >/dev/null 2>&1; then
  rgen_schedule() { python -m ananke_abm_tpu.cli.rgen_schedule "$@"; }
fi
OUT=${OUT:-runs/test_rgen_matrix}
N=${N:-42817}
EPOCHS=${EPOCHS:-}
CRF_EPOCHS=${CRF_EPOCHS:-500}
GRID=${GRID:-5}
mkdir -p "$OUT"/{data,pds,runs,samples,reports,tables,overview,comparison_report}

resolve_cfg() {  # resolve_cfg <src.yaml> <dst.yaml> [pds_path]
  python - "$1" "$2" "${3:-}" <<'PY'
import sys, yaml
src, dst, pds = sys.argv[1], sys.argv[2], sys.argv[3]
cfg = yaml.safe_load(open(src))
import os
out = os.environ["OUT"]
cfg["data"]["npz"] = f"{out}/data/train_5min.npz"
if pds:
    cfg["model"]["pds_path"] = pds
ep = os.environ.get("EPOCHS")
if ep:
    cfg["train"]["epochs"] = int(ep)
    cfg["train"]["min_epochs"] = min(int(ep), cfg["train"].get("min_epochs", int(ep)))
yaml.safe_dump(cfg, open(dst, "w"))
PY
}

echo "== phase 0: synthesize + rasterize =="
python - <<PY
from ananke_abm_tpu.data_generator.population import generate_population_activities
generate_population_activities($N, seed=0).to_csv("$OUT/data/activities.csv", index=False)
PY
rgen_schedule prepare --activities "$OUT/data/activities.csv" --grid "$GRID" \
    --out "$OUT/data/train_5min.npz" --val-frac 0.1 --seed 42

echo "== PDS statistics =="
rgen_schedule compute-pds --grid "$OUT/data/train_5min.npz" \
    --out "$OUT/pds/pds" --grid-min "$GRID" \
    --purpose-json "$OUT/data/train_5min_purpose_map.json"

echo "== fit: base_cnn (phase1), auto_pmd (phase2), pmd_given_pds =="
export OUT
resolve_cfg configs/phase1.yaml "$OUT/phase1_resolved.yaml"
rgen_schedule fit --config "$OUT/phase1_resolved.yaml" \
    --output-dir "$OUT/runs/base_cnn" --seed 123
resolve_cfg configs/phase2.yaml "$OUT/phase2_resolved.yaml" "$OUT/pds/pds_pds.npz"
rgen_schedule fit --config "$OUT/phase2_resolved.yaml" \
    --output-dir "$OUT/runs/auto_pmd" --seed 123
# the reference's hold/ variant trains against the FULL-population PDS;
# on synthetic data the train-grid PDS plays that role
resolve_cfg configs/phase2_given_pds.yaml "$OUT/phase2_given_pds_resolved.yaml" "$OUT/pds/pds_pds.npz"
rgen_schedule fit --config "$OUT/phase2_given_pds_resolved.yaml" \
    --output-dir "$OUT/runs/pmd_given_pds" --seed 123

train_crf() {  # train_crf <vae_run> <crf_dir>
  rgen_schedule prepare-crf-data \
      --vae_ckpt "$OUT/runs/$1/checkpoints/best_val.ckpt" \
      --splits "$OUT/data/train_5min_splits.npz" --outdir "$OUT/$2"
  python - "$2" <<PY
import os, sys, yaml
out, d = os.environ["OUT"], sys.argv[1]
yaml.safe_dump({"crf": {
  "train_npz": f"{out}/{d}/crf_train.npz", "val_npz": f"{out}/{d}/crf_val.npz",
  "save_path": f"{out}/{d}/crf_linear.ckpt", "meta_json": f"{out}/{d}/crf_meta.json",
  "num_epochs": int(os.environ.get("CRF_EPOCHS", 500)), "batch_size": 32,
  "lr": 1e-3, "weight_decay": 1e-4, "log_every": 50,
}}, open(f"{out}/{d}_resolved.yaml", "w"))
PY
  rgen_schedule train-crf --cfg "$OUT/${2}_resolved.yaml"
}

echo "== CRF prep + training (per family, like crf/prep/*) =="
train_crf base_cnn crf_data_base
train_crf auto_pmd crf_data

sample() {  # sample <vae_run> <name> <seed> [extra flags...]
  local run=$1 name=$2 seed=$3; shift 3
  rgen_schedule sample-population \
      --ckpt "$OUT/runs/$run/checkpoints/best_val.ckpt" \
      --num-samples "$N" --outprefix "$OUT/samples/$name" \
      --seed "$seed" "$@"
}

echo "== phase 3: decode-variant matrix =="
sample base_cnn VAE_CNN 1
sample base_cnn VAE_CNN_rejection 2 --reject-all-home
sample base_cnn VAE_CNN_CRF 3 --decode-mode crf --crf-path "$OUT/crf_data_base/crf_linear.ckpt"
sample base_cnn VAE_CNN_CRF_rejection 4 --decode-mode crf --crf-path "$OUT/crf_data_base/crf_linear.ckpt" --reject-all-home
sample base_cnn VAE_CNN_CRF_constrained 5 --decode-mode crf --crf-path "$OUT/crf_data_base/crf_linear.ckpt" --enforce-nonhome
sample auto_pmd AUTO_PMD 6
sample auto_pmd AUTO_PMD_rejection 7 --reject-all-home
sample auto_pmd AUTO_PMD_CRF 8 --decode-mode crf --crf-path "$OUT/crf_data/crf_linear.ckpt"
sample auto_pmd AUTO_PMD_CRF_rejection 9 --decode-mode crf --crf-path "$OUT/crf_data/crf_linear.ckpt" --reject-all-home
sample auto_pmd AUTO_PMD_CRF_constrained 10 --decode-mode crf --crf-path "$OUT/crf_data/crf_linear.ckpt" --enforce-nonhome
sample pmd_given_pds PMD_GIVEN_PDS 11

echo "== evaluate every variant =="
for M in VAE_CNN VAE_CNN_rejection VAE_CNN_CRF VAE_CNN_CRF_rejection \
         VAE_CNN_CRF_constrained AUTO_PMD AUTO_PMD_rejection AUTO_PMD_CRF \
         AUTO_PMD_CRF_rejection AUTO_PMD_CRF_constrained PMD_GIVEN_PDS; do
  rgen_schedule eval-population --samples "$OUT/samples/$M.npz" \
      --samples-meta "$OUT/samples/${M}_meta.json" \
      --reference "$OUT/data/train_5min.npz" \
      --out-json "$OUT/reports/$M.json"
done

echo "== comparison tables / plots / report over the matrix =="
rgen_schedule metric-tables --ref-npz "$OUT/data/train_5min.npz" \
    --ref-meta "$OUT/data/train_5min_meta.json" \
    --compare-dir "$OUT/samples" --outdir "$OUT/tables"
rgen_schedule plot-overview --ref-npz "$OUT/data/train_5min.npz" \
    --ref-meta "$OUT/data/train_5min_meta.json" \
    --compare-dir "$OUT/samples" --outdir "$OUT/overview"
CMP_ARGS=()
for M in "$OUT"/samples/*.npz; do
  P=${M%.npz}
  CMP_ARGS+=(--sample "$(basename "$P")=$P")
done
rgen_schedule compare-samples "${CMP_ARGS[@]}" \
    --reference "$OUT/data/train_5min.npz" \
    --outdir "$OUT/comparison_report"

echo "variant matrix complete: $OUT"
