#!/usr/bin/env bash
# Phase 2: PDS statistics + CRF data preparation + CRF training.
set -euo pipefail
OUT=${OUT:-runs/test_rgen}

rgen_schedule compute-pds --grid "$OUT/data/train_5min.npz" \
    --out "$OUT/pds/pds" --grid-min 5 \
    --purpose-json "$OUT/data/train_5min_purpose_map.json"

rgen_schedule prepare-crf-data --vae_ckpt "$OUT/vae/checkpoints/best_val.ckpt" \
    --splits "$OUT/data/train_5min_splits.npz" --outdir "$OUT/crf_data"

python - <<PY
import yaml
cfg = {"crf": {
  "train_npz": "$OUT/crf_data/crf_train.npz",
  "val_npz": "$OUT/crf_data/crf_val.npz",
  "save_path": "$OUT/crf_data/crf_linear.ckpt",
  "meta_json": "$OUT/crf_data/crf_meta.json",
  "num_epochs": 500, "batch_size": 32, "lr": 1e-3,
  "weight_decay": 1e-4, "log_every": 10}}
yaml.safe_dump(cfg, open("$OUT/crf_resolved.yaml", "w"))
PY
rgen_schedule train-crf --cfg "$OUT/crf_resolved.yaml"
