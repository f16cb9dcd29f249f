#!/usr/bin/env bash
# Phase 3: sample populations under every decode mode, evaluate, compare.
set -euo pipefail
OUT=${OUT:-runs/test_rgen}
N=${N:-42817}
CKPT="$OUT/vae/checkpoints/best_val.ckpt"
CRF="$OUT/crf_data/crf_linear.ckpt"

rgen_schedule sample-population --ckpt "$CKPT" --num-samples "$N" \
    --outprefix "$OUT/samples/VAE_CNN" --seed 1
rgen_schedule sample-population --ckpt "$CKPT" --num-samples "$N" \
    --outprefix "$OUT/samples/VAE_CNN_CRF" --decode-mode crf --crf-path "$CRF" --seed 2
rgen_schedule sample-population --ckpt "$CKPT" --num-samples "$N" \
    --outprefix "$OUT/samples/VAE_CNN_CRF_rejection" --decode-mode crf \
    --crf-path "$CRF" --reject-all-home --seed 3
rgen_schedule sample-population --ckpt "$CKPT" --num-samples "$N" \
    --outprefix "$OUT/samples/VAE_CNN_CRF_constrained" --decode-mode crf \
    --crf-path "$CRF" --enforce-nonhome --seed 4

for M in VAE_CNN VAE_CNN_CRF VAE_CNN_CRF_rejection VAE_CNN_CRF_constrained; do
  rgen_schedule eval-population --samples "$OUT/samples/$M.npz" \
      --samples-meta "$OUT/samples/${M}_meta.json" \
      --reference "$OUT/data/train_5min.npz" \
      --out-json "$OUT/reports/$M.json"
done

rgen_schedule metric-tables --ref-npz "$OUT/data/train_5min.npz" \
    --ref-meta "$OUT/data/train_5min_meta.json" \
    --compare-dir "$OUT/samples" --outdir "$OUT/tables"
rgen_schedule plot-overview --ref-npz "$OUT/data/train_5min.npz" \
    --ref-meta "$OUT/data/train_5min_meta.json" \
    --compare-dir "$OUT/samples" --outdir "$OUT/overview"
