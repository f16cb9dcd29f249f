#!/usr/bin/env bash
# Cluster submission wrapper (the reference targets Monash M3 SLURM,
# scripts/m3/*; on a TPU pod this is one process per host under the same
# entry — jax.distributed picks hosts up from the TPU runtime).
set -euo pipefail
export OUT=${OUT:-runs/full}
bash scripts/test_rgen/phase0_prepare.sh
bash scripts/test_rgen/phase1_fit.sh
bash scripts/test_rgen/phase2_pds_crf.sh
bash scripts/test_rgen/phase3_sample_eval.sh
