#!/usr/bin/env bash
# Multi-host TPU pod launch for the gen_schedule trainer.
#
# STATUS: untested on real multi-host hardware — this container has one
# chip. The per-host feeding path it drives (parallel/distributed.py:
# host_row_slice + host_local_batch_to_global) is unit-tested with faked
# process counts (tests/test_mesh_pipelines.py); what has never run is an
# actual multi-process jax.distributed rendezvous.
#
# Usage (Cloud TPU pod slice): run this SAME script on EVERY worker, e.g.
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command="cd /path/to/repo && bash scripts/cluster/run_pod.sh"
#
# On Cloud TPU the JAX runtime discovers the coordinator on its own, so
# jax.distributed.initialize() needs no arguments — maybe_initialize()
# is called with none and every process sees the global device set.
# For a non-TPU-runtime cluster (e.g. SLURM + CPU mesh testing), export
#   ANANKE_COORDINATOR=host0:8476 ANANKE_NUM_PROCS=4 ANANKE_PROC_ID=$RANK
# and maybe_initialize picks them up below.
set -euo pipefail

export OUT=${OUT:-runs/pod}
export NPZ=${NPZ:-runs/test_rgen/data/grid.npz}
export EPOCHS=${EPOCHS:-500}

python - <<'PY'
import os

from ananke_abm_tpu.parallel.distributed import maybe_initialize

info = maybe_initialize(
    coordinator_address=os.environ.get("ANANKE_COORDINATOR"),
    num_processes=(
        int(os.environ["ANANKE_NUM_PROCS"])
        if "ANANKE_NUM_PROCS" in os.environ else None
    ),
    process_id=(
        int(os.environ["ANANKE_PROC_ID"])
        if "ANANKE_PROC_ID" in os.environ else None
    ),
)
print(f"pod process {info['process_index']}/{info['process_count']}: "
      f"{info['local_devices']} local / {info['global_devices']} global devices")

from ananke_abm_tpu.models.gen_schedule.pipeline.train import train
from ananke_abm_tpu.parallel.mesh import make_mesh

cfg = {
    "data": {"npz": os.environ.get("NPZ", "runs/test_rgen/data/grid.npz")},
    "train": {
        "epochs": int(os.environ.get("EPOCHS", "500")),
        "batch_size": 256 * info["global_devices"],
        "lr": 1e-3, "weight_decay": 1e-4, "grad_clip": 1.0,
        "beta_target": 1.0, "beta_warm_frac": 0.3,
        "lambda_tv": 0.01, "lambda_home": 0.1,
    },
    "model": {"method": "baseline_cnn", "z_dim": 16, "emb_dim": 32},
}
mesh = make_mesh(zone_parallel=1)  # all chips on the agents axis
train(cfg, os.environ.get("OUT", "runs/pod"), seed=0, mesh=mesh)
PY
