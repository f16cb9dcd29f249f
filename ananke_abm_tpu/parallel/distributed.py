"""Multi-host initialization for pod runs.

Single-host, multi-chip needs nothing; on a TPU pod each host process
calls :func:`maybe_initialize` once before any jax computation — the TPU
runtime supplies coordinator/process-count discovery, so no MPI-style
rendezvous configuration is required (contrast with the reference's SLURM
scripts, which only ever used one device).
"""
from __future__ import annotations

import jax

_initialized = False


def maybe_initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed when running multi-process; no-op when
    single-process. Returns a summary dict (process_index/count, devices).
    """
    global _initialized
    if not _initialized and (
        coordinator_address is not None or num_processes is not None
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
