"""Multi-host initialization + per-host data feeding for pod runs.

Single-host, multi-chip needs nothing; on a TPU pod each host process
calls :func:`maybe_initialize` once before any jax computation — the TPU
runtime supplies coordinator/process-count discovery, so no MPI-style
rendezvous configuration is required (contrast with the reference's SLURM
scripts, which only ever used one device).

Pod-scale data path (BASELINE config 5): each host materializes ONLY its
own rows — :func:`host_row_slice` says which global rows this process
owns, and :func:`host_local_batch_to_global` assembles the host-local
rows into one globally-sharded ``jax.Array`` via
``jax.make_array_from_process_local_data`` (no host ever holds the full
global batch).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

_initialized = False


def global_batch_shape(local_shape: tuple, process_count: int) -> tuple:
    """Global shape of a batch whose leading (row) axis is split evenly
    across ``process_count`` host processes."""
    return (local_shape[0] * process_count,) + tuple(local_shape[1:])


def host_row_slice(n_global_rows: int, process_index: int | None = None,
                   process_count: int | None = None) -> slice:
    """[start, stop) of the global rows this host process owns (even
    split; ``n_global_rows`` must divide by the process count)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if n_global_rows % pc:
        raise ValueError(
            f"n_global_rows={n_global_rows} not divisible by "
            f"process_count={pc}"
        )
    per = n_global_rows // pc
    return slice(pi * per, (pi + 1) * per)


def host_local_batch_to_global(mesh: Mesh, tree, axis_name: str = AGENT_AXIS):
    """Assemble per-host local rows into globally-sharded jax.Arrays.

    Each process passes only its own rows (its :func:`host_row_slice` of
    the global batch); leaves come back as global arrays sharded over
    ``axis_name`` with per-host data staying on that host's devices. On a
    single process this degenerates to a sharded device_put.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_batch_shape(x.shape, jax.process_count())
        )

    return jax.tree_util.tree_map(one, tree)


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
