"""Worker for tests/test_distributed.py: one of two CPU processes.

Proves the pod data path end-to-end across REAL process boundaries
(SURVEY §2.7 comms design; VERDICT r4 #4): jax.distributed rendezvous,
per-host row feeding via host_local_batch_to_global (each process passes
ONLY its own rows), and a sharded SGD step whose gradient psum crosses
the process boundary through gloo CPU collectives. The parent test
asserts the trained params equal the single-process computation.
"""
import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    # CPU backend with cross-process gloo collectives; config (not env)
    # because sitecustomize may already have pinned the platform list.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_process)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from ananke_abm_tpu.parallel.distributed import (
        host_local_batch_to_global,
        host_row_slice,
        maybe_initialize,
    )

    info = maybe_initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

    mesh = Mesh(np.array(jax.devices()), (AGENT_AXIS,))

    # deterministic global problem, same on every host
    N, D = 16, 4
    rng = np.random.default_rng(7)
    X_global = rng.normal(size=(N, D)).astype(np.float32)
    y_global = rng.normal(size=(N,)).astype(np.float32)

    # each process materializes ONLY its own rows
    rows = host_row_slice(N)
    batch = host_local_batch_to_global(
        mesh, {"X": X_global[rows], "y": y_global[rows]}
    )

    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(AGENT_AXIS))

    @jax.jit
    def step(w, X, y):
        def loss_fn(w):
            pred = X @ w
            return jnp.mean((pred - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    w = jax.device_put(jnp.zeros((D,), jnp.float32), rep)
    X = jax.lax.with_sharding_constraint(batch["X"], sh)
    losses = []
    for _ in range(3):
        w, loss = step(w, X, batch["y"])
        losses.append(float(loss))

    out = {
        "info": info,
        "rows": [rows.start, rows.stop],
        "w": np.asarray(w).tolist(),
        "losses": losses,
        "x_is_fully_sharded": len(batch["X"].sharding.device_set)
        == args.num_processes * args.devices_per_process,
    }
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
