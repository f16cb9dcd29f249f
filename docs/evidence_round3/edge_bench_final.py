"""Definitive edge-kernel head-to-head (round 3, exact two-pass kernel +
bounded single-sweep mode) — the numbers behind ops/segment.py's
dispatch rule. Sync via scalar pull (block_until_ready alone does not
force execution on the remote axon backend)."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.ops.pallas.edge_segment import gat_edge_aggregate_pallas
from ananke_abm_tpu.ops.segment import edge_softmax_attention

REPS = 30


def timeit(fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*a)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    return (time.time() - t0) / REPS * 1e3


results = []
for Z, deg, D in [(512, 16, 64), (2048, 16, 64), (2048, 64, 64),
                  (4096, 16, 64), (4096, 16, 128), (8192, 16, 64)]:
    E = Z * deg
    rng = np.random.default_rng(Z + deg)
    src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
    dst = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
    Wh = jnp.asarray(rng.normal(size=(Z, D)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.3
    a_d = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) * 0.3
    qs, qd = Wh @ a_s, Wh @ a_d

    @jax.jit
    def xla_path(Wh, qs, qd, src, dst, Z=Z):
        e = jax.nn.leaky_relu(qs[src] + qd[dst], negative_slope=0.2)
        return edge_softmax_attention(Wh[src], e, dst, Z)

    @jax.jit
    def pallas_exact(Wh, qs, qd, src, dst):
        return gat_edge_aggregate_pallas(Wh, qs, qd, src, dst,
                                         score_shift="exact")

    @jax.jit
    def pallas_bounded(Wh, qs, qd, src, dst):
        return gat_edge_aggregate_pallas(Wh, qs, qd, src, dst,
                                         score_shift="bounded")

    row = {"Z": Z, "deg": deg, "D": D, "E": E}
    row["xla_ms"] = timeit(xla_path, Wh, qs, qd, src, dst)
    row["pallas_exact_ms"] = timeit(pallas_exact, Wh, qs, qd, src, dst)
    row["pallas_bounded_ms"] = timeit(pallas_bounded, Wh, qs, qd, src, dst)
    a = np.asarray(xla_path(Wh, qs, qd, src, dst))
    for mode, fn in (("exact", pallas_exact), ("bounded", pallas_bounded)):
        b = np.asarray(fn(Wh, qs, qd, src, dst))
        row[f"rel_err_{mode}"] = float(
            np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        )
    row["speedup_exact"] = row["xla_ms"] / row["pallas_exact_ms"]
    row["speedup_bounded"] = row["xla_ms"] / row["pallas_bounded_ms"]
    results.append(row)
    print({k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in row.items()}, flush=True)

with open("edge_bench_final.json", "w") as f:
    json.dump(results, f, indent=2)
