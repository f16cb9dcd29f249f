"""Round-4 queued measurement (VERDICT r3 #1): the BATCHED all-heads
edge-aggregation kernel vs the XLA composition — forward and full
fwd+bwd (the hand-written Pallas backward A/B) — at the flagship's
default sparse geometry (Z=500, H=4, d=16) and around the dispatch
boundary, to tune _PALLAS_MAX_Z / _PALLAS_MIN_TOTAL_D from the batched
kernel's own numbers (round 3 tuned them from the single-head kernel).

Sync protocol per CLAUDE.md: scalar pull (block_until_ready is
unreliable on the remote axon backend).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.ops.pallas.edge_segment import (
    gat_edge_aggregate_multihead,
    gat_edge_aggregate_multihead_pallas,
    _xla_composition_mh,
)

REPS = 30


def timeit(fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    float(sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out)))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*a)
    jax.block_until_ready(out)
    float(sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out)))
    return (time.time() - t0) / REPS * 1e3


results = []
# (Z, deg, H, d): default model geometry first, then the dispatch
# boundary in Z and in total width H*d
for Z, deg, H, d in [
    (500, 8, 4, 16),     # flagship default sparse geometry
    (500, 16, 4, 16),
    (512, 16, 4, 8),     # H*d = 32: the _PALLAS_MIN_TOTAL_D edge
    (512, 16, 2, 8),     # H*d = 16: below the threshold
    (2048, 16, 4, 16),   # _PALLAS_MAX_Z edge
    (4096, 16, 4, 16),   # beyond: XLA should win
]:
    E = Z * deg
    rng = np.random.default_rng(Z + deg + H + d)
    src = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
    dst = jnp.asarray(rng.integers(0, Z, E), jnp.int32)
    Wh = jnp.asarray(rng.normal(size=(Z, H, d)).astype(np.float32))
    qs = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32)) * 0.3
    qd = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32)) * 0.3

    @jax.jit
    def xla_fwd(Wh, qs, qd, src, dst, Z=Z):
        return _xla_composition_mh(Wh, qs, qd, src, dst, Z, 0.2)

    @jax.jit
    def pallas_fwd(Wh, qs, qd, src, dst, Z=Z):
        return gat_edge_aggregate_multihead_pallas(
            Wh, qs, qd, src, dst, num_nodes=Z
        )

    @jax.jit
    def xla_vjp(Wh, qs, qd, src, dst, Z=Z):
        def f(Wh, qs, qd):
            return jnp.sum(_xla_composition_mh(
                Wh, qs, qd, src, dst, Z, 0.2) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(Wh, qs, qd)

    @jax.jit
    def pallas_vjp(Wh, qs, qd, src, dst, Z=Z):
        def f(Wh, qs, qd):
            return jnp.sum(gat_edge_aggregate_multihead(
                Wh, qs, qd, src, dst, num_nodes=Z) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(Wh, qs, qd)

    row = {"Z": Z, "deg": deg, "H": H, "d": d, "E": E, "HD": H * d}
    row["xla_fwd_ms"] = timeit(xla_fwd, Wh, qs, qd, src, dst)
    row["pallas_fwd_ms"] = timeit(pallas_fwd, Wh, qs, qd, src, dst)
    row["xla_vjp_ms"] = timeit(xla_vjp, Wh, qs, qd, src, dst)
    row["pallas_vjp_ms"] = timeit(pallas_vjp, Wh, qs, qd, src, dst)
    row["speedup_fwd"] = row["xla_fwd_ms"] / row["pallas_fwd_ms"]
    row["speedup_vjp"] = row["xla_vjp_ms"] / row["pallas_vjp_ms"]
    a = np.asarray(xla_fwd(Wh, qs, qd, src, dst))
    b = np.asarray(pallas_fwd(Wh, qs, qd, src, dst))
    row["rel_err_fwd"] = float(
        np.abs(a - b).max() / max(np.abs(a).max(), 1e-6))
    ga = xla_vjp(Wh, qs, qd, src, dst)
    gb = pallas_vjp(Wh, qs, qd, src, dst)
    fa = jnp.concatenate([x.ravel() for x in ga])
    fb = jnp.concatenate([x.ravel() for x in gb])
    row["grad_cosine"] = float(
        jnp.vdot(fa, fb) / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb)))
    results.append(row)
    print({k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in row.items()}, flush=True)

with open("docs/evidence_round4/edge_mh_bench.json", "w") as f:
    json.dump(results, f, indent=2)
print("done", flush=True)
