"""Round-5 VERDICT item 5, winning-kernel half: A/B of the block-pair
gather/scatter edge kernel (ops/pallas/edge_gather.py) against the XLA
segment path in the Z=8192-65536 band, on the REAL workload graphs
(sparse_zone_world kNN edge lists — the zone graphs the framework
serves) plus one uniform-random graph as the honest degenerate case
(chunking relies on locality; EdgeChunks.fill records it).

Measured per point: fwd ms (XLA vs kernel, exact-shift mode including
its segment_max precompute), speedup, result cosine, chunk fill.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.data_generator.agent_trajectories import (
    sparse_zone_world,
)
from ananke_abm_tpu.ops.pallas.edge_gather import (
    build_edge_chunks,
    gat_edge_attention_gather,
)
from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

assert jax.default_backend() == "tpu", jax.default_backend()
H, D = 4, 16
out = {"H": H, "d": D, "points": []}


def measure(name, Z, src, dst, reps=20):
    E = int(src.shape[0])
    key = jax.random.PRNGKey(Z)
    k1, k2, k3 = jax.random.split(key, 3)
    Wh = jax.random.normal(k1, (Z, H, D), jnp.float32)
    er = jax.random.normal(k2, (Z, H), jnp.float32)
    es = jax.random.normal(k3, (Z, H), jnp.float32)
    t0 = time.time()
    ch = build_edge_chunks(src, dst, Z)
    build_s = time.time() - t0

    xla = jax.jit(lambda Wh, er, es, s, d_: gat_edge_attention_multihead(
        Wh, er, es, s, d_, num_nodes=Z, use_pallas=False))
    ker = jax.jit(
        lambda Wh, er, es, s, d_, csl, cdl, cst, cdt, cff, cod, crk:
        gat_edge_attention_gather(
            Wh, er, es,
            type(ch)(src_local=csl, dst_local=cdl, src_tile=cst,
                     dst_tile=cdt, first=cff, num_dst=Z, fill=ch.fill,
                     order=cod, rank=crk),
            s, d_, Z))
    ch_args = (ch.src_local, ch.dst_local, ch.src_tile, ch.dst_tile,
               ch.first, ch.order, ch.rank)

    def time_fn(f, args):
        float(jnp.sum(f(*args)))  # compile + warm
        t0 = time.time()
        acc = None
        for _ in range(reps):
            s = jnp.sum(f(*args))
            acc = s if acc is None else acc + s
        float(acc)
        return (time.time() - t0) / reps * 1e3

    a = xla(Wh, er, es, src, dst)
    b = ker(Wh, er, es, src, dst, *ch_args)
    av, bv = np.asarray(a), np.asarray(b)
    cos = float(np.vdot(av, bv) /
                (np.linalg.norm(av) * np.linalg.norm(bv) + 1e-30))
    xla_ms = time_fn(xla, (Wh, er, es, src, dst))
    ker_ms = time_fn(ker, (Wh, er, es, src, dst) + ch_args)
    row = {
        "graph": name, "Z": Z, "E": E,
        "chunks": ch.n_chunks, "fill": round(float(ch.fill), 3),
        "build_s": round(build_s, 2),
        "xla_fwd_ms": round(xla_ms, 3),
        "kernel_fwd_ms": round(ker_ms, 3),
        "speedup": round(xla_ms / ker_ms, 2),
        "cosine_vs_xla": cos,
    }
    out["points"].append(row)
    print(row, flush=True)


for Z in (8192, 16384, 32768, 65536):
    zf, (src, dst) = sparse_zone_world(Z, seed=Z)
    measure("knn_world", Z, jnp.asarray(src), jnp.asarray(dst))

# degenerate case: uniform-random src at Z=32768 (no locality)
Zr = 32768
rng = np.random.default_rng(0)
src_r = jnp.asarray(rng.integers(0, Zr, 8 * Zr), jnp.int32)
dst_r = jnp.asarray(np.repeat(np.arange(Zr, dtype=np.int32), 8))
measure("uniform_random", Zr, src_r, dst_r)

print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round5/edge_gather_bench.json", "w") as f:
    json.dump(out, f, indent=2)
