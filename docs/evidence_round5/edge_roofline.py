"""Round-5 VERDICT item 5: roofline measurement of the large-Z sparse
edge path (Z = 8192..65536), where the one-hot Pallas kernels are closed
as a dead end (O(E*Z*D)) and serving/training ride the XLA
gather/segment path.

Model (f32, per fwd): the H*d-wide traffic dominates —
  gather Wh[src] (E*H*d*4 B read) + alpha-mult (E*H*d*4 B write)
  + segment_sum read (E*H*d*4 B) + out write (Z*H*d*4 B)
plus ~8 H-wide passes (E*H*4 B each) for score gather/softmax. The
roofline time is that traffic at the v5e HBM bandwidth (819 GB/s).
Compute is negligible (no matmuls), so this path is memory-bound by
construction and the roofline ratio is the honest "how much is left"
number. Also measured: fwd+bwd (the custom-vjp XLA composition), and a
probe of whether Mosaic can lower an in-VMEM dynamic row gather at all
(jnp.take inside a Pallas kernel) — the prerequisite for any true
gather/scatter kernel.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.ops.segment import gat_edge_attention_multihead

assert jax.default_backend() == "tpu", jax.default_backend()
HBM_GBPS = 819.0  # v5e
H, D = 4, 16
DEG = 8
out = {"H": H, "d": D, "deg": DEG, "hbm_gbps": HBM_GBPS, "points": []}


def sync(x):
    return float(jnp.sum(x))


for Z in (8192, 16384, 32768, 65536):
    E = DEG * Z
    key = jax.random.PRNGKey(Z)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    Wh = jax.random.normal(k1, (Z, H, D), jnp.float32)
    er = jax.random.normal(k2, (Z, H), jnp.float32)
    es = jax.random.normal(k3, (Z, H), jnp.float32)
    src = jax.random.randint(k4, (E,), 0, Z, jnp.int32)
    dst = jnp.repeat(jnp.arange(Z, dtype=jnp.int32), DEG)

    fwd = jax.jit(lambda Wh, er, es, s, d_: gat_edge_attention_multihead(
        Wh, er, es, s, d_, num_nodes=Z, use_pallas=False))
    cot = jax.random.normal(k5, (Z, H, D), jnp.float32)

    def loss(Wh, er, es, s, d_):
        return jnp.vdot(gat_edge_attention_multihead(
            Wh, er, es, s, d_, num_nodes=Z, use_pallas=False), cot)

    fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    sync(fwd(Wh, er, es, src, dst))  # compile + warm
    reps = 30
    t0 = time.time()
    acc = None
    for _ in range(reps):
        s = jnp.sum(fwd(Wh, er, es, src, dst))
        acc = s if acc is None else acc + s
    float(acc)
    fwd_ms = (time.time() - t0) / reps * 1e3

    g = fwdbwd(Wh, er, es, src, dst)
    sync(g[0])
    t0 = time.time()
    acc = None
    for _ in range(reps):
        g = fwdbwd(Wh, er, es, src, dst)
        s = jnp.sum(g[0])
        acc = s if acc is None else acc + s
    float(acc)
    bwd_ms = (time.time() - t0) / reps * 1e3

    wide = 4 * E * H * D * (3) + 4 * Z * H * D  # bytes, fwd
    narrow = 8 * 4 * E * H
    roof_ms = (wide + narrow) / (HBM_GBPS * 1e9) * 1e3
    row = {
        "Z": Z, "E": E,
        "fwd_ms": round(fwd_ms, 3),
        "fwd_roofline_ms": round(roof_ms, 3),
        "fwd_roofline_ratio": round(fwd_ms / roof_ms, 2),
        "fwdbwd_ms": round(bwd_ms, 3),
        # bwd re-does the gathers + scatters ~2x the fwd's wide traffic
        "fwdbwd_roofline_ms": round(3 * roof_ms, 3),
        "fwdbwd_roofline_ratio": round(bwd_ms / (3 * roof_ms), 2),
    }
    out["points"].append(row)
    print(row, flush=True)

# --- Mosaic dynamic-gather probe: can a kernel gather rows from a
# VMEM-resident table by a traced index vector at all? ---
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Zp, Dp, Ep = 512, 64, 1024

    def gather_kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    tab = jax.random.normal(jax.random.PRNGKey(0), (Zp, Dp), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (Ep,), 0, Zp,
                             jnp.int32)
    got = pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((Ep, Dp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    ok = bool(jnp.allclose(got, tab[idx]))
    out["mosaic_dynamic_row_gather"] = {
        "lowers": True, "correct": ok}
except Exception as e:  # noqa: BLE001 — record the lowering verdict
    out["mosaic_dynamic_row_gather"] = {
        "lowers": False, "error": str(e)[:300]}
print("gather probe:", out["mosaic_dynamic_row_gather"], flush=True)

print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round5/edge_roofline.json", "w") as f:
    json.dump(out, f, indent=2)
