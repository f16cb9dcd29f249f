"""Round-5 VERDICT item 6: serving-ladder continuity measurement.

One swept table of SHIPPING serving throughput (make_decoded_rollout,
use_pallas="auto" — whatever the dispatch picks is what users get) at
Z in {64, 500, 2048, 8192, 32768}: agents/s + model MFU per point, so
the serving story has no unmeasured gap between the dense fused-kernel
regime (Z <= ~500) and the documented XLA-wins-above-Z=8192 regime.

Day-rollout workload matches bench.py (T=48 output times, substeps=2 ->
96 RK4 steps, num_blocks=2). N shrinks as Z grows to bound wall clock
and the dense (Z, Z) world build; Z=32768 uses the sparse edge-list
world (the dense adjacency alone would be 4 GB). Throughput is
per-agent, so points are comparable; N is recorded per point.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.data_generator.agent_trajectories import (
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.rollout import make_decoded_rollout
from ananke_abm_tpu.models.gnn_embed.train import (
    GATODEConfig,
    build_model,
    init_params,
)

assert jax.default_backend() == "tpu", jax.default_backend()
from bench import V5E_BF16_PEAK_TFLOPS, rollout_flops_per_agent

T, SUBSTEPS, NUM_BLOCKS = 48, 2, 2
POINTS = (
    # (Z, N, sparse_world)
    (64, 1_048_576, False),
    (500, 1_048_576, False),
    (2048, 524_288, False),
    (8192, 131_072, False),
    (32768, 65_536, True),
)
OUT_PATH = "docs/evidence_round5/serve_ladder.json"
# resumable: pass Z values as argv to (re)measure only those; existing
# points for other Z are kept
only = set(int(a) for a in sys.argv[1:])
out = {"num_times": T, "substeps": SUBSTEPS, "num_blocks": NUM_BLOCKS,
       "points": []}
if only and os.path.exists(OUT_PATH):
    with open(OUT_PATH) as f:
        prev = json.load(f)
    out["points"] = [p for p in prev.get("points", [])
                     if p["Z"] not in only]
cfg = GATODEConfig(substeps=SUBSTEPS, num_blocks=NUM_BLOCKS)
for Z, N, sparse in POINTS:
    if only and Z not in only:
        continue
    t_gen = time.time()
    d = generate_agent_population(N, num_times=T, seed=0, num_zones=Z,
                                  sparse_world=sparse)
    model = build_model(cfg, d["zone_features"].shape[-1],
                        d["person_feats"].shape[-1])
    edge_index = None
    adj = None
    if sparse:
        ei = d["edge_index"]
        edge_index = (jnp.asarray(ei[0]), jnp.asarray(ei[1]))
    else:
        adj = jnp.asarray(d["adj"])
    params = init_params(model, cfg, d, min(N, 1024),
                         jax.random.PRNGKey(0), edge_index=edge_index)
    rollout = make_decoded_rollout(
        model, cfg, jnp.asarray(d["zone_features"]), adj,
        jnp.asarray(d["times"]), use_pallas="auto", expected_n=N,
        edge_index=edge_index,
    )
    pf = jnp.asarray(d["person_feats"])
    hz = jnp.asarray(d["home_zone"])
    float(jnp.sum(rollout(params, pf, hz)))  # compile + warm, synced

    def total_s(n_iter):
        t0 = time.time()
        acc = None
        for _ in range(n_iter):
            s = jnp.sum(rollout(params, pf, hz))
            acc = s if acc is None else acc + s
        float(acc)
        return time.time() - t0

    n1, n2 = 1, 3
    t1 = min(total_s(n1), total_s(n1))
    t2 = min(total_s(n2), total_s(n2))
    dt = (t2 - t1) / (n2 - n1)
    agents_s = N / dt
    flops = rollout_flops_per_agent(
        da=32, dz=64, hidden=128, ctx=32, num_zones=Z, num_times=T,
        substeps=SUBSTEPS, num_blocks=NUM_BLOCKS,
    )
    tflops = agents_s * flops / 1e12
    row = {
        "Z": Z, "N": N, "sparse_world": sparse,
        "agents_per_s": round(agents_s, 1),
        "rollout_s": round(dt, 3),
        "tflops_per_s": round(tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
        "flops_per_agent": int(flops),
        "setup_s": round(time.time() - t_gen, 1),
    }
    out["points"].append(row)
    print(row, flush=True)
    # incremental dump: a failed later point never loses earlier ones
    out["points"].sort(key=lambda p: p["Z"])
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)

print(json.dumps(out, indent=2), flush=True)
