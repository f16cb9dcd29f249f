"""Serving-kernel agent-tile sweep (VERDICT r3 #8: one more serving
lever, measured either way).

The 1M-agent day rollout (bench.py workload: 48 output times x 2 RK4
substeps, Z=64, num_blocks=2) runs the interval-fused decode kernel
with TILE_N=1024 — 1,024 grid tiles, each reloading the weights + zone
table into VMEM. Larger tiles amortize those reloads and per-tile fixed
costs; smaller ones pipeline more. Sweep TILE_N in {512, 1024, 2048,
4096} with bench.py's sync protocol (chained scalar pulls, two-K
difference to cancel the fixed per-call round-trip).
"""
import json
import time

import jax
import jax.numpy as jnp

from ananke_abm_tpu.data_generator.agent_trajectories import (
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.train import (
    GATODEConfig,
    build_model,
    init_params,
)
from ananke_abm_tpu.models.gnn_embed.rollout import make_decoded_rollout
from ananke_abm_tpu.ops.pallas import fused_step

N_AGENTS = 1_048_576
NUM_TIMES, SUBSTEPS, NUM_ZONES, NUM_BLOCKS = 48, 2, 64, 2

config = GATODEConfig(substeps=SUBSTEPS, num_blocks=NUM_BLOCKS)
data = generate_agent_population(
    N_AGENTS, num_times=NUM_TIMES, seed=0, num_zones=NUM_ZONES)
model = build_model(config, 7, 8)
params = init_params(model, config, data, 1024, jax.random.PRNGKey(0))
zone_feats = jnp.asarray(data["zone_features"])
adj = jnp.asarray(data["adj"])
times = jnp.asarray(data["times"])
pf = jnp.asarray(data["person_feats"])
hz = jnp.asarray(data["home_zone"])

out = {"n_agents": N_AGENTS, "num_times": NUM_TIMES,
       "substeps": SUBSTEPS, "num_zones": NUM_ZONES,
       "num_blocks": NUM_BLOCKS, "results": {}}
ref_ids = None

for tile in (512, 1024, 2048, 4096):
    fused_step.TILE_N = tile
    try:
        rollout = make_decoded_rollout(
            model, config, zone_feats, adj, times,
            use_pallas=True, expected_n=N_AGENTS)
        ids = rollout(params, pf, hz)
        float(jnp.sum(ids))  # compile + warm, synced
        if ref_ids is None:
            ref_ids = ids
            agree = 1.0
        else:
            agree = float(jnp.mean((ids == ref_ids).astype(jnp.float32)))

        def total_s(n_iter):
            t0 = time.time()
            acc = None
            for _ in range(n_iter):
                s = jnp.sum(rollout(params, pf, hz))
                acc = s if acc is None else acc + s
            float(acc)
            return time.time() - t0

        t3, t9 = total_s(3), total_s(9)
        per_iter = (t9 - t3) / 6.0
        aps = N_AGENTS / per_iter
        out["results"][str(tile)] = {
            "s_per_rollout": round(per_iter, 4),
            "agents_per_s": round(aps, 1),
            "decode_id_agreement_vs_first_success": agree,
        }
        print(tile, out["results"][str(tile)], flush=True)
    except Exception as e:  # noqa: BLE001 — record compile failures
        out["results"][str(tile)] = {"error": str(e)[:300]}
        print(tile, "FAILED:", str(e)[:200], flush=True)

print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round4/serve_tile_sweep.json", "w") as f:
    json.dump(out, f, indent=2)
