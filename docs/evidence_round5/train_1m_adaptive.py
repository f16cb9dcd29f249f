"""Round-5 VERDICT item 1a/1b: 1M-agent ADAPTIVE training with the chunk
loop fused into ONE jitted epoch (lax.scan over chunks, data
device-resident) instead of round 4's serial host loop (16 chunks x
host gather + transfer + per-chunk float(loss) sync = 20.3 s/epoch with
zero overlap).

Ladder, all at 1,048,576 agents x Z=64 x T=12 dopri5 rtol=atol=1e-5:
  A. 16 x 65,536-agent chunks, ckpt_every=1 + bf16 bwd + bf16 buffer
     pair (round-4's per-chunk config, now scanned on device);
  B. 8 x 131,072-agent chunks, ckpt_every=2 + bf16 state checkpoints
     (halves the ck1 buffer pair that OOM'd 131k chunks in round 4) —
     the chunk-wall probe VERDICT r4 asked for;
  C. 8 x 131,072-agent chunks, ckpt_every=1 (re-probe the round-4 OOM
     with the round-5 kernels; outcome recorded either way).
Target: best warm epoch <= 16 s (VERDICT r4 #1).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ananke_abm_tpu.data_generator.agent_trajectories import (
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.train import (
    GATODEConfig,
    _unpack_static,
    build_adjoint_loss_fn_g,
    build_model,
    init_params,
    make_epoch_fn,
)

N, Z, T = 1_048_576, 64, 12
EPOCHS = 3
cfg = GATODEConfig(method="dopri5")
d = generate_agent_population(N, num_times=T, seed=11, num_zones=Z)
model = build_model(cfg, 7, 8)
params0 = init_params(model, cfg, d, 4096, jax.random.PRNGKey(11))
static = (jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"]),
          jnp.asarray(d["times"]))
pf = jnp.asarray(d["person_feats"])
hz = jnp.asarray(d["home_zone"])
tg = jnp.asarray(d["zone_ids"])
opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
out = {"n_agents": N, "num_zones": Z, "num_times": T, "epochs": EPOCHS,
       "rtol": cfg.rtol, "atol": cfg.atol, "num_blocks": cfg.num_blocks,
       "round4_host_loop_warm_epoch_s": 20.3}

variants = (
    ("A_chunk64k_ck1", 65_536,
     dict(ckpt_every=1, bwd_precision="bf16", store_f="auto")),
    ("B_chunk128k_ck2_bf16ckpt", 131_072,
     dict(ckpt_every=2, bwd_precision="bf16", ckpt_dtype="bf16")),
    ("C_chunk128k_ck1", 131_072,
     dict(ckpt_every=1, bwd_precision="bf16", store_f="auto")),
)
results = {}
rng = np.random.default_rng(0)
for name, chunk, knobs in variants:
    try:
        loss_fn_g = build_adjoint_loss_fn_g(
            model, cfg, static, adjoint_mode="discrete",
            max_accepted=256, **knobs)
        epoch_fn = make_epoch_fn(opt, loss_fn_g,
                                 graph=_unpack_static(static))
        params = jax.tree_util.tree_map(jnp.array, params0)
        opt_state = opt.init(params)
        n_chunks = N // chunk
        epoch_times, epoch_losses = [], []
        for ep in range(EPOCHS):
            perm = rng.permutation(N).reshape(n_chunks, chunk)
            batches = jnp.asarray(perm)
            t0 = time.time()
            params, opt_state, losses, accs = epoch_fn(
                params, opt_state, pf, hz, tg, batches)
            mean_loss = float(jnp.mean(losses))  # one sync per epoch
            dt = time.time() - t0
            epoch_times.append(dt)
            epoch_losses.append(mean_loss)
            print(f"{name} epoch {ep}: {dt:.1f}s  loss {mean_loss:.4f}",
                  flush=True)
        warm = min(epoch_times[1:])
        results[name] = {
            "ok": True, "chunk": chunk, "n_chunks": n_chunks,
            "knobs": {k: str(v) for k, v in knobs.items()},
            "first_epoch_s_incl_compile": round(epoch_times[0], 1),
            "warm_epoch_s": round(warm, 1),
            "agents_per_s": round(N / warm, 1),
            "epoch_mean_losses": [round(l, 4) for l in epoch_losses],
        }
        assert epoch_losses[-1] < epoch_losses[0], epoch_losses
    except Exception as e:  # noqa: BLE001 — record walls honestly
        results[name] = {"ok": False, "chunk": chunk,
                         "error": str(e)[:300]}
    print(name, results[name], flush=True)
out["variants"] = results

best = min((r for r in results.values() if r.get("ok")),
           key=lambda r: r["warm_epoch_s"])
out["best_warm_epoch_s"] = best["warm_epoch_s"]
out["best_agents_per_s"] = best["agents_per_s"]
out["speedup_vs_round4"] = round(20.3 / best["warm_epoch_s"], 2)
out["target_16s_met"] = bool(best["warm_epoch_s"] <= 16.0)
print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round5/train_1m_adaptive.json", "w") as f:
    json.dump(out, f, indent=2)
