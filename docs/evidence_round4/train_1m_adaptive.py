"""1M-agent training with the ADAPTIVE trainer (BASELINE config 3 at
config-5 scale): dopri5 + discrete adjoint over 1,048,576 agents on one
chip.

Two modes, both recorded:
  - microbatched SGD epochs: 16 chunks of 65,536 agents through the
    fused discrete-adjoint step (ckpt_every=1 + bf16 backward +
    store_f — the config-3-tuned fast path), adamw per chunk.
    131,072-agent chunks OOM (19.91G vs 15.75G HBM — the ck1
    checkpoint pair scales with the chunk; recorded);
  - one FULL-BATCH step attempt at 1M agents (ckpt_every=8,
    bf16 checkpoints) to probe the single-chip memory wall — outcome
    recorded either way.
"""
import json
import time

import jax
import jax.numpy as jnp
import optax

from ananke_abm_tpu.data_generator.agent_trajectories import (
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.train import (
    GATODEConfig,
    build_model,
    init_params,
    make_adjoint_step_fns,
)

N, Z, T = 1_048_576, 64, 12
CHUNK = 65_536
EPOCHS = 3
cfg = GATODEConfig(method="dopri5")
d = generate_agent_population(N, num_times=T, seed=11, num_zones=Z)
model = build_model(cfg, 7, 8)
params = init_params(model, cfg, d, 4096, jax.random.PRNGKey(11))
static = (jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"]),
          jnp.asarray(d["times"]))
import numpy as np

pf_h = np.asarray(d["person_feats"])
hz_h = np.asarray(d["home_zone"])
tg_h = np.asarray(d["zone_ids"])
opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
out = {"n_agents": N, "num_zones": Z, "num_times": T, "chunk": CHUNK,
       "epochs": EPOCHS, "rtol": cfg.rtol, "atol": cfg.atol,
       "num_blocks": cfg.num_blocks}

# ---- microbatched SGD epochs through the tuned adjoint step ----
step, loss_fn = make_adjoint_step_fns(
    model, opt, cfg, static, adjoint_mode="discrete",
    max_accepted=256, ckpt_every=1, bwd_precision="bf16", store_f="auto")
opt_state = opt.init(params)
n_chunks = N // CHUNK
rng = np.random.default_rng(0)
epoch_times, epoch_losses = [], []
for ep in range(EPOCHS):
    perm = rng.permutation(N)
    t0 = time.time()
    losses = []
    for c in range(n_chunks):
        idx = perm[c * CHUNK:(c + 1) * CHUNK]
        pf = jnp.asarray(pf_h[idx])
        hz = jnp.asarray(hz_h[idx])
        tg = jnp.asarray(tg_h[idx])
        params, opt_state, loss, acc = step(params, opt_state, pf, hz, tg)
        losses.append(float(loss))  # sync
    dt = time.time() - t0
    epoch_times.append(dt)
    epoch_losses.append(float(np.mean(losses)))
    print(f"epoch {ep}: {dt:.1f}s  mean loss {epoch_losses[-1]:.4f}",
          flush=True)
out["microbatched"] = {
    "n_chunks": n_chunks,
    "first_epoch_s_incl_compile": round(epoch_times[0], 1),
    "warm_epoch_s": round(min(epoch_times[1:]), 1),
    "agents_per_s": round(N / min(epoch_times[1:]), 1),
    "epoch_mean_losses": [round(l, 4) for l in epoch_losses],
}
assert epoch_losses[-1] < epoch_losses[0], epoch_losses
print("microbatched:", out["microbatched"], flush=True)

# ---- full-batch attempt (memory probe) ----
try:
    step_fb, _ = make_adjoint_step_fns(
        model, opt, cfg, static, adjoint_mode="discrete",
        max_accepted=256, ckpt_every=8, bwd_precision="bf16")
    # narrow the checkpoint buffer: thread ckpt_dtype via store_f="auto"
    # is off at ckpt_every=8; the f32 buffer is 32 x 134 MB = 4.3 GB
    params_fb = jax.tree_util.tree_map(jnp.array, params)
    opt_state_fb = opt.init(params_fb)
    pf = jnp.asarray(pf_h)
    hz = jnp.asarray(hz_h)
    tg = jnp.asarray(tg_h)
    t0 = time.time()
    params_fb, opt_state_fb, loss, acc = step_fb(
        params_fb, opt_state_fb, pf, hz, tg)
    l1 = float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        params_fb, opt_state_fb, loss, acc = step_fb(
            params_fb, opt_state_fb, pf, hz, tg)
    lf = float(loss)
    ms = (time.time() - t0) / reps * 1e3
    out["full_batch_step"] = {
        "ok": True, "ckpt_every": 8,
        "compile_plus_first_step_s": round(compile_s, 1),
        "ms_per_step": round(ms, 1),
        "agents_per_s": round(N / (ms / 1e3), 1),
        "first_loss": l1, "loss_after_reps": lf,
    }
except Exception as e:  # noqa: BLE001 — record the memory wall honestly
    out["full_batch_step"] = {"ok": False, "error": str(e)[:300]}
print("full_batch:", out["full_batch_step"], flush=True)

print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round4/train_1m_adaptive.json", "w") as f:
    json.dump(out, f, indent=2)
