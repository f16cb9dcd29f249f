"""Round-4 VERDICT item 2, third pass: config-3 train step with the
FSAL-eval checkpoint buffer (store_f) — the backward starts each
accepted-step VJP from the forward's recorded eval instead of
re-evaluating the RHS once per step.

Same workload and sync protocol as config3_fast.py (98,304 agents,
Z=64, T=12, dopri5 rtol=atol=1e-5, discrete adjoint, full train step
with adamw, steps chained through the carried params).
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

N, Z, T = 98304, 64, 12
REPS = 8
cfg = GATODEConfig(method="dopri5")
d = generate_agent_population(N, num_times=T, seed=7, num_zones=Z)
model = build_model(cfg, 7, 8)
params0 = init_params(model, cfg, d, 4096, jax.random.PRNGKey(7))
static = (jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"]),
          jnp.asarray(d["times"]))
pf, hz, tg = map(jnp.asarray,
                 (d["person_feats"], d["home_zone"], d["zone_ids"]))
opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
out = {"n_agents": N, "num_zones": Z, "num_times": T,
       "rtol": cfg.rtol, "atol": cfg.atol,
       "num_blocks": cfg.num_blocks, "reps": REPS,
       "round3_cold_xla_ms_per_step": 3598.8,
       "round4b_ck1_bf16bwd_ms_per_step": 1611.7}

results = {}
variants = (
    ("C_ck1_bf16bwd", dict(ckpt_every=1, bwd_precision="bf16",
                           store_f=False)),
    ("E_ck1_bf16bwd_storef", dict(ckpt_every=1, bwd_precision="bf16",
                                  store_f="auto")),
)
for name, kw in variants:
    step, loss_fn = make_adjoint_step_fns(
        model, opt, cfg, static, adjoint_mode="discrete",
        max_accepted=256, **kw)
    params = jax.tree_util.tree_map(jnp.array, params0)
    opt_state = opt.init(params)
    t0 = time.time()
    params, opt_state, loss, acc = step(params, opt_state, pf, hz, tg)
    l0 = float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        params, opt_state, loss, acc = step(params, opt_state, pf, hz, tg)
    lf = float(loss)  # sync through the chained carry
    ms = (time.time() - t0) / REPS * 1e3
    results[name] = {
        "compile_plus_first_step_s": round(compile_s, 1),
        "ms_per_step": round(ms, 1),
        "agents_per_s": round(N / (ms / 1e3), 1),
        "first_loss": l0, "loss_after_reps": lf,
    }
    print(name, results[name], flush=True)
out["train_steps"] = results

# ---- gradient agreement: store_f variant vs the f32/ck16 reference ----
_, loss_ref = make_adjoint_step_fns(model, opt, cfg, static,
                                    adjoint_mode="discrete",
                                    max_accepted=256, ckpt_every=16)
_, loss_fast = make_adjoint_step_fns(model, opt, cfg, static,
                                     adjoint_mode="discrete",
                                     max_accepted=256, ckpt_every=1,
                                     bwd_precision="bf16", store_f="auto")
g_a = jax.jit(jax.grad(lambda p: loss_ref(p, pf, hz, tg)[0]))(params0)
g_b = jax.jit(jax.grad(lambda p: loss_fast(p, pf, hz, tg)[0]))(params0)
fa = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_a)])
fb = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_b)])
out["grad_cosine_storef_vs_ref_at_98k"] = float(
    jnp.vdot(fa, fb) / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb)))
print("grad cosine:", out["grad_cosine_storef_vs_ref_at_98k"], flush=True)

# ---- throughput accounting (same model as config3_fast.py) ----
flops_eval = (2 * 130 * 128 + 2 * 4 * 128 * 128 + 2 * 128 * 32
              + 2 * 32 * 64 + 2 * 2 * 64 * 64)
n_acc = 219
best_name = min(results, key=lambda k: results[k]["ms_per_step"])
best = results[best_name]
# store_f removes the per-step re-eval: fwd 6 + bwd vjp ~3x6 evals
evals = n_acc * 6 * (1 + 3)
out["flops_per_agent_per_eval"] = flops_eval
out["train_step_eval_equivalents"] = evals
out["best_variant"] = best_name
out["best_tflops_per_s"] = (
    flops_eval * evals * N / (best["ms_per_step"] / 1e3) / 1e12)
out["speedup_vs_round3_cold"] = round(3598.8 / best["ms_per_step"], 2)
out["speedup_vs_round4b"] = round(1611.7 / best["ms_per_step"], 2)
print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round4/config3_storef.json", "w") as f:
    json.dump(out, f, indent=2)
