"""Round-4 VERDICT item 2, part 2: the discrete adjoint at config-3 scale.

Re-runs the BASELINE config-3 workload (98,304 agents, Z=64, T=12,
dopri5 rtol=atol=1e-5) with ``adjoint_mode="discrete"`` —
backprop-through-the-accepted-steps (ode/discrete_adjoint.py) instead of
the continuous adjoint's augmented re-solve — in both RHS variants:

  C. discrete + XLA step (use_fused=False)
  D. discrete + fused Pallas DOPRI5 step kernels (use_fused=True,
     ops/pallas/fused_dopri5.py — one launch per attempted forward step,
     one recompute+VJP launch per accepted backward step)

Reported next to round 4's continuous numbers (config3_fused.json:
A_xla_warm 3767.9 ms/step, B_fused_warm 4065.3 ms/step) and round 3's
cold 3598.8 ms/step. Sync protocol per CLAUDE.md: chain steps through
the carried params and pull a scalar at the end.
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
# config-3 forward takes 218 accepted steps at these tolerances
MAX_ACC, CKPT_EVERY = 256, 16
cfg = GATODEConfig(method="dopri5")  # defaults otherwise (num_blocks=2)
d = generate_agent_population(N, num_times=T, seed=7, num_zones=Z)
model = build_model(cfg, 7, 8)
params0 = init_params(model, cfg, d, 4096, jax.random.PRNGKey(7))
static = (jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"]),
          jnp.asarray(d["times"]))
pf, hz, tg = map(jnp.asarray,
                 (d["person_feats"], d["home_zone"], d["zone_ids"]))
opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
out = {"n_agents": N, "num_zones": Z, "num_times": T,
       "rtol": cfg.rtol, "atol": cfg.atol, "num_blocks": cfg.num_blocks,
       "reps": REPS, "max_accepted": MAX_ACC, "ckpt_every": CKPT_EVERY,
       "round3_cold_xla_ms_per_step": 3598.8,
       "round4_continuous_ms_per_step": {"A_xla_warm": 3767.9,
                                         "B_fused_warm": 4065.3}}

results = {}
for name, use_fused in (("C_discrete_xla", False),
                        ("D_discrete_fused", True)):
    step, loss_fn = make_adjoint_step_fns(
        model, opt, cfg, static, use_fused=use_fused,
        adjoint_mode="discrete", max_accepted=MAX_ACC,
        ckpt_every=CKPT_EVERY)
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

# ---- gradient agreement at full scale vs the continuous XLA adjoint ----
_, loss_cont = make_adjoint_step_fns(model, opt, cfg, static,
                                     use_fused=False)
_, loss_disc = make_adjoint_step_fns(
    model, opt, cfg, static, use_fused=False, adjoint_mode="discrete",
    max_accepted=MAX_ACC, ckpt_every=CKPT_EVERY)
g_a = jax.jit(jax.grad(lambda p: loss_cont(p, pf, hz, tg)[0]))(params0)
g_b = jax.jit(jax.grad(lambda p: loss_disc(p, pf, hz, tg)[0]))(params0)
fa = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_a)])
fb = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_b)])
out["grad_cosine_discrete_vs_continuous_at_98k"] = float(
    jnp.vdot(fa, fb) / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb)))
print("grad cosine:", out["grad_cosine_discrete_vs_continuous_at_98k"],
      flush=True)

# ---- effective FLOP rate of the best discrete variant ----
# per-eval matmul FLOPs per agent (dims: Da=32, Dz=64, Hc=32, H=128,
# nb=2) — same accounting as config3_fused.py
flops_eval = (2 * 130 * 128 + 2 * 4 * 128 * 128 + 2 * 128 * 32
              + 2 * 32 * 64 + 2 * 2 * 64 * 64)
# fwd: 218 accepted steps x 6 evals + init; bwd: MAX_ACC padded window x
# (6-eval recompute + ~2x-fwd VJP ~= 18 eval-equivalents)
fwd_evals = 218 * 6 + 2
bwd_eval_equiv = MAX_ACC * (6 + 12)
best_name = min(results, key=lambda k: results[k]["ms_per_step"])
best = results[best_name]
out["flops_per_agent_per_eval"] = flops_eval
out["train_step_eval_equivalents"] = fwd_evals + bwd_eval_equiv
out["best_variant"] = best_name
out["best_tflops_per_s"] = (
    flops_eval * (fwd_evals + bwd_eval_equiv) * N
    / (best["ms_per_step"] / 1e3) / 1e12
)
out["speedup_vs_round3_cold"] = round(
    3598.8 / best["ms_per_step"], 2)
out["speedup_vs_round4_continuous_best"] = round(
    3767.9 / best["ms_per_step"], 2)
print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round4/config3_discrete.json", "w") as f:
    json.dump(out, f, indent=2)
