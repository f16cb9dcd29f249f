"""Round-4 VERDICT item 2: make adjoint/dopri5 training fast.

Re-runs the round-3 BASELINE config-3 workload (98,304 agents, Z=64,
T=12, dopri5 rtol=atol=1e-5, continuous adjoint) with the two new
levers and reports s/step, agents/s, and MFU next to the RK4 numbers:

  A. use_fused=False — plain XLA RHS, but with the round-4 step-size
     warm restart across backward intervals (isolates that gain vs the
     round-3 3.45-3.6 s/step cold baseline).
  B. use_fused=True — the fused Pallas RHS + joint eval+VJP kernels
     (ops/pallas/fused_rhs.py) AND the warm restart.

Sync protocol per CLAUDE.md: chain steps through the carried params and
pull a scalar at the end.
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
    build_model,
    init_params,
    make_adjoint_step_fns,
)
from ananke_abm_tpu.ode import odeint

N, Z, T = 98304, 64, 12
REPS = 8
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
       "rtol": cfg.rtol, "atol": cfg.atol,
       "num_blocks": cfg.num_blocks, "reps": REPS,
       "round3_cold_xla_ms_per_step": 3598.8}

# ---- forward solve stats + time (fused vs XLA RHS) ----
zone_feats, adj, times = static


def fwd_ys(params, use_fused):
    ze = model.apply({"params": params}, zone_feats, adj,
                     method=model.encode_zones)
    x0, h = model.apply({"params": params}, pf, hz, ze,
                        method=model.initial_state)
    if use_fused:
        from ananke_abm_tpu.ops.pallas.fused_rhs import (
            make_fused_adjoint_rhs,
        )
        rhs, _ = make_fused_adjoint_rhs()
        args = (params, h, ze)
    else:
        def rhs(t, x, args):
            p, hh, zee = args
            return model.apply({"params": p}, t, x, hh, zee,
                               method=model.rhs)
        args = (params, h, ze)
    ys, stats = odeint(rhs, x0, times, args, method="dopri5",
                       rtol=cfg.rtol, atol=cfg.atol, adjoint=False,
                       return_stats=True)
    return ys, stats


for name in ("xla", "fused"):
    use_fused = name == "fused"
    f = jax.jit(lambda p, u=use_fused: fwd_ys(p, u))
    ys, stats = f(params0)
    s = float(jnp.sum(ys))  # sync
    t0 = time.time()
    for _ in range(REPS):
        ys, stats = f(params0)
    float(jnp.sum(ys))
    out[f"fwd_solve_{name}_ms"] = (time.time() - t0) / REPS * 1e3
    out[f"fwd_solve_{name}_stats"] = {
        k: float(v) for k, v in stats.items()}
    print(name, "fwd:", out[f"fwd_solve_{name}_ms"], "ms",
          out[f"fwd_solve_{name}_stats"], flush=True)

# ---- full train step A/B ----
results = {}
for name, use_fused in (("A_xla_warm", False), ("B_fused_warm", True)):
    step, loss_fn = make_adjoint_step_fns(
        model, opt, cfg, static, use_fused=use_fused)
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

# ---- gradient agreement at full scale: fused vs XLA adjoint ----
_, loss_xla = make_adjoint_step_fns(model, opt, cfg, static,
                                    use_fused=False)
_, loss_fused = make_adjoint_step_fns(model, opt, cfg, static,
                                      use_fused=True)
g_a = jax.jit(jax.grad(lambda p: loss_xla(p, pf, hz, tg)[0]))(params0)
g_b = jax.jit(jax.grad(lambda p: loss_fused(p, pf, hz, tg)[0]))(params0)
fa = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_a)])
fb = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_b)])
out["grad_cosine_fused_vs_xla_at_98k"] = float(
    jnp.vdot(fa, fb) / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb)))
print("grad cosine:", out["grad_cosine_fused_vs_xla_at_98k"], flush=True)

# ---- MFU of the best variant ----
# per-eval matmul FLOPs per agent (dims: Da=32, Dz=64, Hc=32, H=128,
# nb=2): Dense_0 2*(96+32+2)*128 + blocks 2*2*2*128*128 + out 2*128*32
# + query 2*32*64 + scores/ctx 2*2*64*64
flops_eval = (2 * 130 * 128 + 2 * 4 * 128 * 128 + 2 * 128 * 32
              + 2 * 32 * 64 + 2 * 2 * 64 * 64)
fwd_evals = out["fwd_solve_fused_stats"]["n_steps"] * 6 + 2
out["flops_per_agent_per_eval"] = flops_eval
out["fwd_evals"] = fwd_evals
best = min(results.values(), key=lambda r: r["ms_per_step"])
# backward: ~3x fwd FLOPs per aug eval; eval counts unknown without
# instrumentation — report fwd-solve MFU exactly and step-level
# throughput; the bwd MFU needs the aug step counts (see notes)
out["fwd_solve_fused_tflops_per_s"] = (
    flops_eval * fwd_evals * N / (out["fwd_solve_fused_ms"] / 1e3) / 1e12
)
print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round4/config3_fused.json", "w") as f:
    json.dump(out, f, indent=2)
