"""BASELINE config 3 for real (VERDICT r3 item 4): converged adaptive
dopri5 + continuous-adjoint GAT-ODE training at ~100k agents, with wall
clock, solver step stats, and a same-scale gradient-agreement check."""
import json, time

import jax, jax.numpy as jnp, numpy as np, optax

from ananke_abm_tpu.data_generator.agent_trajectories import (
    generate_agent_population,
)
from ananke_abm_tpu.models.gnn_embed.train import (
    GATODEConfig, build_model, init_params,
    make_adjoint_step_fns, make_step_fns,
)
from ananke_abm_tpu.ode import odeint

N, Z, T = 98304, 64, 12
cfg = GATODEConfig(method="dopri5")   # defaults otherwise (num_blocks=2)
d = generate_agent_population(N, num_times=T, seed=7, num_zones=Z)
model = build_model(cfg, 7, 8)
params = init_params(model, cfg, d, 4096, jax.random.PRNGKey(7))
static = (jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"]),
          jnp.asarray(d["times"]))
pf, hz, tg = map(jnp.asarray, (d["person_feats"], d["home_zone"], d["zone_ids"]))
out = {"n_agents": N, "num_zones": Z, "num_times": T,
       "rtol": cfg.rtol, "atol": cfg.atol, "num_blocks": cfg.num_blocks}

# ---- solver step stats at scale (forward dopri5, return_stats) ----
zone_feats, adj, times = static
def fwd_stats(params):
    ze = model.apply({"params": params}, zone_feats, adj,
                     method=model.encode_zones)
    x0, h = model.apply({"params": params}, pf, hz, ze,
                        method=model.initial_state)
    def rhs(t, x, args):
        return model.apply({"params": params}, t, x, h, ze,
                           method=model.rhs)
    ys, stats = odeint(rhs, x0, times, method="dopri5", rtol=cfg.rtol,
                       atol=cfg.atol, adjoint=False, return_stats=True)
    return stats
stats = jax.jit(fwd_stats)(params)
out["forward_solver_stats"] = {
    k: (float(v) if jnp.ndim(v) == 0 else np.asarray(v).tolist())
    for k, v in stats.items()}
print("forward stats:", out["forward_solver_stats"], flush=True)

# ---- gradient agreement at full scale: adjoint vs checkpointed RK4 ----
opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
_, adj_loss = make_adjoint_step_fns(model, opt, cfg, static)
cfg_rk4 = GATODEConfig(method="rk4", substeps=4)
_, rk4_loss = make_step_fns(model, opt, cfg_rk4, static)
g_adj = jax.jit(jax.grad(lambda p: adj_loss(p, pf, hz, tg)[0]))(params)
g_rk4 = jax.jit(jax.grad(lambda p: rk4_loss(p, pf, hz, tg)[0]))(params)
fa = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_adj)])
fr = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_rk4)])
cos = float(jnp.vdot(fa, fr) / (jnp.linalg.norm(fa) * jnp.linalg.norm(fr)))
out["grad_cosine_adjoint_vs_rk4_backprop_at_100k"] = cos
print("grad cosine:", cos, flush=True)

# ---- converged adjoint training run ----
step, loss_fn = make_adjoint_step_fns(model, opt, cfg, static)
opt_state = opt.init(params)
t_first = time.time()
params2, opt_state, loss, acc = step(params, opt_state, pf, hz, tg)
jax.block_until_ready(loss); loss = float(loss)
out["compile_plus_first_step_s"] = round(time.time() - t_first, 1)
hist = [(0, loss, float(acc))]
t0 = time.time()
import os
max_steps = int(os.environ.get("C3_STEPS", "300"))
target_acc = 0.98
for i in range(1, max_steps + 1):
    params2, opt_state, loss, acc = step(params2, opt_state, pf, hz, tg)
    if i % 10 == 0 or i == max_steps:
        la, aa = float(loss), float(acc)
        hist.append((i, la, aa))
        print(f"step {i}: loss {la:.4f} acc {aa:.4f} "
              f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
        if aa >= target_acc:
            break
wall = time.time() - t0
out["train_steps_ran"] = hist[-1][0]
out["train_wall_s"] = round(wall, 1)
out["ms_per_step"] = round(wall / hist[-1][0] * 1e3, 1)
out["final_loss"] = hist[-1][1]
out["final_acc"] = hist[-1][2]
out["loss_history"] = hist
with open(os.environ.get("C3_OUT", "config3_result.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: v for k, v in out.items() if k != "loss_history"},
                 indent=2), flush=True)
