"""Localize the config-3 discrete-adjoint BACKWARD's cost, sweep the
fused-kernel tile size at this geometry (98,304 agents, Z=64), and
re-measure the full solve + train step with the tuned tiles and the
lazy interpolation representation.

First-pass findings (kept in the JSON): the backward is essentially AT
its kernel floor (glue ~49 ms of the train step's ~1,074 ms bwd), the
VJP kernel peaks at tile 1024 (4.681 ms/step, 37% MFU), the forward
kernel at tile 2048 (1.539 ms/step), and tile 4096 exceeds the remote
compiler's scoped-memory budget on the VJP kernel (HTTP 500) — so the
VJP sweep stops at 2048.
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
from ananke_abm_tpu.ode.dopri5 import dopri5_solve
from ananke_abm_tpu.ops.pallas import fused_dopri5

N, Z, T = 98304, 64, 12
REPS = 8
N_STEPS = 219
cfg = GATODEConfig(method="dopri5")
d = generate_agent_population(N, num_times=T, seed=7, num_zones=Z)
model = build_model(cfg, 7, 8)
params0 = init_params(model, cfg, d, 4096, jax.random.PRNGKey(7))
zone_feats, adj, times = (jnp.asarray(d["zone_features"]),
                          jnp.asarray(d["adj"]), jnp.asarray(d["times"]))
pf, hz = jnp.asarray(d["person_feats"]), jnp.asarray(d["home_zone"])
tg = jnp.asarray(d["zone_ids"])


def rhs(t, x, a):
    p, hh, zee = a
    return model.apply({"params": p}, t, x, hh, zee, method=model.rhs)


ze = model.apply({"params": params0}, zone_feats, adj,
                 method=model.encode_zones)
x0, hctx = model.apply({"params": params0}, pf, hz, ze,
                       method=model.initial_state)
args = (params0, hctx, ze)
out = {"n_agents": N, "num_zones": Z, "reps": REPS,
       "n_steps_fixed": N_STEPS,
       "first_pass_sweep_ms_per_step": {
           "fwd": {"512": 1.812, "1024": 1.615, "2048": 1.539,
                   "4096": 1.719},
           "bwd": {"512": 5.225, "1024": 4.681, "2048": 5.048,
                   "4096": "compile OOM (remote HTTP 500)"},
       }}
h_fixed = (times[-1] - times[0]) / N_STEPS
t0c = times[0]
f0c = jax.jit(lambda x: rhs(t0c, x, args))(x0)
g_like = jnp.ones_like(x0)
zeros = jnp.zeros_like(x0)


def timed(name, fn, *xs, per_step=True):
    r = fn(*xs)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.time()
    for _ in range(REPS):
        r = fn(*xs)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    ms = (time.time() - t0) / REPS * 1e3
    out[name] = {"total_ms": round(ms, 1)}
    if per_step:
        out[name]["ms_per_step"] = round(ms / N_STEPS, 3)
    print(name, out[name], flush=True)


# tuned defaults (TILE_N_FWD=2048 / TILE_N_BWD=1024) + lazy interp
step_impl, step_vjp = fused_dopri5.make_fused_dopri5_hooks(
    bwd_precision="bf16")


@jax.jit
def fwd_fori(x, f0):
    def body(i, carry):
        y, f = carry
        y1, f1, err, interp = step_impl(t0c, h_fixed, y, f, args)
        return (y1, f1)
    return jax.lax.fori_loop(0, N_STEPS, body, (x, f0))


@jax.jit
def bwd_fori(x, f0, g):
    def body(i, carry):
        gy, gf = carry
        gy0, gf0, gargs = step_vjp(
            t0c, h_fixed, x, f0, args, (gy, zeros, zeros, gf, gy))
        return (gy0, gf0)
    return jax.lax.fori_loop(0, N_STEPS, body, (g, g))


# bwd floor + the real loop's per-step g_args accumulation glue
@jax.jit
def bwd_fori_glue(x, f0, g):
    ga0 = jax.tree_util.tree_map(jnp.zeros_like, args)

    def body(i, carry):
        gy, gf, ga = carry
        gy0, gf0, gargs = step_vjp(
            t0c, h_fixed, x, f0, args, (gy, zeros, zeros, gf, gy))
        act = i < N_STEPS
        gy = jnp.where(act, gy0, gy)
        gf = jnp.where(act, gf0, gf)
        ga = jax.tree_util.tree_map(
            lambda a, b: a + jnp.where(act, b, jnp.zeros_like(b)),
            ga, gargs)
        return (gy, gf, ga)

    return jax.lax.fori_loop(0, N_STEPS, body, (g, g, ga0))


timed("fwd_fori_tuned", fwd_fori, x0, f0c)
timed("bwd_fori_tuned", bwd_fori, x0, f0c, g_like)
timed("bwd_fori_tuned_glue", bwd_fori_glue, x0, f0c, g_like)

# full adaptive forward solve (controller + recording) with tuned tiles
fsolve = jax.jit(lambda x: dopri5_solve(
    rhs, x, times, args, rtol=cfg.rtol, atol=cfg.atol,
    step_impl=step_impl,
    record={"max_accepted": 256, "ckpt_every": 1,
            "store_f": "bf16", "ckpt_dtype": "bf16"})[0])
timed("fwd_solve_tuned", fsolve, x0)

# full train step with tuned tiles
opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
static = (zone_feats, adj, times)
step, _ = make_adjoint_step_fns(
    model, opt, cfg, static, adjoint_mode="discrete",
    max_accepted=256, ckpt_every=1, bwd_precision="bf16",
    store_f="auto")
params = jax.tree_util.tree_map(jnp.array, params0)
opt_state = opt.init(params)
t0 = time.time()
params, opt_state, loss, acc = step(params, opt_state, pf, hz, tg)
l0 = float(loss)
compile_s = time.time() - t0
t0 = time.time()
for _ in range(REPS):
    params, opt_state, loss, acc = step(params, opt_state, pf, hz, tg)
lf = float(loss)
ms = (time.time() - t0) / REPS * 1e3
out["train_step_tuned"] = {
    "compile_plus_first_step_s": round(compile_s, 1),
    "ms_per_step": round(ms, 1),
    "agents_per_s": round(N / (ms / 1e3), 1),
    "first_loss": l0, "loss_after_reps": lf,
}
print("train_step_tuned", out["train_step_tuned"], flush=True)

out["notes"] = {
    "prior_train_step_ms": 1587.5,
    "prior_fwd_solve_ms": 513.4,
    "speedup_vs_round3_cold": round(3598.8 / ms, 2),
}
print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round4/config3_bwd_ablate.json", "w") as f:
    json.dump(out, f, indent=2)
