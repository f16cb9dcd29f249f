"""Round-5 VERDICT item 1c: config-3 train step after the glue cuts —
(a) the Hairer error reduction folded into the forward step kernel
(err_stats: the controller skips its full-state norm pass and the kernel
skips the (N, Da) err write), (b) the ckpt_every=1 backward's statically
dead accept-masking removed (two full-state selects + a masked g_args
accumulate per accepted step).

Same workload and sync protocol as round 4 (98,304 agents, Z=64, T=12,
dopri5 rtol=atol=1e-5, discrete adjoint, full train step with adamw,
steps chained through the carried params). Round-4 numbers to beat:
fwd solve 463.5 ms (337 kernel + 127 glue), train step 1,548.5 ms;
target <= 1,400 ms (VERDICT r4 #1).
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
from ananke_abm_tpu.ops.pallas.fused_dopri5 import make_fused_dopri5_hooks

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
       "round4_fwd_solve_ms": 463.5,
       "round4_train_step_ms": 1548.5}

zone_feats, adj, times = static


def rhs(t, x, a):
    p, hh, zee = a
    return model.apply({"params": p}, t, x, hh, zee, method=model.rhs)


ze = model.apply({"params": params0}, zone_feats, adj,
                 method=model.encode_zones)
x0, hctx = model.apply({"params": params0}, pf, hz, ze,
                       method=model.initial_state)
args = (params0, hctx, ze)

# ---- forward solve A/B: controller-side norm vs in-kernel norm ----
for name, hooks_kw in (
    ("fwd_solve_plain_norm", {}),
    ("fwd_solve_kernel_norm", {"err_stats": (cfg.rtol, cfg.atol)}),
):
    step_impl, _ = make_fused_dopri5_hooks(**hooks_kw)
    fsolve = jax.jit(lambda x, si=step_impl: dopri5_solve(
        rhs, x, times, args, rtol=cfg.rtol, atol=cfg.atol,
        step_impl=si,
        record={"max_accepted": 256, "ckpt_every": 16}))
    ys, stats = fsolve(x0)
    float(jnp.sum(ys))
    t0 = time.time()
    for _ in range(REPS):
        ys, stats = fsolve(x0)
    float(jnp.sum(ys))
    out[name + "_ms"] = round((time.time() - t0) / REPS * 1e3, 1)
    out[name + "_stats"] = {k: float(v) for k, v in stats.items()
                            if jnp.ndim(v) == 0}
    print(name, out[name + "_ms"], "ms", out[name + "_stats"],
          flush=True)
n_acc = out["fwd_solve_kernel_norm_stats"]["n_accepted"]

# ---- full train step (shipping fast config: ck1 + bf16 bwd; the
# fused hooks now carry err_stats via build_adjoint_loss_fn_g) ----
step, loss_fn = make_adjoint_step_fns(
    model, opt, cfg, static, adjoint_mode="discrete",
    max_accepted=256, ckpt_every=1, bwd_precision="bf16")
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
out["train_step"] = {
    "compile_plus_first_step_s": round(compile_s, 1),
    "ms_per_step": round(ms, 1),
    "agents_per_s": round(N / (ms / 1e3), 1),
    "first_loss": l0, "loss_after_reps": lf,
}
print("train_step:", out["train_step"], flush=True)

# ---- gradient agreement: fast config vs the f32/ck16 reference ----
_, loss_ref = make_adjoint_step_fns(model, opt, cfg, static,
                                    adjoint_mode="discrete",
                                    max_accepted=256, ckpt_every=16)
g_a = jax.jit(jax.grad(lambda p: loss_ref(p, pf, hz, tg)[0]))(params0)
g_b = jax.jit(jax.grad(lambda p: loss_fn(p, pf, hz, tg)[0]))(params0)
fa = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_a)])
fb = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_b)])
out["grad_cosine_fast_vs_ref_at_98k"] = float(
    jnp.vdot(fa, fb) / (jnp.linalg.norm(fa) * jnp.linalg.norm(fb)))
print("grad cosine:", out["grad_cosine_fast_vs_ref_at_98k"], flush=True)

# ---- throughput accounting (same model as round 4) ----
flops_eval = (2 * 130 * 128 + 2 * 4 * 128 * 128 + 2 * 128 * 32
              + 2 * 32 * 64 + 2 * 2 * 64 * 64)
evals = n_acc * 6 * (1 + 3)
out["flops_per_agent_per_eval"] = flops_eval
out["train_step_eval_equivalents"] = evals
out["tflops_per_s"] = (
    flops_eval * evals * N / (ms / 1e3) / 1e12)
out["speedup_vs_round4"] = round(1548.5 / ms, 2)
out["target_1400ms_met"] = bool(ms <= 1400.0)
print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round5/config3_fast.json", "w") as f:
    json.dump(out, f, indent=2)
