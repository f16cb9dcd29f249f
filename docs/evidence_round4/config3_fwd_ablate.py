"""Localize the config-3 adaptive FORWARD solve's overhead.

The fused step kernel should be HBM/MXU-bound at ~0.6-1.0 ms per
attempted step at config-3 scale, but the measured solve runs ~2.8 ms
per step (614 ms / 219 steps). This ablation ladder times, on the same
workload (98,304 agents, Z=64, T=12, rtol=atol=1e-5):

  A. kernel-only floor: dopri5_step_fused in a fori_loop at fixed h,
     no controller, no error norm, no dense output (219 iters).
  B. A + the controller's per-step XLA glue (error norm, accept
     selects, h update) but no dense output or recording: dopri5_solve
     with T=2 outputs, record=None.
  C. full dense output: T=12, record=None.
  D. + recording ck16 (the fwd-solve config measured in config3_fast).
  E. + recording ck1 + store_f bf16 (what the fast train step uses).

Differences between rungs attribute the per-step cost.
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
from ananke_abm_tpu.ode.dopri5 import dopri5_solve
from ananke_abm_tpu.ops.pallas.fused_dopri5 import (
    make_fused_dopri5_hooks,
    stage_time_rows,
)

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


def rhs(t, x, a):
    p, hh, zee = a
    return model.apply({"params": p}, t, x, hh, zee, method=model.rhs)


ze = model.apply({"params": params0}, zone_feats, adj,
                 method=model.encode_zones)
x0, hctx = model.apply({"params": params0}, pf, hz, ze,
                       method=model.initial_state)
args = (params0, hctx, ze)
step_impl, _ = make_fused_dopri5_hooks()
out = {"n_agents": N, "num_zones": Z, "num_times": T, "reps": REPS,
       "n_steps_fixed": N_STEPS}


def timed(name, fn, *xs):
    r = fn(*xs)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    t0 = time.time()
    for _ in range(REPS):
        r = fn(*xs)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    ms = (time.time() - t0) / REPS * 1e3
    out[name] = {"total_ms": round(ms, 1),
                 "ms_per_step": round(ms / N_STEPS, 3)}
    print(name, out[name], flush=True)
    return r


# ---- A: kernel-only floor (fixed h fori_loop) ----
h_fixed = (times[-1] - times[0]) / N_STEPS


@jax.jit
def kernel_only(x):
    f0 = rhs(times[0], x, args)

    def body(i, carry):
        y, f = carry
        t0 = times[0] + i * h_fixed
        y1, f1, err, interp = step_impl(t0, h_fixed, y, f, args)
        return (y1, f1)

    y, f = jax.lax.fori_loop(0, N_STEPS, body, (x, f0))
    return y


timed("A_kernel_fori", kernel_only, x0)

# ---- B-E: the adaptive controller ladder ----
mk = lambda ts, rec: jax.jit(lambda x: dopri5_solve(
    rhs, x, ts, args, rtol=cfg.rtol, atol=cfg.atol,
    step_impl=step_impl, record=rec)[0])

t2 = jnp.asarray([float(times[0]), float(times[-1])])
timed("B_ctrl_T2_norec", mk(t2, None), x0)
timed("C_ctrl_T12_norec", mk(times, None), x0)
timed("D_ctrl_T12_ck16", mk(times, {"max_accepted": 256,
                                    "ckpt_every": 16}), x0)
timed("E_ctrl_T12_ck1_storef", mk(times, {
    "max_accepted": 256, "ckpt_every": 1,
    "store_f": "bf16", "ckpt_dtype": "bf16"}), x0)

# attribute the ladder
a = out["A_kernel_fori"]["total_ms"]
out["attribution_ms"] = {
    "kernel_floor": a,
    "controller_glue": round(out["B_ctrl_T2_norec"]["total_ms"] - a, 1),
    "dense_output_T12": round(out["C_ctrl_T12_norec"]["total_ms"]
                              - out["B_ctrl_T2_norec"]["total_ms"], 1),
    "recording_ck16": round(out["D_ctrl_T12_ck16"]["total_ms"]
                            - out["C_ctrl_T12_norec"]["total_ms"], 1),
    "recording_ck1_storef_vs_ck16": round(
        out["E_ctrl_T12_ck1_storef"]["total_ms"]
        - out["D_ctrl_T12_ck16"]["total_ms"], 1),
}
print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round4/config3_fwd_ablate.json", "w") as f:
    json.dump(out, f, indent=2)
