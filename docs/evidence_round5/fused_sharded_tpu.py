"""Round-5 VERDICT item 2, compiled half: the fused-Pallas train step
under shard_map, COMPILED on the real chip (not interpret mode), at the
tier-2 geometry (4,096 agents x Z=512, full GATODEConfig dims).

The environment has one TPU chip, so the mesh here is 1-device — the
Mosaic lowering, the shard_map wrapping, and the psum epilogue all
compile and execute for real; the >=2-device sharding semantics of the
SAME step are proven on the virtual 8-CPU mesh (tier-2 sub-check (d) in
__graft_entry__._dryrun_tier2, interpret mode). Together: the kernels
compile on hardware AND the sharded wiring is numerically the
single-device step.

Asserts loss AND updated params (SGD) against make_fused_train_step,
and records the step time two ways: per eager call (which on the
remote-tunnel backend pays a large fixed dispatch cost for
explicitly-sharded executables — measured ~0.5-1.6 s/call at THIS
geometry where the same program under plain jit is ~4 ms), and the
honest compute number via the two-K scan difference (bench.py
protocol), which cancels that per-call overhead.
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
    make_fused_train_step,
)
from ananke_abm_tpu.parallel.mesh import make_mesh
from ananke_abm_tpu.parallel.sharded import make_sharded_fused_train_step

assert jax.default_backend() == "tpu", jax.default_backend()
n_agents, Z, T = 4096, 512, 8
config = GATODEConfig(substeps=1)
d = generate_agent_population(n_agents, num_times=T, seed=1, num_zones=Z)
model = build_model(config, d["zone_features"].shape[-1],
                    d["person_feats"].shape[-1])
params = init_params(model, config, d, n_agents, jax.random.PRNGKey(1))
opt = optax.sgd(1e-2)
st = opt.init(params)
static = (jnp.asarray(d["zone_features"]), jnp.asarray(d["adj"]),
          jnp.asarray(d["times"]))
pf = jnp.asarray(d["person_feats"])
hz = jnp.asarray(d["home_zone"])
tg = jnp.asarray(d["zone_ids"])

mesh = make_mesh(jax.device_count(), zone_parallel=1)
step_f = make_sharded_fused_train_step(model, opt, config, mesh, static)
t0 = time.time()
p_f, _, loss_f, acc_f = step_f(params, st, pf, hz, tg)
loss_f = float(loss_f)
compile_s = time.time() - t0
t0 = time.time()
reps = 10
p_r, st_r = p_f, st
for _ in range(reps):
    p_r, st_r, l_r, _ = step_f(p_r, st_r, pf, hz, tg)
float(l_r)
ms = (time.time() - t0) / reps * 1e3

# honest compute time: two-K scan difference over the SAME sharded
# body (cancels the sharded-executable per-call dispatch cost of the
# remote tunnel)
from jax.sharding import NamedSharding, PartitionSpec as P

from ananke_abm_tpu.models.gnn_embed.train import build_fused_loss_fn
from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

loss_fn = build_fused_loss_fn(model, config, *static)
rep_sh = NamedSharding(mesh, P())
ag_sh = NamedSharding(mesh, P(AGENT_AXIS))


def body(carry, _):
    p_, o_, pf_, hz_, tg_ = carry
    (l_, a_), g_ = jax.value_and_grad(loss_fn, has_aux=True)(
        p_, pf_, hz_, tg_)
    up, o_ = opt.update(g_, o_, p_)
    return (optax.apply_updates(p_, up), o_, pf_, hz_, tg_), l_


def run_K(K):
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=K),
                in_shardings=((rep_sh, rep_sh, ag_sh, ag_sh, ag_sh),))
    c0 = (params, opt.init(params), pf, hz, tg)
    _, losses = f(c0)
    float(jnp.sum(losses))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _, losses = f(c0)
        float(jnp.sum(losses))
        best = min(best, time.time() - t0)
    return best


scan_ms = (run_K(25) - run_K(5)) / 20 * 1e3

fused_1d, _ = make_fused_train_step(model, opt, config, static)
p_1, _, loss_1, _ = fused_1d(params, st, pf, hz, tg)
loss_1 = float(loss_1)
np.testing.assert_allclose(loss_f, loss_1, rtol=1e-4, atol=1e-5)
max_rel = 0.0
for a, b in zip(jax.tree_util.tree_leaves(p_f),
                jax.tree_util.tree_leaves(p_1)):
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
    denom = np.maximum(np.abs(b).max(), 1e-8)
    max_rel = max(max_rel, float(np.abs(a - b).max() / denom))

out = {
    "n_agents": n_agents, "num_zones": Z, "num_times": T,
    "mesh_devices": int(np.prod(mesh.devices.shape)),
    "backend": jax.default_backend(),
    "interpret_mode": False,
    "compile_plus_first_step_s": round(compile_s, 1),
    "per_call_ms_incl_tunnel_dispatch": round(ms, 1),
    "ms_per_step_scan": round(scan_ms, 2),
    "loss_sharded": loss_f, "loss_single": loss_1,
    "max_param_rel_diff": max_rel,
}
print(json.dumps(out, indent=2), flush=True)
with open("docs/evidence_round5/fused_sharded_tpu.json", "w") as f:
    json.dump(out, f, indent=2)
