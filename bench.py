"""Benchmark: flagship GAT-ODE rollout throughput (agent-trajectories/sec).

BASELINE.json metric: "agent-trajectories/sec/chip at VISTA scale". The
reference publishes no numbers (BASELINE.md), so the baseline denominator
is self-measured: the same integrate-then-decode architecture implemented
reference-style in torch on CPU (hand-rolled RK4 loop, the way torchdiffeq
executes it), measured once and cached in ``BASELINE_SELF.json``.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BASELINE_SELF.json")
# Last successful LIVE measurement. The axon tunnel goes down for
# multi-hour stretches (CLAUDE.md); if it is down when the driver runs
# this script, we emit the cached line (labeled measured_live: false)
# instead of producing no record at all.
LAST_GOOD_CACHE = os.path.join(REPO, "BENCH_LAST_GOOD.json")

# Workload: BASELINE config 5 scale — 1M-agent synthetic population,
# fixed-step RK4 day rollout, integrate-and-decode, single chip. Serving
# path: the fused bf16 Pallas step kernel with grid-pipelined agent tiles
# (models/gnn_embed/rollout.py picks it automatically at this N).
N_AGENTS = 1_048_576
NUM_TIMES = 48  # 30-min output grid over 24h
SUBSTEPS = 2  # RK4 substeps per interval -> 96 RK4 steps/day
NUM_ZONES = 64
# Shipping default: GATODEConfig.num_blocks == 2 (models/gnn_embed/train.py).
# The driver bench measures the framework as users get it (VERDICT r2 #1).
NUM_BLOCKS = 2
BASELINE_AGENTS = 2048  # torch-CPU baseline sample size (extrapolated)

# Training-throughput workload (BASELINE config 4: ~500-zone bipartite
# attention, 32k-agent batch, full fwd+bwd+adamw step)
TRAIN_N = 32768
TRAIN_ZONES = 500
TRAIN_TIMES = 12

# Adaptive-training workload (BASELINE config 3: dopri5 + discrete
# adjoint at 98,304 agents x 64 zones — the measured config-3 geometry,
# docs/evidence_round5/config3_fast.json). Tracked here since round 5
# (VERDICT r4 #1) so the driver records the adaptive rung every round.
ADAPT_N = 98304
ADAPT_ZONES = 64
ADAPT_TIMES = 12

V5E_BF16_PEAK_TFLOPS = 197.0  # per-chip MXU peak, bf16 multiply / f32 acc


def rollout_flops_per_agent(da, dz, hidden, ctx, num_zones, num_times,
                            substeps, num_blocks):
    """Analytic matmul-FLOPs model of the fused day rollout (2*m*k*n per
    matmul, per agent): RK4 = 4 RHS evals per substep; RHS = query proj +
    attention scores + context + drift MLP; decode once per output time."""
    feat_in = da + dz + ctx + 2
    rhs = (
        2 * da * dz                      # q = x @ Wq
        + 2 * dz * num_zones             # scores = q @ ze.T
        + 2 * num_zones * dz             # ctx = attn @ ze
        + 2 * feat_in * hidden           # W1
        + num_blocks * 2 * (2 * hidden * hidden)  # Wr1, Wr2 per block
        + 2 * hidden * da                # W3
    )
    n_rk4_steps = (num_times - 1) * substeps
    decode = num_times * (2 * da * dz + 2 * dz * num_zones)
    return 4 * rhs * n_rk4_steps + decode


def measure_tpu() -> float:
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

    from ananke_abm_tpu.models.gnn_embed.rollout import make_decoded_rollout

    config = GATODEConfig(substeps=SUBSTEPS, num_blocks=NUM_BLOCKS)
    data = generate_agent_population(
        N_AGENTS, num_times=NUM_TIMES, seed=0, num_zones=NUM_ZONES
    )
    model = build_model(config, 7, 8)
    params = init_params(model, config, data, min(N_AGENTS, 1024), jax.random.PRNGKey(0))

    zone_feats = jnp.asarray(data["zone_features"])
    adj = jnp.asarray(data["adj"])
    times = jnp.asarray(data["times"])
    pf = jnp.asarray(data["person_feats"])
    hz = jnp.asarray(data["home_zone"])

    rollout = make_decoded_rollout(
        model, config, zone_feats, adj, times,
        use_pallas="auto", expected_n=N_AGENTS,
    )

    # sync via scalar pull: on the remote axon backend block_until_ready
    # does not reliably force execution (measured in round 3 — it can
    # return ~30 us "timings"); a device->host scalar transfer does.
    # Chain every iteration into one accumulator so the final pull
    # provably waits for ALL n_iter executions. Two-n difference cancels
    # the fixed per-run round-trip (~31 ms) that would otherwise inflate
    # the per-iteration time.
    float(jnp.sum(rollout(params, pf, hz)))  # compile + warm, synced

    def total_s(n_iter):
        t0 = time.time()
        acc = None
        for _ in range(n_iter):
            s = jnp.sum(rollout(params, pf, hz))
            acc = s if acc is None else acc + s
        float(acc)
        return time.time() - t0

    n1, n2 = 2, 10
    t1 = min(total_s(n1), total_s(n1))
    t2 = min(total_s(n2), total_s(n2))
    dt = (t2 - t1) / (n2 - n1)
    return N_AGENTS / dt


def measure_train_step() -> dict:
    """BASELINE config 4: full train step (fwd+bwd+adamw) at 32k agents x
    500 zones bipartite attention. Returns ms/step and agents/s."""
    import jax
    import jax.numpy as jnp
    import optax

    from ananke_abm_tpu.data_generator.agent_trajectories import (
        generate_agent_population,
    )
    from ananke_abm_tpu.models.gnn_embed.train import (
        GATODEConfig,
        build_model,
        build_fused_loss_fn,
        init_params,
    )

    config = GATODEConfig(substeps=SUBSTEPS, num_blocks=NUM_BLOCKS)
    data = generate_agent_population(
        TRAIN_N, num_times=TRAIN_TIMES, seed=1, num_zones=TRAIN_ZONES
    )
    model = build_model(config, 7, 8)
    params = init_params(model, config, data, 1024, jax.random.PRNGKey(1))
    static = (
        jnp.asarray(data["zone_features"]),
        jnp.asarray(data["adj"]),
        jnp.asarray(data["times"]),
    )
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    # fused Pallas fwd+VJP loss (ops/pallas/fused_train.py) — same body
    # make_fused_train_step jits; here it runs under lax.scan so the
    # two-K difference below can cancel the per-call dispatch cost
    loss_fn = build_fused_loss_fn(model, config, *static)
    pf = jnp.asarray(data["person_feats"])
    hz = jnp.asarray(data["home_zone"])
    tg = jnp.asarray(data["zone_ids"])

    # data arrays are threaded as explicit jit args — closure-captured
    # device arrays get baked into the serialized program shipped over
    # the remote-compile tunnel (CLAUDE.md: HTTP 413 at VISTA scale)
    def body(carry, _):
        p, o, pf, hz, tg = carry
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, pf, hz, tg
        )
        updates, o = optimizer.update(grads, o, p)
        return (optax.apply_updates(p, updates), o, pf, hz, tg), loss

    # two-K scan difference: total(K) = fixed_call_overhead + K * step, so
    # (total(K2) - total(K1)) / (K2 - K1) cancels the ~31 ms per-call
    # round-trip of the remote backend exactly (measured: a trivial-body
    # scan costs the same ~31 ms at K=1 and K=1000). The old eager-loop
    # protocol folded that round-trip into the step time (~+2 ms/step).
    def total_s(K, reps=3):
        @jax.jit
        def run(c):
            return jax.lax.scan(body, c, None, length=K)

        carry0 = (params, opt_state, pf, hz, tg)
        _, losses = run(carry0)
        float(jnp.sum(losses))  # compile + warm, scalar-pull synced
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            _, losses = run(carry0)
            float(jnp.sum(losses))
            best = min(best, time.time() - t0)
        return best

    K1, K2 = 5, 25
    dt = (total_s(K2) - total_s(K1)) / (K2 - K1)

    # analytic matmul-FLOPs model of the fused train step: integrate
    # forward (1x) + backward stage recompute (1x) + gradient matmuls
    # (~2x) = 4x the forward integrate; decode+CE fwd (1x) + bwd (2x)
    fwd_flops = rollout_flops_per_agent(
        da=32, dz=64, hidden=128, ctx=32, num_zones=TRAIN_ZONES,
        num_times=TRAIN_TIMES, substeps=SUBSTEPS, num_blocks=NUM_BLOCKS,
    )
    decode_flops = TRAIN_TIMES * (2 * 32 * 64 + 2 * 64 * TRAIN_ZONES)
    train_flops = 4 * (fwd_flops - decode_flops) + 3 * decode_flops
    tflops = TRAIN_N / dt * train_flops / 1e12
    return {
        "train_ms_per_step": round(1e3 * dt, 1),
        "train_agents_per_s": round(TRAIN_N / dt, 1),
        "train_tflops_per_s": round(tflops, 1),
        "train_mfu_vs_v5e_bf16_peak": round(
            tflops / V5E_BF16_PEAK_TFLOPS, 4
        ),
        "train_workload": f"{TRAIN_N} agents x {TRAIN_ZONES} zones x "
                          f"{TRAIN_TIMES} times, fwd+bwd+adamw",
    }


def measure_adaptive_step() -> dict:
    """BASELINE config 3: adaptive dopri5 + discrete-adjoint train step
    (fused step kernels, ckpt_every=1, bf16 backward — the shipping fast
    configuration) at 98,304 agents x 64 zones. Steps chain through the
    carried params; the final scalar pull syncs all of them."""
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

    config = GATODEConfig(method="dopri5")
    data = generate_agent_population(
        ADAPT_N, num_times=ADAPT_TIMES, seed=7, num_zones=ADAPT_ZONES
    )
    model = build_model(config, 7, 8)
    params = init_params(model, config, data, 4096, jax.random.PRNGKey(7))
    static = (
        jnp.asarray(data["zone_features"]),
        jnp.asarray(data["adj"]),
        jnp.asarray(data["times"]),
    )
    optimizer = optax.adamw(config.lr, weight_decay=config.weight_decay)
    opt_state = optimizer.init(params)
    step, _ = make_adjoint_step_fns(
        model, optimizer, config, static, adjoint_mode="discrete",
        max_accepted=256, ckpt_every=1, bwd_precision="bf16",
    )
    pf = jnp.asarray(data["person_feats"])
    hz = jnp.asarray(data["home_zone"])
    tg = jnp.asarray(data["zone_ids"])

    params, opt_state, loss, _ = step(params, opt_state, pf, hz, tg)
    float(loss)  # compile + warm, synced
    reps = 4
    t0 = time.time()
    for _ in range(reps):
        params, opt_state, loss, _ = step(params, opt_state, pf, hz, tg)
    float(loss)
    dt = (time.time() - t0) / reps
    return {
        "adaptive_ms_per_step": round(1e3 * dt, 1),
        "adaptive_agents_per_s": round(ADAPT_N / dt, 1),
        "adaptive_workload": f"{ADAPT_N} agents x {ADAPT_ZONES} zones x "
                             f"{ADAPT_TIMES} times, dopri5 rtol=atol=1e-5 "
                             "discrete adjoint, fwd+bwd+adamw",
    }


def measure_torch_cpu_baseline() -> float:
    """Reference-style torch CPU implementation of the same rollout."""
    import torch

    torch.manual_seed(0)
    Dz, Da, H, Z, F, P = 64, 32, 128, NUM_ZONES, 7, 8
    T, S = NUM_TIMES, SUBSTEPS
    N = BASELINE_AGENTS

    from ananke_abm_tpu.data_generator.agent_trajectories import (
        generate_agent_population,
    )

    data = generate_agent_population(N, num_times=T, seed=0, num_zones=Z)
    zf = torch.tensor(data["zone_features"])
    adj = torch.tensor(data["adj"])
    pfeat = torch.tensor(data["person_feats"])
    home = torch.tensor(data["home_zone"], dtype=torch.long)
    times = torch.tensor(data["times"])

    lin = lambda i, o: torch.nn.Linear(i, o)
    gat_w = lin(F, Dz)
    ctx_enc = torch.nn.Sequential(lin(P, H), torch.nn.ReLU(), lin(H, 32))
    q_proj = lin(Da, Dz)
    # drift matches the TPU model's residual MLP at the benched NUM_BLOCKS
    d_in = lin(Da + Dz + 32 + 2, H)
    d_blocks = [(lin(H, H), lin(H, H)) for _ in range(NUM_BLOCKS)]
    d_out = lin(H, Da)

    def drift(f):
        z = torch.tanh(d_in(f))
        for b1, b2 in d_blocks:
            z = torch.tanh(z + b2(torch.tanh(b1(z))))
        return d_out(z)

    init_proj = lin(Dz + 32, Da)
    dec_proj = lin(Da, Dz)

    with torch.no_grad():
        # zone embeddings: masked mean aggregation stand-in for the GAT
        ze = gat_w(zf)
        ze = (adj @ ze) / adj.sum(1, keepdim=True)

        h = ctx_enc(pfeat)
        x = init_proj(torch.cat([ze[home], h], -1))

        def rhs(t, x):
            q = q_proj(x)
            attn = torch.softmax(q @ ze.T / Dz**0.5, -1)
            ctx = attn @ ze
            tt = torch.tensor(t * 2 * torch.pi / 24)
            tf = torch.stack([torch.sin(tt), torch.cos(tt)]).expand(
                x.shape[0], 2
            )
            return drift(torch.cat([x, ctx, h, tf], -1))

        t0 = time.time()
        traj = [x]
        for i in range(T - 1):
            ta, tb = float(times[i]), float(times[i + 1])
            dt = (tb - ta) / S
            for s in range(S):
                t = ta + s * dt
                k1 = rhs(t, x)
                k2 = rhs(t + dt / 2, x + dt / 2 * k1)
                k3 = rhs(t + dt / 2, x + dt / 2 * k2)
                k4 = rhs(t + dt, x + dt * k3)
                x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            traj.append(x)
        xs = torch.stack(traj, 1)
        _ = torch.argmax(dec_proj(xs) @ ze.T, -1)
        dt_total = time.time() - t0
    return N / dt_total


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        # re-measure when the cached denominator was taken at a different
        # workload (e.g. pre-round-3 num_blocks=1 cache)
        if cached.get("workload", {}).get("num_blocks") == NUM_BLOCKS:
            return cached["torch_cpu_agents_per_s"]
    val = measure_torch_cpu_baseline()
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {
                "torch_cpu_agents_per_s": val,
                "workload": {
                    "n_agents_sampled": BASELINE_AGENTS,
                    "num_times": NUM_TIMES,
                    "substeps": SUBSTEPS,
                    "num_zones": NUM_ZONES,
                    "num_blocks": NUM_BLOCKS,
                },
            },
            f,
            indent=2,
        )
    return val


TPU_LOCK = "/tmp/ananke_tpu.lock"  # held by any long-running TPU job


def wait_for_tpu(budget_s: float | None = None) -> bool:
    """Wait (bounded) until the remote axon backend answers and no other
    TPU job holds the lock. The tunnel goes down for stretches and a
    second TPU process can wedge a running one (CLAUDE.md), so each
    probe runs in a SUBPROCESS with a hard timeout — a failed backend
    init never poisons this process's jax state. Returns True when the
    backend responded; False when the budget ran out (the measurement
    then proceeds and surfaces the real error)."""
    import subprocess

    if budget_s is None:
        budget_s = float(os.environ.get("BENCH_TPU_WAIT_S", "900"))
    def lock_held():
        # the lock names its holder pid; a dead holder = stale lock
        try:
            with open(TPU_LOCK) as f:
                pid = int(f.read().strip() or "0")
            os.kill(pid, 0)
            return True
        except (FileNotFoundError, ValueError, ProcessLookupError,
                PermissionError):
            return False

    deadline = time.time() + budget_s
    first = True
    while True:
        if not lock_held():
            try:
                probe = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; assert jax.devices()[0].platform == 'tpu'"],
                    timeout=max(60.0, min(240.0, deadline - time.time() + 240.0)),
                    capture_output=True,
                )
                if probe.returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                pass  # backend init hung — tunnel down
        if time.time() >= deadline:
            return False
        if first:
            print("bench: waiting for the TPU backend/lock...",
                  file=sys.stderr)
            first = False
        time.sleep(30)


def _load_last_good() -> dict | None:
    """Cached result of the last successful live run, or None. Only
    trusted when its workload matches the current constants (a stale
    cache from a different num_blocks/shape must not masquerade as a
    measurement of this code)."""
    try:
        with open(LAST_GOOD_CACHE) as f:
            cached = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None
    wl = cached.get("workload", {})
    want = {"n_agents": N_AGENTS, "num_times": NUM_TIMES,
            "substeps": SUBSTEPS, "num_zones": NUM_ZONES,
            "num_blocks": NUM_BLOCKS, "train_n": TRAIN_N,
            "train_zones": TRAIN_ZONES, "train_times": TRAIN_TIMES,
            "adapt_n": ADAPT_N, "adapt_zones": ADAPT_ZONES,
            "adapt_times": ADAPT_TIMES}
    if wl != want:
        return None
    return cached


def _save_last_good(result: dict) -> None:
    payload = {
        "result": result,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "workload": {"n_agents": N_AGENTS, "num_times": NUM_TIMES,
                     "substeps": SUBSTEPS, "num_zones": NUM_ZONES,
                     "num_blocks": NUM_BLOCKS, "train_n": TRAIN_N,
                     "train_zones": TRAIN_ZONES, "train_times": TRAIN_TIMES,
                     "adapt_n": ADAPT_N, "adapt_zones": ADAPT_ZONES,
                     "adapt_times": ADAPT_TIMES},
    }
    tmp = LAST_GOOD_CACHE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, LAST_GOOD_CACHE)


def _emit_cached(cached: dict, reason: str) -> None:
    line = dict(cached["result"])
    line["measured_live"] = False
    line["cached_measured_at"] = cached.get("measured_at")
    line["cache_reason"] = reason
    print(json.dumps(line))


def main():
    tpu_up = wait_for_tpu()
    cached = _load_last_good()
    if not tpu_up and cached is not None:
        print("bench: TPU backend never answered within the wait budget; "
              "emitting the last live measurement.", file=sys.stderr)
        _emit_cached(cached, "tpu backend unavailable at bench time")
        return
    try:
        tpu = measure_tpu()
        baseline = get_baseline()
        train_stats = measure_train_step()
        adapt_stats = measure_adaptive_step()
    except Exception as e:  # backend died mid-measure (tunnel outage)
        msg = str(e)
        transient = any(s in msg for s in (
            "UNAVAILABLE", "DEADLINE", "failed to initialize",
            "Unable to initialize backend", "Connection reset",
        ))
        if transient and cached is not None:
            print(f"bench: backend failed mid-measure ({msg[:200]}); "
                  "emitting the last live measurement.", file=sys.stderr)
            _emit_cached(cached, "tpu backend failed mid-measure")
            return
        raise

    flops_per_agent = rollout_flops_per_agent(
        da=32, dz=64, hidden=128, ctx=32, num_zones=NUM_ZONES,
        num_times=NUM_TIMES, substeps=SUBSTEPS, num_blocks=NUM_BLOCKS,
    )
    tflops = tpu * flops_per_agent / 1e12
    result = {
        "metric": "agent-trajectories/sec/chip (1M-agent GAT-ODE day rollout, RK4 x96 steps, 64 zones, interval-fused bf16 Pallas kernel w/ in-kernel decode)",
        "value": round(tpu, 1),
        "unit": "agents/s",
        "vs_baseline": round(tpu / baseline, 2),
        "rollout_tflops_per_s": round(tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
        "rollout_matmul_flops_per_agent": int(flops_per_agent),
        **train_stats,
        **adapt_stats,
    }
    _save_last_good(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
