"""1M-agent TRAINING on one chip (VERDICT r3 #3 / BASELINE config 5's
training half).

Trains the flagship GAT-ODE on a 1,048,576-agent x 500-zone x 12-time
population on a single v5e chip, two ways:

  A. microbatched SGD epochs — make_epoch_fn's one-jit-per-epoch scan,
     32,768-agent microbatches (the bench's train workload shape),
     32 optimizer updates per epoch;
  B. grad-accumulated FULL-population batch — make_epoch_fn(accum=32):
     one optimizer update per epoch on the mean gradient over all
     1,048,576 agents, HBM holding one microbatch of activations.

Reports ms/epoch, agents/s, losses (must decrease), and HBM usage /
headroom from device.memory_stats(). Timing: warm-up epoch first
(compile), then K timed epochs chained through the params carry with a
single scalar pull at the end (block_until_ready is unreliable on the
remote backend — CLAUDE.md).

Run (holds the TPU lock): python docs/evidence_round4/train_1m.py
"""
import json
import os
import sys
import time

TPU_LOCK = "/tmp/ananke_tpu.lock"


def main():
    with open(TPU_LOCK, "w") as f:
        f.write(str(os.getpid()))
    try:
        run()
    finally:
        os.unlink(TPU_LOCK)


def run():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ananke_abm_tpu.data_generator.agent_trajectories import (
        generate_agent_population,
    )
    from ananke_abm_tpu.models.gnn_embed.train import (
        GATODEConfig, build_fused_loss_fn, build_model, init_params,
        make_epoch_fn,
    )

    N = 1_048_576
    Z = 500
    T = 12
    BSZ = 32_768
    n_batches = N // BSZ  # 32

    dev = jax.devices()[0]
    assert dev.platform == "tpu", dev

    t0 = time.time()
    data = generate_agent_population(N, num_times=T, num_zones=Z, seed=0)
    gen_s = time.time() - t0

    config = GATODEConfig()
    model = build_model(
        config, data["zone_features"].shape[-1],
        data["person_feats"].shape[-1],
    )
    params = init_params(model, config, data, BSZ, jax.random.PRNGKey(0))
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(config.lr, weight_decay=config.weight_decay),
    )

    zf = jnp.asarray(data["zone_features"])
    adj = jnp.asarray(data["adj"])
    times = jnp.asarray(data["times"])
    pf = jnp.asarray(data["person_feats"])
    hz = jnp.asarray(data["home_zone"])
    tg = jnp.asarray(data["zone_ids"])

    fused_loss = build_fused_loss_fn(model, config, zf, adj, times)
    loss_g = lambda p, a, b, c, _g: fused_loss(p, a, b, c)  # noqa: E731

    def batches_for(epoch):
        perm = np.random.default_rng(epoch).permutation(N)
        return jnp.asarray(perm.reshape(n_batches, BSZ))

    HBM_GB = 16.0  # v5e per-chip

    def mem(epoch_fn, args):
        """HBM accounting from the compiled epoch program. The remote
        backend's device.memory_stats() returns None, so the compiled
        executable's own memory analysis (arguments + temps + output)
        is the headroom source of truth here."""
        try:
            ma = epoch_fn.jitted.lower(
                *args, epoch_fn.graph
            ).compile().memory_analysis()
            total = (
                ma.argument_size_in_bytes + ma.temp_size_in_bytes
                + ma.output_size_in_bytes + ma.generated_code_size_in_bytes
            )
            return {
                "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
                "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
                "output_gb": round(ma.output_size_in_bytes / 2**30, 3),
                "total_gb": round(total / 2**30, 3),
                "hbm_gb": HBM_GB,
                "headroom_gb": round(HBM_GB - total / 2**30, 3),
            }
        except Exception as e:
            return {"memory_analysis_error": repr(e)}

    out = {
        "n_agents": N, "num_zones": Z, "num_times": T,
        "microbatch": BSZ, "n_microbatches": n_batches,
        "generation_s": round(gen_s, 1), "device": str(dev),
        "data_hbm_mb": round(
            sum(a.size * a.dtype.itemsize for a in (pf, hz, tg, zf, adj))
            / 2**20, 1,
        ),
    }

    for label, accum in (("A_sgd_epoch", 1), ("B_fullbatch_accum32", 32)):
        epoch_fn = make_epoch_fn(optimizer, loss_g, graph=(), accum=accum)
        p, st = params, optimizer.init(params)
        t0 = time.time()
        p, st, losses0, _ = epoch_fn(p, st, pf, hz, tg, batches_for(0))
        first = float(losses0[0])  # scalar pull = sync
        compile_s = time.time() - t0

        K = 3
        t0 = time.time()
        all_losses = []
        for e in range(1, K + 1):
            p, st, losses, _ = epoch_fn(p, st, pf, hz, tg, batches_for(e))
            all_losses.append(losses)
        last = float(all_losses[-1][-1])  # sync once after K epochs
        dt = (time.time() - t0) / K

        out[label] = {
            "compile_plus_first_epoch_s": round(compile_s, 1),
            "ms_per_epoch": round(1e3 * dt, 1),
            "agents_per_s": round(N / dt, 1),
            "updates_per_epoch": n_batches // accum,
            "first_microbatch_loss": round(first, 4),
            "last_microbatch_loss": round(last, 4),
            "epoch_mean_losses": [
                round(float(jnp.mean(l)), 4) for l in all_losses
            ],
            "hbm": mem(
                epoch_fn,
                (params, optimizer.init(params), pf, hz, tg,
                 batches_for(0)),
            ),
        }
        print(label, json.dumps(out[label]), file=sys.stderr)

    path = os.path.join(os.path.dirname(__file__), "train_1m.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
