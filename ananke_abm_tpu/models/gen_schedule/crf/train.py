"""CRF training over frozen-VAE unaries.

Parity with the reference train-crf
(src/ananke_abm/models/gen_schedule/models/crf/cli_train.py:14-113): Adam
(+weight decay) on the CRF NLL over (U, Y) pairs, best-by-val checkpoint
holding {params, P, T, home_idx}.

TPU-first loop: like the VAE trainer, an epoch is one jitted scan over
shuffled on-device batches.
"""
from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ananke_abm_tpu.models.gen_schedule.crf.model import (
    crf_nll_loss,
    init_crf_params,
)
from ananke_abm_tpu.utils import save_checkpoint


def train_crf(cfg: dict, seed: int = 0, log_every: int | None = None,
              mesh=None):
    """cfg carries the reference crf_config.yaml's ``crf`` section keys:
    train_npz, val_npz, save_path, meta_json, num_epochs, batch_size, lr,
    weight_decay, log_every.

    ``mesh``: optional (agents x zones) Mesh — gathered (U, Y) batches
    shard their row axis over the agent axis (data parallel; params
    replicated, gradient psum inserted by GSPMD)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P_

        from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

        def shard_rows(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P_(AGENT_AXIS))
            )
    else:
        def shard_rows(x):
            return x

    c = cfg["crf"] if "crf" in cfg else cfg
    with open(c["meta_json"], "r", encoding="utf-8") as f:
        crf_meta = json.load(f)
    home_idx = int(crf_meta.get("home_idx", -1))
    if home_idx < 0:
        raise ValueError("home_idx missing from crf_meta.json")

    tr = np.load(c["train_npz"])
    va = np.load(c["val_npz"])
    U_train = jnp.asarray(tr["U"], jnp.float32)
    Y_train = jnp.asarray(tr["Y"], jnp.int32)
    U_val = jnp.asarray(va["U"], jnp.float32)
    Y_val = jnp.asarray(va["Y"], jnp.int32)
    _, T, P = U_train.shape

    batch_size = int(min(int(c["batch_size"]), U_train.shape[0]))
    num_epochs = int(c["num_epochs"])
    log_every = int(c.get("log_every", 10)) if log_every is None else log_every

    key = jax.random.PRNGKey(seed)
    params = init_crf_params(jax.random.fold_in(key, 0), P)
    optimizer = optax.adamw(
        float(c["lr"]), weight_decay=float(c.get("weight_decay", 0.0))
    )
    opt_state = optimizer.init(params)

    n_tb = U_train.shape[0] // batch_size  # drop remainder within epoch

    # data tensors are explicit jit arguments — closing over them would
    # bake multi-hundred-MB constants into the compiled program (and blow
    # up remote-compile payloads at VISTA scale)
    @functools.partial(jax.jit, static_argnames=("n_batches",))
    def train_epoch(params, opt_state, U, Y, ekey, n_batches):
        perm = jax.random.permutation(ekey, U.shape[0])

        def step(carry, i):
            params, opt_state = carry
            bidx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
            loss, grads = jax.value_and_grad(crf_nll_loss)(
                params, shard_rows(U[bidx]), shard_rows(Y[bidx])
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_batches)
        )
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def val_nll(params, U, Y):
        return crf_nll_loss(params, shard_rows(U), shard_rows(Y))

    save_path = c["save_path"]
    d = os.path.dirname(save_path)
    if d:
        os.makedirs(d, exist_ok=True)

    best_val = None
    t0 = time.time()
    for epoch in range(1, num_epochs + 1):
        params, opt_state, tr_loss = train_epoch(
            params, opt_state, U_train, Y_train,
            jax.random.fold_in(key, epoch), max(1, n_tb),
        )
        mean_val = (
            float(val_nll(params, U_val, Y_val))
            if U_val.shape[0]
            else float(tr_loss)
        )

        if epoch % log_every == 0 or epoch in (1, num_epochs):
            print(
                json.dumps(
                    {
                        "epoch": epoch,
                        "train_nll": float(tr_loss),
                        "val_nll": mean_val,
                    }
                )
            )
        if best_val is None or mean_val < best_val:
            best_val = mean_val
            save_checkpoint(
                {"params": params, "P": P, "T": T, "home_idx": home_idx},
                save_path,
            )
    print(f"Training CRF completed in {time.time() - t0:.2f} seconds.")
    print(f"Saved best CRF to {save_path} with val_nll={best_val:.4f}")
    return {"best_val_nll": best_val}
