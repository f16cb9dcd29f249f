"""TrajEmbed training (behavior contract from the reference CLI caller
src/ananke_abm/cli/run_models/traj_embed.py:6-24): train on an activities
CSV + purposes catalog with crf_mode in {linear, semi}; best-by-val
checkpoint ``ckpt_best.ckpt``.

The VAE and the CRF head train JOINTLY in one jitted epoch scan: total =
CE + beta*KL + lambda_crf * CRF-NLL(logits, labels), where the CRF term is
the linear-chain NLL or the semi-Markov NLL with the Dmax duration cap.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ananke_abm_tpu.losses import cross_entropy_masked, kl_gaussian
from ananke_abm_tpu.models.gen_schedule.crf.model import init_crf_params
from ananke_abm_tpu.models.traj_syn.configs import CRFConfig, TrajEmbedConfig
from ananke_abm_tpu.models.traj_syn.model import TrajEmbedVAE
from ananke_abm_tpu.ops.crf import crf_nll
from ananke_abm_tpu.ops.semi_crf import semicrf_nll
from ananke_abm_tpu.utils import ensure_dir, save_checkpoint
from ananke_abm_tpu.utils.make_purposes import build_purposes_catalog
from ananke_abm_tpu.utils.traj_fig.make_buffer_grid import make_buffer_grid


def purpose_features_from_catalog(catalog, purpose_map) -> np.ndarray:
    """(P, 8) catalog feature vectors ordered by purpose index.

    Reads the reference purposes.csv schema (utils/make_purposes.py):
    participation, occurrences-per-participating-day, median duration and
    start, start circular variance, flexibility, and the two tags."""
    feats = np.zeros((len(purpose_map), 8), np.float32)
    cat = catalog.set_index("purpose")
    for name, idx in purpose_map.items():
        if name not in cat.index:
            continue
        r = cat.loc[name]
        occ_per_pd = float(r["n_occurrences"]) / max(
            float(r["n_person_days_with_purpose"]), 1.0
        )
        feats[idx] = [
            r["person_day_participation_rate"],
            np.log1p(occ_per_pd),
            r["median_duration_min"] / 480.0,
            r["median_start_min"] / 1440.0,
            r["start_circ_var"],
            r["flexibility"],
            float(r["is_primary"]),
            float(r["can_open_close_day"]),
        ]
    return feats


def train_traj_embed(
    activities_csv: str,
    purposes_csv: str | None,
    epochs: int = 100,
    batch_size: int = 32,
    lr: float = 1e-3,
    val_ratio: float = 0.1,
    outdir: str = "runs/traj_embed",
    crf_mode: str = "linear",
    seed: int = 0,
    vae_only: bool = False,
    semi_Dmax_minutes: int = 300,
    config: TrajEmbedConfig | None = None,
    mesh=None,
):
    """``mesh``: optional (agents x zones) Mesh — every batch shards its
    row (person) axis across the agent mesh axis; params stay replicated
    and GSPMD inserts the gradient psum (same pattern as the schedule-VAE
    trainer, gen_schedule/pipeline/train.py)."""
    cfg = config or TrajEmbedConfig(lr=lr)
    crf_cfg = CRFConfig(
        crf_mode=crf_mode,
        semi_Dmax_minutes=semi_Dmax_minutes,
        grid_min=cfg.grid_min,
    )
    ensure_dir(outdir)

    Y, purpose_map, persids = make_buffer_grid(
        activities_csv, grid_min=cfg.grid_min, horizon_min=cfg.horizon_min
    )
    P = len(purpose_map)
    L = Y.shape[1]

    import pandas as pd

    if purposes_csv and os.path.exists(purposes_csv):
        catalog = pd.read_csv(purposes_csv)
        needed = {"person_day_participation_rate", "flexibility"}
        if not needed <= set(catalog.columns):
            catalog = build_purposes_catalog(activities_csv)
    else:
        catalog = build_purposes_catalog(activities_csv)
    purpose_feats = jnp.asarray(
        purpose_features_from_catalog(catalog, purpose_map)
    )

    # split
    rng_np = np.random.default_rng(seed)
    perm = rng_np.permutation(Y.shape[0])
    n_val = int(round(val_ratio * Y.shape[0]))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    Y_train = jnp.asarray(Y[train_idx].astype(np.int32))
    Y_val = jnp.asarray(Y[val_idx].astype(np.int32))

    model = TrajEmbedVAE(
        L=L, P=P, z_dim=cfg.z_dim, emb_dim=cfg.emb_dim,
        cnn_channels=cfg.cnn_channels, cnn_kernel=cfg.cnn_kernel,
        cnn_dropout=cfg.cnn_dropout,
    )
    key = jax.random.PRNGKey(seed)
    params = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, L), jnp.int32), key, purpose_feats,
    )["params"]

    crf_params = None
    if not vae_only:
        base = init_crf_params(jax.random.fold_in(key, 1), P)
        if crf_mode == "semi":
            crf_params = {
                "A": base["A"],
                "dur": jnp.zeros((P, crf_cfg.Dmax_bins)),
            }
        elif crf_mode == "linear":
            crf_params = base
        else:
            raise ValueError(f"Unknown crf_mode {crf_mode!r}")

    all_params = {"vae": params}
    if crf_params is not None:
        all_params["crf"] = crf_params

    bsz = int(min(batch_size, max(1, Y_train.shape[0])))
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(cfg.lr, weight_decay=cfg.weight_decay),
    )
    opt_state = optimizer.init(all_params)

    def loss_fn(all_params, batch, mask, rng, beta, deterministic):
        logits, mu, logvar = model.apply(
            {"params": all_params["vae"]},
            batch, rng, purpose_feats,
            deterministic=deterministic,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        ce = cross_entropy_masked(logits, batch, mask)
        kl = kl_gaussian(mu, logvar, mask)
        loss = ce + beta * kl
        comps = {"ce": ce, "kl": kl}
        if "crf" in all_params:
            cp = all_params["crf"]
            if crf_mode == "semi":
                nll = semicrf_nll(
                    logits, batch, cp["dur"], cp["A"], mask_b=mask,
                    exact_long=crf_cfg.exact_long,
                )
            else:
                nll = crf_nll(
                    logits + cp["bias"][None, None, :], batch, cp["A"],
                    mask_b=mask,
                )
            loss = loss + cfg.lambda_crf * nll
            comps["crf_nll"] = nll
        else:
            comps["crf_nll"] = jnp.zeros(())
        comps["loss"] = loss
        return loss, comps

    n_tb = max(1, -(-Y_train.shape[0] // bsz))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

        def shard_rows(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, PS(AGENT_AXIS))
            )
    else:
        def shard_rows(x):
            return x

    @functools.partial(jax.jit, static_argnames=("n_batches",))
    def train_epoch(all_params, opt_state, Y, key, beta, n_batches):
        n = Y.shape[0]
        perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
        pad = n_batches * bsz - n
        idx = jnp.concatenate([perm, perm[:pad]]) if pad else perm
        mask_full = (
            jnp.concatenate([jnp.ones(n), jnp.zeros(pad)]) if pad
            else jnp.ones(n)
        )

        def step(carry, i):
            all_params, opt_state = carry
            bidx = jax.lax.dynamic_slice_in_dim(idx, i * bsz, bsz)
            bmask = shard_rows(
                jax.lax.dynamic_slice_in_dim(mask_full, i * bsz, bsz)
            )
            grads, comps = jax.grad(loss_fn, has_aux=True)(
                all_params, shard_rows(Y[bidx]), bmask,
                jax.random.fold_in(key, i + 1), beta, False,
            )
            updates, opt_state = optimizer.update(grads, opt_state, all_params)
            all_params = optax.apply_updates(all_params, updates)
            return (all_params, opt_state), comps

        (all_params, opt_state), comps = jax.lax.scan(
            step, (all_params, opt_state), jnp.arange(n_batches)
        )
        return all_params, opt_state, jax.tree_util.tree_map(jnp.mean, comps)

    @jax.jit
    def val_loss(all_params, Y, key, beta):
        mask = jnp.ones(Y.shape[0])
        loss, _ = loss_fn(all_params, Y, mask, key, beta, True)
        return loss

    meta = {
        "purpose_map": purpose_map,
        "grid_min": cfg.grid_min,
        "horizon_min": cfg.horizon_min,
        "L": int(L),
        "N": int(Y.shape[0]),
    }

    warmup = max(1, int(epochs * cfg.beta_warm_frac))
    best = np.inf
    ckpt_path = os.path.join(outdir, "ckpt_best.ckpt")
    logs = []
    t0 = time.time()
    # best params stay referenced on device; ckpt_best is flushed every
    # ``flush_every`` epochs (crash safety for the reference's 1000-3000
    # epoch budgets) and once at exit — per-improvement writes device_get
    # the whole tree, which dominates wall clock over the remote tunnel.
    best_state = None  # (all_params, epoch) device refs
    flush_every = 100
    last_flushed_epoch = 0

    def flush_best():
        nonlocal last_flushed_epoch
        if best_state is None or best_state[1] == last_flushed_epoch:
            return
        bp, bepoch = best_state
        save_checkpoint(
            {
                "params": bp["vae"],
                "crf_params": bp.get("crf"),
                "cfg": dataclasses.asdict(cfg),
                "crf_cfg": dataclasses.asdict(crf_cfg),
                "meta": meta,
                "purpose_feats": np.asarray(purpose_feats),
                "epoch": bepoch,
            },
            ckpt_path,
        )
        last_flushed_epoch = bepoch

    for epoch in range(1, epochs + 1):
        beta = cfg.beta_target * min(1.0, epoch / warmup)
        ekey = jax.random.fold_in(key, 1000 + epoch)
        all_params, opt_state, comps = train_epoch(
            all_params, opt_state, Y_train, ekey, beta, n_tb
        )
        if Y_val.shape[0] > 0:
            vl = float(val_loss(all_params, Y_val, ekey, beta))
        else:
            vl = float(comps["loss"])
        logs.append({"epoch": epoch, "val_loss": vl,
                     **{k: float(v) for k, v in comps.items()}})
        if vl < best:
            best = vl
            best_state = (all_params, epoch)
        if epoch % flush_every == 0:
            flush_best()
    flush_best()
    elapsed = time.time() - t0

    import pandas as pd

    pd.DataFrame(logs).to_csv(os.path.join(outdir, "training_log.csv"), index=False)
    with open(os.path.join(outdir, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)
    print(f"traj_embed training completed in {elapsed:.2f}s, best val {best:.4f}")
    return {"best_val_loss": best, "seconds": elapsed, "ckpt": ckpt_path}


def train_vae_only(*args, **kwargs):
    """VAE-only variant (reference scripts/traj_embed/vae_only_test.sh)."""
    kwargs["vae_only"] = True
    return train_traj_embed(*args, **kwargs)
