"""Schedule-VAE training.

Behavior parity with the reference train pipeline
(src/ananke_abm/models/gen_schedule/pipeline/train.py:34-290): composite
loss CE + beta*KL (linear beta warmup over ``beta_warm_frac`` of epochs)
+ lambda_tv * total-variation + lambda_home * start/end-home loss
[+ lambda_tod/lambda_presence PDS calibration terms for auto_pds]; AdamW
with global-norm grad clip; best-by-val checkpoint on >0.003 improvement;
early stop after ``patience`` stale epochs once past ``min_epochs``;
{last, best_val} checkpoints embedding meta+cfg; per-epoch CSV log.

TPU-first loop design: the whole (N, T) grid lives on device; an epoch is
ONE jitted program — ``lax.scan`` over batches gathering shuffled rows by
index, so there is no per-batch host->device transfer (the reference moves
every batch across PCIe, train.py:130-133). The tail batch is padded with
wrapped indices and masked out of every loss mean.
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

from ananke_abm_tpu.losses import (
    cross_entropy_masked,
    kl_gaussian,
    minutes_share_loss,
    presence_rate_loss,
    start_end_home_loss,
    time_of_day_marginal_loss,
    time_total_variation,
)
from ananke_abm_tpu.models.gen_schedule.factory import build_model
from ananke_abm_tpu.utils import (
    ensure_dir,
    load_checkpoint,
    load_config,
    save_checkpoint,
    set_seed,
)

IMPROVEMENT_THRESHOLD = 0.003  # reference train.py:250


def _resolve_splits_path(cfg: dict) -> str:
    data = cfg["data"]
    p = data.get("splits") or data.get("split_pt") or ""
    if p.endswith(".pt"):  # reference-style config pointing at torch splits
        p = p[: -len(".pt")] + ".npz"
    if not p:
        p = data["npz"].replace(".npz", "_splits.npz")
    return p


def make_loss_fn(model, home_idx, lambdas, pds_arrays):
    """Build the composite masked loss. pds_arrays is None or a dict with
    pds_features (P,T,D), m_tod (P,T), presence (P,).

    ``stats`` is the mutable ``batch_stats`` collection (empty dict unless
    the model uses ``cnn_norm="batch"``); the updated collection rides the
    aux so the train scan can carry it (torch running-stat semantics)."""

    def loss_fn(params, stats, batch_y, mask, rng, beta, deterministic):
        pds_features = (
            pds_arrays["pds_features"] if pds_arrays is not None else None
        )
        if stats:
            (logits, mu, logvar), mutated = model.apply(
                {"params": params, "batch_stats": stats},
                batch_y,
                rng,
                pds_features=pds_features,
                deterministic=deterministic,
                rngs={"dropout": jax.random.fold_in(rng, 1)},
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            logits, mu, logvar = model.apply(
                {"params": params},
                batch_y,
                rng,
                pds_features=pds_features,
                deterministic=deterministic,
                rngs={"dropout": jax.random.fold_in(rng, 1)},
            )
            new_stats = stats
        ce = cross_entropy_masked(logits, batch_y, mask)
        kl = kl_gaussian(mu, logvar, mask)
        tv = time_total_variation(logits, mask)
        home = start_end_home_loss(logits, home_idx, mask)
        loss = (
            ce
            + beta * kl
            + lambdas["tv"] * tv
            + lambdas["home"] * home
        )
        comps = {"ce": ce, "kl": kl, "tv": tv, "home": home}
        if pds_arrays is not None:
            tod = time_of_day_marginal_loss(logits, pds_arrays["m_tod"], mask)
            pres = presence_rate_loss(logits, pds_arrays["presence"], mask)
            loss = loss + lambdas["tod"] * tod + lambdas["presence"] * pres
            comps["tod"] = tod
            comps["presence"] = pres
            if lambdas.get("share", 0.0) > 0.0:
                shr = minutes_share_loss(
                    logits, pds_arrays["share_emp"], mask
                )
                loss = loss + lambdas["share"] * shr
                comps["share"] = shr
            else:
                comps["share"] = jnp.zeros(())
        else:
            comps["tod"] = jnp.zeros(())
            comps["presence"] = jnp.zeros(())
            comps["share"] = jnp.zeros(())
        comps["loss"] = loss
        return loss, (comps, new_stats)

    return loss_fn


def _make_epoch_bodies(
    model, optimizer, home_idx, lambdas, pds_arrays, batch_size, mesh=None
):
    """Unjitted one-epoch train/eval bodies shared by the per-epoch jit
    wrappers (make_epoch_fns) and the fused multi-epoch scan
    (make_chunked_train_fn).

    ``mesh``: optional (agents x zones) Mesh for data-parallel training —
    the gathered batch shards its leading (agent) axis across the mesh;
    params stay replicated and GSPMD inserts the gradient psum. The grid
    array Y is small (VISTA scale: 42817 x 288 int32 = 49 MB) so it stays
    replicated."""
    loss_fn = make_loss_fn(model, home_idx, lambdas, pds_arrays)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

        def shard_rows(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(AGENT_AXIS))
            )
    else:
        def shard_rows(x):
            return x

    def train_epoch(params, opt_state, stats, Y, key, beta, n_batches):
        """One epoch: shuffle, scan over batches, sgd updates on device.
        ``stats`` (batch_stats; {} for GroupNorm models) rides the scan
        carry so running statistics accumulate across batches."""
        n = Y.shape[0]
        perm = jax.random.permutation(jax.random.fold_in(key, 0), n)
        pad = n_batches * batch_size - n
        idx = jnp.concatenate([perm, perm[: pad]]) if pad else perm
        mask_full = jnp.concatenate(
            [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
        ) if pad else jnp.ones((n,), jnp.float32)

        def step(carry, i):
            params, opt_state, stats = carry
            bidx = jax.lax.dynamic_slice_in_dim(idx, i * batch_size, batch_size)
            bmask = shard_rows(
                jax.lax.dynamic_slice_in_dim(mask_full, i * batch_size, batch_size)
            )
            batch = shard_rows(Y[bidx])
            rng = jax.random.fold_in(key, i + 1)
            grads, (comps, stats) = jax.grad(loss_fn, has_aux=True)(
                params, stats, batch, bmask, rng, beta, False
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, stats), comps

        (params, opt_state, stats), comps = jax.lax.scan(
            step, (params, opt_state, stats), jnp.arange(n_batches)
        )
        means = jax.tree_util.tree_map(jnp.mean, comps)
        return params, opt_state, stats, means

    def eval_epoch(params, stats, Y, key, beta, n_batches):
        n = Y.shape[0]
        pad = n_batches * batch_size - n
        idx = jnp.concatenate([jnp.arange(n), jnp.zeros((pad,), jnp.int32)]) if pad else jnp.arange(n)
        mask_full = jnp.concatenate(
            [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
        ) if pad else jnp.ones((n,), jnp.float32)

        def step(_, i):
            bidx = jax.lax.dynamic_slice_in_dim(idx, i * batch_size, batch_size)
            bmask = jax.lax.dynamic_slice_in_dim(
                mask_full, i * batch_size, batch_size
            )
            rng = jax.random.fold_in(key, i + 1)
            _, (comps, _stats) = loss_fn(
                params, stats, Y[bidx], bmask, rng, beta, True
            )
            # weight by valid count so epoch mean is exact over rows
            w = jnp.sum(bmask)
            return None, (comps, w)

        _, (comps, w) = jax.lax.scan(step, None, jnp.arange(n_batches))
        total_w = jnp.maximum(jnp.sum(w), 1.0)
        means = jax.tree_util.tree_map(
            lambda c: jnp.sum(c * w) / total_w, comps
        )
        return means

    return train_epoch, eval_epoch


def make_epoch_fns(
    model, optimizer, home_idx, lambdas, pds_arrays, batch_size, mesh=None
):
    """Per-epoch jitted (train_epoch, eval_epoch) pair — one dispatch per
    epoch. See make_chunked_train_fn for the fused multi-epoch variant."""
    train_body, eval_body = _make_epoch_bodies(
        model, optimizer, home_idx, lambdas, pds_arrays, batch_size,
        mesh=mesh,
    )
    train_epoch = functools.partial(
        jax.jit, static_argnames=("n_batches",)
    )(train_body)
    eval_epoch = functools.partial(
        jax.jit, static_argnames=("n_batches",)
    )(eval_body)
    return train_epoch, eval_epoch


def make_chunked_train_fn(
    model, optimizer, home_idx, lambdas, pds_arrays, batch_size, chunk,
    mesh=None,
):
    """Fused multi-epoch trainer: ONE jitted program scans ``chunk`` epochs
    (train scan + val eval + best-by-val + early-stop bookkeeping all
    on-device), so small populations pay one dispatch / metric fetch per
    ``chunk`` epochs instead of per epoch — over the remote-tunnel backend
    the per-epoch round trips dominate wall clock at reference scale.

    Early-stop semantics match the host loop (and the reference,
    train.py:249-253) exactly, including the quirky ordering: best-state
    update on >0.003 improvement, THEN wait increment, THEN the
    (epoch >= min_epochs and wait >= patience) stop check, THEN the wait
    reset on improvement. Epochs past a stop (or past ``max_epoch``) still
    occupy scan iterations but are masked no-ops; the host trims their log
    rows via the returned ``ran`` mask.

    The scan carry holds a second (params, opt_state) copy for the best
    state — that doubles optimizer-state memory, which is why this is an
    opt-in (``train.epochs_per_jit`` > 1) rather than the default path.
    """
    train_body, eval_body = _make_epoch_bodies(
        model, optimizer, home_idx, lambdas, pds_arrays, batch_size,
        mesh=mesh,
    )

    def _select(pred, new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(pred, a, b), new, old
        )

    @functools.partial(
        jax.jit,
        static_argnames=("n_tb", "n_vb", "min_epochs", "patience"),
    )
    def train_chunk(
        state, Y_train, Y_val, base_key, epoch0, max_epoch, beta_target,
        warmup_epochs, n_tb, n_vb, min_epochs, patience,
    ):
        has_val = Y_val.shape[0] > 0

        def step(state, e_idx):
            epoch = epoch0 + e_idx
            ran = jnp.logical_and(
                jnp.logical_not(state["done"]), epoch <= max_epoch
            )
            beta = beta_target * jnp.minimum(
                1.0, epoch.astype(jnp.float32) / warmup_epochs
            )
            ekey = jax.random.fold_in(base_key, epoch)
            p_new, o_new, s_new, tr_m = train_body(
                state["params"], state["opt_state"], state["stats"],
                Y_train, ekey, beta, n_tb,
            )
            params = _select(ran, p_new, state["params"])
            opt_state = _select(ran, o_new, state["opt_state"])
            stats = _select(ran, s_new, state["stats"])
            va_m = (
                eval_body(params, stats, Y_val, ekey, beta, n_vb)
                if has_val else tr_m
            )
            improvement = state["best_val"] - va_m["loss"]
            improved = jnp.logical_and(ran, improvement > IMPROVEMENT_THRESHOLD)
            best_val = jnp.where(improved, va_m["loss"], state["best_val"])
            best_params = _select(improved, params, state["best_params"])
            best_opt = _select(improved, opt_state, state["best_opt"])
            best_stats = _select(improved, stats, state["best_stats"])
            best_epoch = jnp.where(improved, epoch, state["best_epoch"])
            wait = state["wait"] + ran.astype(jnp.int32)
            stop_now = jnp.logical_and(
                ran,
                jnp.logical_and(epoch >= min_epochs, wait >= patience),
            )
            wait = jnp.where(
                jnp.logical_and(improved, jnp.logical_not(stop_now)),
                0, wait,
            )
            new_state = {
                "params": params,
                "opt_state": opt_state,
                "stats": stats,
                "best_params": best_params,
                "best_opt": best_opt,
                "best_stats": best_stats,
                "best_val": best_val,
                "best_epoch": best_epoch,
                "wait": wait,
                "done": jnp.logical_or(state["done"], stop_now),
            }
            return new_state, (tr_m, va_m, ran, stop_now)

        state, (tr_rows, va_rows, ran, stopped) = jax.lax.scan(
            step, state, jnp.arange(chunk)
        )
        return state, tr_rows, va_rows, ran, stopped

    def init_state(params, opt_state, stats=None):
        stats = {} if stats is None else stats
        return {
            "params": params,
            "opt_state": opt_state,
            "stats": stats,
            "best_params": params,
            "best_opt": opt_state,
            "best_stats": stats,
            "best_val": jnp.asarray(jnp.inf, jnp.float32),
            "best_epoch": jnp.asarray(0, jnp.int32),
            "wait": jnp.asarray(0, jnp.int32),
            "done": jnp.asarray(False),
        }

    return train_chunk, init_state


def train(config, output_dir: str, seed: int = 123, resume: bool = False,
          mesh=None):
    """Train a schedule VAE. ``config`` is a path or a dict. ``mesh``
    enables data-parallel batch sharding (see make_epoch_fns)."""
    cfg = load_config(config) if isinstance(config, str) else config
    base_key = set_seed(seed)

    outdir = ensure_dir(output_dir)
    ensure_dir(os.path.join(outdir, "checkpoints"))

    data_npz = cfg["data"]["npz"]
    with open(data_npz.replace(".npz", "_meta.json"), "r", encoding="utf-8") as f:
        meta = json.load(f)
    purpose_map = meta["purpose_map"]
    home_idx = purpose_map.get("Home")
    if home_idx is None:
        raise ValueError("Purpose map must contain 'Home'.")

    t_start = time.time()

    Y_all = np.load(data_npz)["Y"].astype(np.int32)
    splits = np.load(_resolve_splits_path(cfg))
    Y_train = jnp.asarray(Y_all[splits["train_idx"]])
    Y_val = jnp.asarray(Y_all[splits["val_idx"]])

    model, pds_features = build_model(cfg, meta)

    tr = cfg["train"]
    batch_size = int(min(tr["batch_size"], max(1, Y_train.shape[0])))
    lambdas = {
        "tv": float(tr.get("lambda_tv", 0.0)),
        "home": float(tr.get("lambda_home", 0.1)),
        "tod": float(tr.get("lambda_tod", 0.0)),
        "presence": float(tr.get("lambda_presence", 0.0)),
        "share": float(tr.get("lambda_share", 0.0)),
    }

    pds_arrays = None
    if cfg["model"]["method"] == "auto_pds":
        pds_npz = np.load(cfg["model"]["pds_path"])
        m_tod = jnp.asarray(pds_npz["m_tod"], dtype=jnp.float32)
        pds_arrays = {
            "pds_features": jnp.asarray(pds_features),
            "m_tod": m_tod,
            "presence": jnp.asarray(
                pds_npz["presence_rate"], dtype=jnp.float32
            ),
            # empirical minutes share = time-mean of the ToD marginal
            "share_emp": m_tod.mean(axis=1),
        }

    optimizer = optax.chain(
        optax.clip_by_global_norm(float(tr.get("grad_clip", 5.0))),
        optax.adamw(
            float(tr["lr"]), weight_decay=float(tr.get("weight_decay", 0.0))
        ),
    )

    # init
    init_rng = jax.random.fold_in(base_key, 0)
    dummy = jnp.zeros((2, meta["L"]), jnp.int32)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng},
        dummy,
        init_rng,
        pds_features=(
            pds_arrays["pds_features"] if pds_arrays is not None else None
        ),
        deterministic=True,
    )
    params = variables["params"]
    # mutable running stats ({} unless cnn_norm="batch") — ride the train
    # loop alongside params and land in every checkpoint
    stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    start_epoch = 1

    last_ckpt = os.path.join(outdir, "checkpoints", "last.ckpt")
    best_ckpt = os.path.join(outdir, "checkpoints", "best_val.ckpt")
    if resume and os.path.exists(last_ckpt):
        obj = load_checkpoint(last_ckpt)
        params = jax.tree_util.tree_map(jnp.asarray, obj["params"])
        if obj.get("batch_stats"):
            stats = jax.tree_util.tree_map(
                jnp.asarray, obj["batch_stats"]
            )
        if "opt_state" in obj:
            opt_state = jax.tree_util.tree_map(
                lambda ref, saved: jnp.asarray(saved).astype(ref.dtype)
                if hasattr(ref, "dtype")
                else saved,
                opt_state,
                obj["opt_state"],
            )
        start_epoch = int(obj.get("epoch", 0)) + 1

    epochs_per_jit = int(tr.get("epochs_per_jit", 1))
    if epochs_per_jit <= 1:
        train_epoch, eval_epoch = make_epoch_fns(
            model, optimizer, home_idx, lambdas, pds_arrays, batch_size,
            mesh=mesh,
        )
    else:
        train_chunk, init_chunk_state = make_chunked_train_fn(
            model, optimizer, home_idx, lambdas, pds_arrays, batch_size,
            epochs_per_jit, mesh=mesh,
        )

    num_epochs = int(tr["epochs"])
    min_epochs = int(tr.get("min_epochs", num_epochs))
    patience = int(tr.get("patience", 0))
    warmup_epochs = max(1, int(num_epochs * float(tr.get("beta_warm_frac", 0.3))))
    beta_target = float(tr.get("beta_target", 1.0))

    n_tb = -(-Y_train.shape[0] // batch_size)
    n_vb = max(1, -(-Y_val.shape[0] // batch_size))

    # Checkpoint cadence: a per-epoch last.ckpt write device_gets the full
    # params+opt_state every epoch — over a remote-tunnel backend that
    # dominates wall clock (measured ~20 s/epoch vs ~1 s of compute at
    # VISTA scale). last.ckpt is written every `ckpt_every` epochs and at
    # exit; the best params stay referenced on device and best_val.ckpt is
    # materialized once at exit (same {last, best_val} artifacts).
    ckpt_every = int(tr.get("ckpt_every", 25))

    best_val_loss = np.inf
    best_state = None  # (params, opt_state, stats, epoch) device refs
    wait = 0
    logs = []
    epoch = start_epoch - 1

    if epochs_per_jit > 1:
        state = init_chunk_state(params, opt_state, stats)
        for chunk_start in range(
            start_epoch, num_epochs + 1, epochs_per_jit
        ):
            state, tr_rows, va_rows, ran, _ = train_chunk(
                state, Y_train, Y_val, base_key,
                jnp.asarray(chunk_start, jnp.int32),
                jnp.asarray(num_epochs, jnp.int32),
                float(beta_target), float(warmup_epochs),
                n_tb, n_vb, min_epochs, patience,
            )
            tr_rows, va_rows, ran = jax.device_get((tr_rows, va_rows, ran))
            for j in range(epochs_per_jit):
                if not bool(ran[j]):
                    break
                epoch = chunk_start + j
                logs.append(
                    {
                        "epoch": epoch,
                        "beta": beta_target
                        * min(1.0, epoch / warmup_epochs),
                        **{
                            f"train_{k}": float(v[j])
                            for k, v in tr_rows.items()
                        },
                        **{
                            f"val_{k}": float(v[j])
                            for k, v in va_rows.items()
                        },
                    }
                )
            params = state["params"]
            opt_state = state["opt_state"]
            stats = state["stats"]
            if (epoch // ckpt_every) > ((chunk_start - 1) // ckpt_every):
                save_checkpoint(
                    {
                        "params": params,
                        "opt_state": opt_state,
                        "batch_stats": stats,
                        "meta": meta,
                        "cfg": cfg,
                        "epoch": epoch,
                    },
                    last_ckpt,
                )
            if bool(jax.device_get(state["done"])):
                print(f"No improvement for {patience} epochs, stopping.")
                break
        best_val_loss = float(jax.device_get(state["best_val"]))
        if np.isfinite(best_val_loss):
            best_state = (
                state["best_params"],
                state["best_opt"],
                state["best_stats"],
                int(jax.device_get(state["best_epoch"])),
            )
        else:
            best_val_loss = np.inf

    per_epoch_range = (
        range(start_epoch, num_epochs + 1) if epochs_per_jit <= 1
        else range(0)
    )
    for epoch in per_epoch_range:
        beta = beta_target * min(1.0, epoch / warmup_epochs)
        ekey = jax.random.fold_in(base_key, epoch)
        params, opt_state, stats, tr_m = train_epoch(
            params, opt_state, stats, Y_train, ekey, beta, n_tb
        )
        if Y_val.shape[0] > 0:
            va_m = eval_epoch(params, stats, Y_val, ekey, beta, n_vb)
        else:
            va_m = tr_m
        tr_m = jax.device_get(tr_m)
        va_m = jax.device_get(va_m)

        if epoch % ckpt_every == 0:
            save_checkpoint(
                {
                    "params": params,
                    "opt_state": opt_state,
                    "batch_stats": stats,
                    "meta": meta,
                    "cfg": cfg,
                    "epoch": epoch,
                },
                last_ckpt,
            )

        logs.append(
            {
                "epoch": epoch,
                "beta": beta,
                **{f"train_{k}": float(v) for k, v in tr_m.items()},
                **{f"val_{k}": float(v) for k, v in va_m.items()},
            }
        )

        improvement = best_val_loss - float(va_m["loss"])
        improved = improvement > IMPROVEMENT_THRESHOLD
        if improved:
            best_val_loss = float(va_m["loss"])
            best_state = (params, opt_state, stats, epoch)

        # reference semantics (train.py:249-253): past min_epochs, stop once
        # `wait` reaches `patience` (patience=0 stops right at min_epochs)
        wait += 1
        if epoch >= min_epochs and wait >= patience:
            print(f"No improvement for {patience} epochs, stopping.")
            break
        if improved:
            wait = 0

    save_checkpoint(
        {
            "params": params,
            "opt_state": opt_state,
            "batch_stats": stats,
            "meta": meta,
            "cfg": cfg,
            "epoch": epoch,
        },
        last_ckpt,
    )
    if best_state is not None:
        b_params, b_opt, b_stats, b_epoch = best_state
        save_checkpoint(
            {
                "params": b_params,
                "opt_state": b_opt,
                "batch_stats": b_stats,
                "meta": meta,
                "cfg": cfg,
                "epoch": b_epoch,
            },
            best_ckpt,
        )

    elapsed = time.time() - t_start
    print(f"Training completed in {elapsed:.2f} seconds.")

    if not os.path.exists(best_ckpt):
        save_checkpoint(
            {
                "params": params,
                "opt_state": opt_state,
                "batch_stats": stats,
                "meta": meta,
                "cfg": cfg,
                "epoch": num_epochs,
            },
            best_ckpt,
        )

    import pandas as pd

    pd.DataFrame(logs).to_csv(
        os.path.join(outdir, "training_log.csv"), index=False
    )
    return {"best_val_loss": best_val_loss, "epochs_ran": len(logs), "seconds": elapsed}
