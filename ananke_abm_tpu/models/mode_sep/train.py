"""mode_sep training.

Loop parity with the reference (src/ananke_abm/models/mode_sep/train/
train.py:49-226): Adam + grad clip over the total objective, per-epoch
curves.csv append, best-by-loss checkpoint {params, config, Z}.

TPU-first restructuring: the union grid is built ONCE over the whole
dataset (the reference rebuilds it on the host every step) and moved to
device; a train step gathers a row-batch of persons from the resident
tensors and is a single jitted program. Batches therefore share one (B, T)
shape — no per-step host work, no recompiles.
"""
from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ananke_abm_tpu.models.mode_sep.batching import UnionBatch, build_union_batch
from ananke_abm_tpu.models.mode_sep.config import ModeSepConfig
from ananke_abm_tpu.models.mode_sep.data import load_trajectory_csvs
from ananke_abm_tpu.models.mode_sep.losses import total_loss
from ananke_abm_tpu.models.mode_sep.model import ModeSepModel
from ananke_abm_tpu.utils import ensure_dir, save_checkpoint

BATCH_FIELDS = (
    "is_gt", "y_union", "stay_loc_ids", "gt_interior", "stay_non_gt",
    "travel_mask", "prev_zone", "dest_zone", "progress",
    "home_idx", "work_idx", "traits",
)


def union_to_device(union: UnionBatch):
    batch = {f: jnp.asarray(getattr(union, f)) for f in BATCH_FIELDS}
    return jnp.asarray(union.times_union), batch


def _zero_nonfinite() -> optax.GradientTransformation:
    """Replace non-finite gradient values (nan AND +-inf) with zero.

    optax.zero_nans only handles nan; an inf leaf still drives the
    global norm to inf and clip_by_global_norm then multiplies every
    update by zero — silently freezing training forever."""

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),
            updates,
        ), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def make_train_step(model, optimizer, config, dist_mat, times, batch_size):
    @jax.jit
    def train_step(params, opt_state, full_batch, rows, rng):
        def loss_fn(params):
            b = {k: v[rows] for k, v in full_batch.items()}
            pred_emb, logits, v = model.apply(
                {"params": params},
                times,
                b["home_idx"],
                b["work_idx"],
                b["traits"],
                rngs={"sde": rng},
            )
            return total_loss(
                config, logits, pred_emb, v,
                params["class_table"], dist_mat, b,
            )

        (loss, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, comps

    return train_step


def train(
    periods_csv: str,
    snaps_csv: str,
    outdir: str,
    config: ModeSepConfig | None = None,
    zones_csv: str | None = None,
    persons_csv: str | None = None,
    dist_mat_csv: str | None = None,
    max_epochs: int | None = None,
):
    config = config or ModeSepConfig()
    if max_epochs is not None:
        config = dataclasses.replace(config, max_epochs=max_epochs)
    ensure_dir(outdir)

    people, shared = load_trajectory_csvs(
        periods_csv, snaps_csv, zones_csv, persons_csv, dist_mat_csv
    )
    union = build_union_batch(people, config.K_internal, config.time_match_tol)
    times, full_batch = union_to_device(union)
    dist_mat = jnp.asarray(shared.dist_mat)
    Z = shared.id_maps.Z
    n = len(people)
    bsz = min(config.batch_size, n)

    model = ModeSepModel(Z=Z, config=config)
    key = jax.random.PRNGKey(config.seed)
    params = model.init(
        {"params": key, "sde": key},
        times,
        full_batch["home_idx"][:bsz],
        full_batch["work_idx"][:bsz],
        full_batch["traits"][:bsz],
    )["params"]

    # Sanitize before the clip: a non-finite gradient (overflowing
    # squared-velocity penalty early in training) would otherwise make
    # the global norm inf/nan, scale every update to zero, and freeze
    # the run permanently — zeroing just the bad values lets the finite
    # components keep training.
    optimizer = optax.chain(
        _zero_nonfinite(),
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(config.lr, weight_decay=config.weight_decay),
    )
    opt_state = optimizer.init(params)
    train_step = make_train_step(
        model, optimizer, config, dist_mat, times, bsz
    )

    curves_path = os.path.join(outdir, "curves.csv")
    best_path = os.path.join(outdir, "best.ckpt")
    best_loss = np.inf
    wrote_header = False

    t0 = time.time()
    n_batches = max(1, n // bsz)
    for epoch in range(1, config.max_epochs + 1):
        ekey = jax.random.fold_in(key, epoch)
        perm = np.random.default_rng(config.seed + epoch).permutation(n)
        comps_acc = None
        for bi in range(n_batches):
            rows = jnp.asarray(perm[bi * bsz : bi * bsz + bsz])
            if rows.shape[0] < bsz:
                rows = jnp.concatenate([rows, rows[: bsz - rows.shape[0]]])
            params, opt_state, comps = train_step(
                params, opt_state, full_batch, rows,
                jax.random.fold_in(ekey, bi),
            )
            comps = jax.device_get(comps)
            comps_acc = (
                comps
                if comps_acc is None
                else {k: comps_acc[k] + comps[k] for k in comps}
            )
        comps_mean = {k: float(v) / n_batches for k, v in comps_acc.items()}

        with open(curves_path, "a", encoding="utf-8") as f:
            if not wrote_header and os.path.getsize(curves_path) == 0:
                f.write("epoch," + ",".join(comps_mean.keys()) + "\n")
                wrote_header = True
            f.write(
                f"{epoch},"
                + ",".join(f"{v:.6f}" for v in comps_mean.values())
                + "\n"
            )

        if comps_mean["loss"] < best_loss:
            best_loss = comps_mean["loss"]
            save_checkpoint(
                {
                    "params": params,
                    "config": dataclasses.asdict(config),
                    "Z": Z,
                    "zone_names": shared.zone_names,
                    "epoch": epoch,
                },
                best_path,
            )

    elapsed = time.time() - t0
    print(f"mode_sep training completed in {elapsed:.2f}s, best loss {best_loss:.4f}")
    return {"best_loss": best_loss, "seconds": elapsed, "ckpt": best_path}
