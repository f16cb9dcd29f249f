"""mode_sep inference: rollout on a dense grid + predictions at GT snaps.

Parity with the reference inference
(src/ananke_abm/models/mode_sep/inference/inference.py:32-110): per-person
predictions CSV at GT snap times (gt/pred zone, distance, match) and a
dense [0,24]h x ``dense_resolution`` rollout for plots/eval. Here all
persons roll out in one batched jitted program over the shared dense grid.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ananke_abm_tpu.models.mode_sep.batching import build_union_batch
from ananke_abm_tpu.models.mode_sep.config import ModeSepConfig
from ananke_abm_tpu.models.mode_sep.data import load_trajectory_csvs
from ananke_abm_tpu.models.mode_sep.model import ModeSepModel
from ananke_abm_tpu.utils import load_checkpoint


def _cfg_from_dict(d: dict) -> ModeSepConfig:
    fields = {f.name for f in dataclasses.fields(ModeSepConfig)}
    return ModeSepConfig(**{k: v for k, v in d.items() if k in fields})


def load_model(ckpt_path: str):
    obj = load_checkpoint(ckpt_path)
    config = _cfg_from_dict(obj["config"])
    model = ModeSepModel(Z=obj["Z"], config=config)
    params = jax.tree_util.tree_map(jnp.asarray, obj["params"])
    return model, params, config, obj


def rollout(model, params, config, times, home_idx, work_idx, traits, rng=None):
    """Batched forward: returns (pred_emb, logits, v) as numpy."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    pred_emb, logits, v = jax.jit(
        lambda t, h, w, tr: model.apply(
            {"params": params}, t, h, w, tr, rngs={"sde": rng}
        )
    )(
        jnp.asarray(times),
        jnp.asarray(home_idx),
        jnp.asarray(work_idx),
        jnp.asarray(traits),
    )
    return np.asarray(pred_emb), np.asarray(logits), np.asarray(v)


def run_inference(
    ckpt_path: str,
    periods_csv: str,
    snaps_csv: str,
    outdir: str,
    zones_csv: str | None = None,
    persons_csv: str | None = None,
    dist_mat_csv: str | None = None,
):
    os.makedirs(outdir, exist_ok=True)
    model, params, config, obj = load_model(ckpt_path)
    people, shared = load_trajectory_csvs(
        periods_csv, snaps_csv, zones_csv, persons_csv, dist_mat_csv
    )
    union = build_union_batch(people, config.K_internal, config.time_match_tol)

    # predictions at union GT snaps
    _, logits, v = rollout(
        model, params, config,
        union.times_union, union.home_idx, union.work_idx, union.traits,
    )
    pred = logits.argmax(-1)  # (B, T)

    rows = []
    for i, p in enumerate(people):
        gt_pos = np.nonzero(union.is_gt[i])[0]
        for j in gt_pos:
            gt_z = int(union.y_union[i, j])
            pd_z = int(pred[i, j])
            rows.append(
                {
                    "person_id": p.person_id,
                    "time": float(union.times_union[j]),
                    "gt_zone": shared.zone_names[gt_z],
                    "pred_zone": shared.zone_names[pd_z],
                    "distance_km": float(shared.dist_mat[gt_z, pd_z]),
                    "match": int(gt_z == pd_z),
                }
            )
    pred_df = pd.DataFrame(rows)
    pred_df.to_csv(os.path.join(outdir, "predictions.csv"), index=False)

    # dense rollout for plots/eval
    dense_times = np.linspace(0.0, 24.0, config.dense_resolution).astype(
        np.float32
    )
    emb_d, logits_d, v_d = rollout(
        model, params, config,
        dense_times, union.home_idx, union.work_idx, union.traits,
    )
    np.savez_compressed(
        os.path.join(outdir, "dense_rollout.npz"),
        times=dense_times,
        logits=logits_d,
        velocity=v_d,
        pred_emb=emb_d,
        person_ids=np.array([p.person_id for p in people]),
    )

    # per-person trajectory PNGs (reference inference.py writes these too)
    try:
        from ananke_abm_tpu.models.mode_sep.viz import plot_person_trajectory

        table = np.asarray(params["class_table"])
        for i, p in enumerate(people):
            v_abs = np.linalg.norm(v_d[i], axis=-1)
            emb_dist = np.linalg.norm(
                emb_d[i][:, None, :] - table[None, :, :], axis=-1
            ).min(-1)
            plot_person_trajectory(
                dense_times,
                logits_d[i].argmax(-1),
                shared.zone_names,
                os.path.join(outdir, f"trajectory_{p.person_name}.png"),
                v_abs=v_abs,
                emb_dist=emb_dist,
                stay_intervals=p.stay_segments,
                tau_stay=config.tau_stay_embed,
                v_band=(config.v_min_move, config.v_max_move),
                title=f"{p.person_name} dense rollout",
            )
    except ImportError as e:
        import warnings

        warnings.warn(f"trajectory plots skipped (matplotlib missing): {e}")
    return pred_df
