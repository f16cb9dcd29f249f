"""Generate + validate trajectories from a trained TrajEmbed checkpoint.

Behavior contract from the reference caller
(src/ananke_abm/cli/run_models/gen_n_val_traj.py:6-36): load ckpt ->
generate ``num_gen`` trajectories -> CRF/semi-CRF decode (Dmax cap) ->
segment-format activities CSV (consumed by the buffer-grid visualizer) ->
validation summary JSON vs a held-out activities CSV at
``eval_step_minutes`` resolution.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.models.gen_schedule.compare.utils import (
    segments_run_length_fast,
)
from ananke_abm_tpu.models.gen_schedule.evals.report import make_report
from ananke_abm_tpu.models.traj_syn.configs import TrajEmbedConfig
from ananke_abm_tpu.models.traj_syn.model import TrajEmbedVAE
from ananke_abm_tpu.ops.crf import viterbi_decode, viterbi_decode_no_all_home
from ananke_abm_tpu.ops.semi_crf import semicrf_decode
from ananke_abm_tpu.utils import load_checkpoint
from ananke_abm_tpu.utils.traj_fig.make_buffer_grid import make_buffer_grid

CHUNK = 512


def generate_trajectories(
    ckpt_path: str,
    num_gen: int,
    seed: int = 0,
    use_samples: bool = True,
    crf_mode: str | None = None,
    semi_Dmax_minutes: int | None = None,
    enforce_nonhome: bool = False,
):
    """Returns (Y (num_gen, L) int labels, meta dict)."""
    obj = load_checkpoint(ckpt_path)
    cfg = TrajEmbedConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in obj["cfg"].items()
    })
    meta = obj["meta"]
    purpose_map = meta["purpose_map"]
    P = len(purpose_map)
    L = meta["L"]

    model = TrajEmbedVAE(
        L=L, P=P, z_dim=cfg.z_dim, emb_dim=cfg.emb_dim,
        cnn_channels=cfg.cnn_channels, cnn_kernel=cfg.cnn_kernel,
        cnn_dropout=cfg.cnn_dropout,
    )
    params = jax.tree_util.tree_map(jnp.asarray, obj["params"])
    purpose_feats = jnp.asarray(obj["purpose_feats"])
    crf_params = obj.get("crf_params")
    mode = crf_mode or obj.get("crf_cfg", {}).get("crf_mode", "linear")
    Dmax_min = semi_Dmax_minutes or obj.get("crf_cfg", {}).get(
        "semi_Dmax_minutes", 300
    )
    Dmax_bins = max(1, Dmax_min // meta["grid_min"])

    @jax.jit
    def chunk_fn(rng):
        z = (
            jax.random.normal(rng, (CHUNK, cfg.z_dim))
            if use_samples
            else jnp.zeros((CHUNK, cfg.z_dim))
        )
        logits = model.apply(
            {"params": params}, z, purpose_feats,
            method=TrajEmbedVAE.decode,
        )
        if crf_params is None or mode == "none":
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        cp = jax.tree_util.tree_map(jnp.asarray, crf_params)
        if mode == "semi":
            dur = cp["dur"][:, :Dmax_bins]
            pad = Dmax_bins - dur.shape[1]
            if pad > 0:
                dur = jnp.pad(dur, ((0, 0), (0, pad)), constant_values=-1e9)
            # default False: checkpoints saved before exact_long existed
            # were trained with the self-transition diagonal masked out,
            # so decoding must not admit it
            allow_self = bool(
                obj.get("crf_cfg", {}).get("exact_long", False)
            )
            return semicrf_decode(logits, dur, cp["A"], allow_self=allow_self)
        u = logits + cp.get("bias", jnp.zeros(P))[None, None, :]
        if enforce_nonhome and "Home" in purpose_map:
            return viterbi_decode_no_all_home(
                u, cp["A"], purpose_map["Home"]
            )
        return viterbi_decode(u, cp["A"])

    key = jax.random.PRNGKey(seed)
    outs = []
    got = 0
    i = 0
    while got < num_gen:
        y = np.asarray(chunk_fn(jax.random.fold_in(key, i)))
        outs.append(y)
        got += y.shape[0]
        i += 1
    Y = np.concatenate(outs, axis=0)[:num_gen].astype(np.int64)
    return Y, meta


def write_segments_csv(Y, gen_csv, grid_min, inv_map):
    """Whole-population segment CSV in one native run-length pass +
    vectorized columns (the per-person decode_person_to_segments loop
    costs ~20 s of python at 100k gen). Same schema and row order as
    the reference sample.py segment writer. Returns the segmentation
    (person, purpose, length) for reuse."""
    import pandas as pd

    d = os.path.dirname(gen_csv)
    if d:
        os.makedirs(d, exist_ok=True)
    person, purpose, length = segments_run_length_fast(Y)
    # every row spans exactly T bins, so the global segment-length
    # cumsum at person p's first segment is p*T: within-row start bin
    # = (cumsum - length) - person*T
    start_bin = (np.cumsum(length) - length) - person * Y.shape[1]
    first_seg = np.flatnonzero(
        np.r_[True, person[1:] != person[:-1]]
    ) if person.size else np.zeros(0, np.int64)
    seg_per_person = np.diff(np.r_[first_seg, person.size])
    stopno = np.arange(person.size) - np.repeat(first_seg, seg_per_person)
    name_table = np.array(
        [inv_map.get(i, str(i)) for i in range(max(inv_map) + 1)],
        dtype=object,
    )
    pd.DataFrame(
        {
            "persid": np.char.add(
                "gen_", np.char.zfill(person.astype("U12"), 6)
            ),
            "stopno": stopno,
            "purpose": name_table[purpose],
            "starttime": start_bin * grid_min,
            "total_duration": length * grid_min,
        }
    ).to_csv(gen_csv, index=False)
    return person, purpose, length


def gen_n_val_traj(
    ckpt_path: str,
    num_gen: int,
    gen_csv: str,
    val_csv: str | None = None,
    eval_step_minutes: int = 5,
    crf_mode: str | None = None,
    semi_Dmax_minutes: int = 300,
    summary_json: str | None = None,
    use_samples: bool = True,
    seed: int = 0,
):
    """Generate -> write segment CSV -> validate -> summary JSON."""
    Y, meta = generate_trajectories(
        ckpt_path, num_gen, seed=seed, use_samples=use_samples,
        crf_mode=crf_mode, semi_Dmax_minutes=semi_Dmax_minutes,
    )
    inv_map = {v: k for k, v in meta["purpose_map"].items()}
    grid_min = meta["grid_min"]

    person, purpose, length = write_segments_csv(
        Y, gen_csv, grid_min, inv_map
    )

    summary = {
        "num_gen": int(num_gen),
        "ckpt": ckpt_path,
        "gen_csv": gen_csv,
        "crf_mode": crf_mode,
        "semi_Dmax_minutes": semi_Dmax_minutes,
        "use_samples": bool(use_samples),
    }

    if val_csv and os.path.exists(val_csv):
        # rasterize validation activities onto the SAME grid and compare
        Y_val, _, _ = make_buffer_grid(
            val_csv, grid_min=grid_min, horizon_min=meta["horizon_min"]
        )
        # evaluation can run at a coarser step: subsample both grids
        stride = max(1, eval_step_minutes // grid_min)
        report = make_report(
            Y[:, ::stride], Y_val[:, ::stride], meta["purpose_map"]
        )
        summary["validation"] = report

    # duration statistics of the generated population (segmentation
    # reused from the CSV write above)
    summary["generated_stats"] = {
        "mean_segments_per_person": float(len(purpose) / max(Y.shape[0], 1)),
        "max_segment_minutes": int(length.max() * grid_min) if length.size else 0,
        "mean_segment_minutes": float(length.mean() * grid_min) if length.size else 0.0,
    }

    if summary_json:
        d = os.path.dirname(summary_json)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(summary_json, "w", encoding="utf-8") as f:
            json.dump(summary, f, indent=2)
    return summary
