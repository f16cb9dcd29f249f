"""Population sampling from a trained schedule VAE.

Artifact parity with the reference sample pipeline
(src/ananke_abm/models/gen_schedule/pipeline/sample.py:60-310):
``<prefix>.npz`` {Y_generated (N,T) int64, U_mean_logits (T,P) f32,
U_std_logits (T,P) f32, Z_stats (2, z_dim) f32}, ``<prefix>_meta.json``
(same keys), ``<prefix>_preview.csv`` (persid, stopno, purpose, starttime,
total_duration segments).

TPU-first design:
- each chunk (z ~ N(0,I) -> decode -> argmax/CRF-Viterbi -> all-home mask
  -> per-chunk masked count/mean/M2 and latent sums) is ONE fixed-shape
  jitted program; rejection never changes device shapes.
- running logits statistics merge chunk summaries with Chan's parallel
  Welford update on the host — the reference updates Welford one
  individual at a time in Python (sample.py:137-158).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.models.gen_schedule.crf.model import crf_decode
from ananke_abm_tpu.models.gen_schedule.factory import build_model
from ananke_abm_tpu.utils import load_checkpoint

DEFAULT_CHUNK = 1024


def decode_person_to_segments(seq_row, person_id, grid_minutes, inv_map):
    """One generated timeline -> activity segments (host-side, preview only).

    Same segment schema as reference sample.py:13-57.
    """
    seq = np.asarray(seq_row)
    change = np.nonzero(np.diff(seq))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(seq)]])
    return [
        {
            "persid": person_id,
            "stopno": i,
            "purpose": inv_map[int(seq[s])],
            "starttime": int(s * grid_minutes),
            "total_duration": int((e - s) * grid_minutes),
        }
        for i, (s, e) in enumerate(zip(starts, ends))
    ]


def _merge_welford(count, mean, m2, c_count, c_mean, c_m2):
    """Chan et al. parallel combine of (count, mean, M2) summaries."""
    if c_count == 0:
        return count, mean, m2
    if count == 0:
        return c_count, c_mean, c_m2
    delta = c_mean - mean
    tot = count + c_count
    new_mean = mean + delta * (c_count / tot)
    new_m2 = m2 + c_m2 + delta * delta * (count * c_count / tot)
    return tot, new_mean, new_m2


def sample(
    ckpt_path: str,
    num_samples: int,
    outprefix: str,
    seed: int = 123,
    csv_max_persons: int = 200,
    decode_mode: str = "argmax",
    crf_path: str | None = None,
    enforce_nonhome: bool = False,
    reject_all_home: bool = False,
    chunk_size: int | None = None,
    mesh=None,
):
    """``mesh``: optional (agents x zones) Mesh — each chunk's batch axis
    shards over the agent axis (params replicated, GSPMD collectives for
    the summary reductions); the chunk size rounds up to a multiple of the
    agent-axis size so shards stay even."""
    obj = load_checkpoint(ckpt_path)
    cfg, meta = obj["cfg"], obj["meta"]
    purpose_map = meta["purpose_map"]
    inv_map = {v: k for k, v in purpose_map.items()}
    names_ordered = [inv_map[i] for i in range(len(inv_map))]
    grid_min = meta["grid_min"]
    horizon_min = meta["horizon_min"]
    T = meta["L"]
    z_dim = cfg["model"]["z_dim"]
    P = len(purpose_map)
    home_idx = purpose_map.get("Home")

    # adaptive chunking: large requests use bigger device batches so the
    # host loop dispatches ~100x fewer programs (the reference fixes 1024)
    if chunk_size is None:
        chunk_size = DEFAULT_CHUNK if num_samples <= 16384 else 8192
    CHUNK = int(chunk_size)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P_

        from ananke_abm_tpu.parallel.mesh import AGENT_AXIS

        n_agent_devices = dict(
            zip(mesh.axis_names, mesh.devices.shape)
        )[AGENT_AXIS]
        CHUNK = -(-CHUNK // n_agent_devices) * n_agent_devices

        def shard_rows(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P_(AGENT_AXIS))
            )
    else:
        def shard_rows(x):
            return x

    t0 = time.time()
    model, pds_features = build_model(cfg, meta)
    params = jax.tree_util.tree_map(jnp.asarray, obj["params"])
    pds = jnp.asarray(pds_features) if pds_features is not None else None

    crf_params = None
    if decode_mode == "crf":
        if not crf_path:
            raise ValueError("decode_mode='crf' requires crf_path")
        crf_obj = load_checkpoint(crf_path)
        crf_home = crf_obj.get("home_idx")
        if crf_home != home_idx:
            raise AssertionError(
                f"CRF home_idx {crf_home} != VAE home_idx {home_idx}"
            )
        crf_params = jax.tree_util.tree_map(jnp.asarray, crf_obj["params"])
    elif decode_mode != "argmax":
        raise ValueError(f"Unknown decode_mode: {decode_mode}")

    @jax.jit
    def chunk_fn(params, crf_params, rng):
        z = shard_rows(jax.random.normal(rng, (CHUNK, z_dim)))
        u = model.apply(
            {"params": params}, z, pds, method=lambda m, z, p: m.decode(z, p)
        )  # (CHUNK, T, P)
        if decode_mode == "crf":
            y = crf_decode(
                crf_params, u, home_idx=home_idx, enforce_nonhome=enforce_nonhome
            )
        else:
            y = jnp.argmax(u, axis=-1).astype(jnp.int32)

        if reject_all_home and home_idx is not None:
            keep = (y != home_idx).any(axis=1)
        else:
            keep = jnp.ones((CHUNK,), bool)

        # chunk summaries in f32 on device; the cross-chunk Welford merge
        # accumulates in f64 on the host
        w = keep.astype(jnp.float32)
        cnt = jnp.sum(w)
        mean = jnp.einsum("b,btp->tp", w, u) / jnp.maximum(cnt, 1.0)
        m2 = jnp.einsum("b,btp->tp", w, (u - mean[None]) ** 2)
        z_sum = (z * w[:, None]).sum(axis=0)
        z_sq = (z**2 * w[:, None]).sum(axis=0)
        return y, keep, cnt, mean, m2, z_sum, z_sq

    key = jax.random.PRNGKey(seed)
    accepted = []
    W_count, W_mean, W_m2 = 0, np.zeros((T, P)), np.zeros((T, P))
    z_sum = np.zeros(z_dim)
    z_sq = np.zeros(z_dim)
    z_n = 0
    remaining = num_samples
    it = 0
    while remaining > 0:
        y, keep, cnt, mean, m2, zs, zq = chunk_fn(
            params, crf_params, jax.random.fold_in(key, it)
        )
        it += 1
        keep_np = np.asarray(keep)
        n_keep = int(keep_np.sum())
        if n_keep == 0:
            continue
        y_keep = np.asarray(y)[keep_np]
        take = min(n_keep, remaining)
        accepted.append(y_keep[:take].astype(np.int64))

        # merge full-chunk stats (reference also folds in the capped tail's
        # stats chunk-wise; acceptance stats use all accepted in the chunk)
        W_count, W_mean, W_m2 = _merge_welford(
            W_count, W_mean, W_m2, int(cnt), np.asarray(mean), np.asarray(m2)
        )
        z_sum += np.asarray(zs)
        z_sq += np.asarray(zq)
        z_n += n_keep
        remaining -= take

    Y_gen = np.concatenate(accepted, axis=0)[:num_samples]

    if W_count > 1:
        U_mean = W_mean
        U_std = np.sqrt(np.maximum(W_m2 / (W_count - 1), 0.0))
    else:
        U_mean = W_mean if W_count else np.zeros((T, P))
        U_std = np.zeros((T, P))

    z_mean = z_sum / max(1, z_n)
    z_var = z_sq / max(1, z_n) - z_mean**2
    Z_stats = np.stack(
        [z_mean, np.sqrt(np.maximum(z_var, 1e-12))], axis=0
    ).astype(np.float32)

    elapsed = time.time() - t0
    print(f"[sample:{decode_mode}] Sampling completed in {elapsed:.2f} seconds.")

    d = os.path.dirname(outprefix)
    if d:
        os.makedirs(d, exist_ok=True)

    # preview CSV
    import csv

    rows = []
    for i in range(min(csv_max_persons, Y_gen.shape[0])):
        rows.extend(
            decode_person_to_segments(
                Y_gen[i], f"gen_{i:06d}", grid_min, inv_map
            )
        )
    with open(f"{outprefix}_preview.csv", "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(
            f,
            fieldnames=["persid", "stopno", "purpose", "starttime", "total_duration"],
        )
        w.writeheader()
        w.writerows(rows)

    np.savez_compressed(
        f"{outprefix}.npz",
        Y_generated=Y_gen.astype(np.int64),
        U_mean_logits=U_mean.astype(np.float32),
        U_std_logits=U_std.astype(np.float32),
        Z_stats=Z_stats,
    )

    meta_out = {
        "purpose_map": purpose_map,
        "purpose_names_ordered": names_ordered,
        "grid_min": grid_min,
        "horizon_min": horizon_min,
        "num_time_bins": T,
        "latent_dim": z_dim,
        "num_samples": int(num_samples),
        "seed": int(seed),
        "vae_ckpt": ckpt_path,
        "decode_mode": decode_mode,
        "crf_path": crf_path,
        "pds_method": cfg["model"].get("method", "auto_pds"),
        "reject_all_home": bool(reject_all_home),
    }
    with open(f"{outprefix}_meta.json", "w", encoding="utf-8") as f:
        json.dump(meta_out, f, indent=2)
    return {"seconds": elapsed, "generated": int(Y_gen.shape[0])}
