"""Freeze a trained VAE, dump (U logits, Y labels) pairs for CRF training.

Artifact parity with the reference prepare-crf-data
(src/ananke_abm/models/gen_schedule/models/crf/cli_prepare.py:10-92):
``crf_train.npz``/``crf_val.npz`` each holding U (N,T,P) float32 and
Y (N,T) int64, plus ``crf_meta.json`` (P, L, purpose_map, grid info,
home_idx, provenance).

The forward pass matches the reference's: a full VAE step on the labels
(encode -> reparameterized z -> decode), batched through one jit.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ananke_abm_tpu.models.gen_schedule.factory import build_model
from ananke_abm_tpu.utils import load_checkpoint


def prepare_crf_data(
    vae_ckpt: str,
    splits_path: str,
    outdir: str,
    batch_size: int = 1024,
    seed: int = 0,
):
    os.makedirs(outdir, exist_ok=True)
    obj = load_checkpoint(vae_ckpt)
    cfg, meta = obj["cfg"], obj["meta"]
    P, L = len(meta["purpose_map"]), meta["L"]

    model, pds_features = build_model(cfg, meta)
    params = jax.tree_util.tree_map(jnp.asarray, obj["params"])
    pds = jnp.asarray(pds_features) if pds_features is not None else None

    data_npz = cfg["data"]["npz"]
    Y_all = np.load(data_npz)["Y"].astype(np.int32)
    splits = np.load(splits_path)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def forward(params, batch, rng):
        logits, _, _ = model.apply(
            {"params": params},
            batch,
            rng,
            pds_features=pds,
            deterministic=True,
        )
        return logits

    def extract(Y):
        n = Y.shape[0]
        chunks_u = []
        for i, s in enumerate(range(0, n, batch_size)):
            batch = Y[s : s + batch_size]
            pad = batch_size - batch.shape[0]
            if pad:
                batch = np.concatenate([batch, batch[:1].repeat(pad, 0)], 0)
            u = forward(params, jnp.asarray(batch), jax.random.fold_in(key, i))
            chunks_u.append(np.asarray(u)[: batch_size - pad if pad else batch_size])
        return np.concatenate(chunks_u, axis=0), Y

    for tag, idx in (("train", splits["train_idx"]), ("val", splits["val_idx"])):
        U, Y = extract(Y_all[idx])
        np.savez_compressed(
            os.path.join(outdir, f"crf_{tag}.npz"),
            U=U.astype(np.float32),
            Y=Y.astype(np.int64),
        )

    purpose_map = meta["purpose_map"]
    if "Home" not in purpose_map:
        raise ValueError("Purpose map does not contain 'Home'.")
    meta_out = {
        "P": P,
        "L": L,
        "purpose_map": purpose_map,
        "grid_min": meta["grid_min"],
        "horizon_min": meta["horizon_min"],
        "vae_ckpt": vae_ckpt,
        "splits": splits_path,
        "home_idx": int(purpose_map["Home"]),
    }
    with open(os.path.join(outdir, "crf_meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta_out, f, indent=2)
    return meta_out
