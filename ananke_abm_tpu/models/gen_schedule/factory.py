"""Model factory: cfg + dataset meta -> ScheduleVAE instance (+ PDS features).

Parity with the reference factory
(src/ananke_abm/models/gen_schedule/models/factory.py:6-68):
``cfg["model"]["method"]`` in {"baseline_cnn", "baseline_rnn", "auto_pds"};
auto_pds loads ``pds_path`` npz and stacks (m_tod, start_rate) into a fixed
(P, T, 2) feature tensor.
"""
from __future__ import annotations

import numpy as np

from ananke_abm_tpu.models.gen_schedule.vae import ScheduleVAE


def build_model(cfg: dict, meta: dict):
    """Returns (model, pds_features_or_None)."""
    method = cfg["model"]["method"]
    L = meta["L"]
    P = len(meta["purpose_map"])
    z_dim = cfg["model"]["z_dim"]
    emb_dim = cfg["model"]["emb_dim"]

    if method == "baseline_cnn":
        model = ScheduleVAE(
            L=L,
            P=P,
            z_dim=z_dim,
            emb_dim=emb_dim,
            encoder_kind="cnn",
            cnn_channels=tuple(cfg["model"].get("cnn_channels", [64, 64])),
            cnn_kernel=cfg["model"].get("cnn_kernel", 5),
            cnn_dropout=cfg["model"].get("cnn_dropout", 0.1),
            cnn_norm=cfg["model"].get("cnn_norm", "group"),
        )
        return model, None

    if method == "baseline_rnn":
        model = ScheduleVAE(
            L=L,
            P=P,
            z_dim=z_dim,
            emb_dim=emb_dim,
            encoder_kind="rnn",
            rnn_hidden_dim=cfg["model"].get("rnn_hidden_dim", 64),
            use_emb_layernorm=cfg["model"].get("use_emb_layernorm", False),
            rnn_cell=cfg["model"].get("rnn_cell", "gru"),
        )
        return model, None

    if method == "auto_pds":
        pds_npz = np.load(cfg["model"]["pds_path"])
        m_tod = pds_npz["m_tod"].astype(np.float32)  # (P, T)
        start_rate = pds_npz["start_rate"].astype(np.float32)  # (P, T)
        pds_features = np.stack([m_tod, start_rate], axis=-1)  # (P, T, 2)
        model = ScheduleVAE(
            L=L,
            P=P,
            z_dim=z_dim,
            emb_dim=emb_dim,
            encoder_kind="cnn",
            cnn_channels=tuple(cfg["model"].get("cnn_channels", [64, 64])),
            cnn_kernel=cfg["model"].get("cnn_kernel", 5),
            cnn_dropout=cfg["model"].get("cnn_dropout", 0.1),
            cnn_norm=cfg["model"].get("cnn_norm", "group"),
            use_pds=True,
        )
        return model, pds_features

    raise ValueError(f"Unknown model.method {method!r}")
