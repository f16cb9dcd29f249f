"""ToD marginal curves per purpose across models (reference
compare/viz_metrics/ToD.py:34 — grayscale-safe markers/linestyles)."""
from __future__ import annotations

import os
from typing import Dict, List

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ananke_abm_tpu.models.gen_schedule.evals.metrics import tod_marginals

LINESTYLES = ["-", "--", "-.", ":"]
MARKERS = ["", "o", "s", "^", "d", "x"]


def plot_tod_curves(ref: Dict, models: List[Dict], outdir: str):
    os.makedirs(outdir, exist_ok=True)
    pm = ref["purpose_map"]
    P = len(pm)
    inv = {v: k for k, v in pm.items()}
    m_ref = tod_marginals(ref["Y"], P)
    all_m = [("ref", m_ref)] + [
        (m["name"], tod_marginals(m["Y"], P)) for m in models
    ]
    T = m_ref.shape[0]
    t = np.arange(T)
    for p in range(P):
        fig, ax = plt.subplots(figsize=(8, 4))
        for i, (name, mm) in enumerate(all_m):
            ax.plot(
                t, mm[:, p],
                linestyle=LINESTYLES[i % len(LINESTYLES)],
                marker=MARKERS[i % len(MARKERS)],
                markevery=max(1, T // 24),
                markersize=3,
                label=name,
            )
        ax.set_title(f"Time-of-day marginal: {inv[p]}")
        ax.set_xlabel("time bin")
        ax.set_ylabel("probability")
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(os.path.join(outdir, f"tod_{inv[p]}.png"), dpi=110)
        plt.close(fig)
