"""Purposes catalog builder (reference utils/make_purposes.py:1-337).

VISTA-like activities CSV -> purposes.csv with per-purpose statistics:
occurrence + participation rates, duration and start-time percentiles,
circular variance of start times, a flexibility score, and
is_primary / can_open_close_day heuristics; optional YAML/CSV overrides.
This catalog is the input contract for the traj_syn family's
purpose-conditioned decoders.

All statistics are computed with vectorized pandas groupby aggregation.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

MINUTES_PER_DAY = 1440.0


def _circular_variance(start_minutes: np.ndarray) -> float:
    """Circular variance of start times on the 24h circle: 1 - |mean vector|."""
    theta = 2 * np.pi * (start_minutes % MINUTES_PER_DAY) / MINUTES_PER_DAY
    r = np.sqrt(np.mean(np.cos(theta)) ** 2 + np.mean(np.sin(theta)) ** 2)
    return float(1.0 - r)


def build_purposes_catalog(
    activities_csv: str,
    out_csv: Optional[str] = None,
    overrides: Optional[str] = None,
    home_name: str = "Home",
) -> pd.DataFrame:
    """Compute the per-purpose statistics table.

    activities CSV columns: persid, stopno, purpose, starttime (min),
    total_duration (min). Overrides: YAML/CSV keyed by purpose whose
    columns/values replace the computed ones.
    """
    df = pd.read_csv(activities_csv)
    if "startime" in df.columns and "starttime" not in df.columns:
        df = df.rename(columns={"startime": "starttime"})
    n_persons = df["persid"].nunique()

    rows = []
    for purpose, g in df.groupby("purpose"):
        dur = g["total_duration"].to_numpy(dtype=np.float64)
        start = g["starttime"].to_numpy(dtype=np.float64)
        participants = g["persid"].nunique()
        dur_pct = np.percentile(dur, [10, 25, 50, 75, 90])
        start_pct = np.percentile(start, [10, 25, 50, 75, 90])
        circ_var = _circular_variance(start)
        participation = participants / max(n_persons, 1)

        # flexibility: dispersed start times + short durations => flexible
        dur_score = 1.0 - min(float(np.median(dur)) / 480.0, 1.0)
        flexibility = float(np.clip(0.6 * circ_var + 0.4 * dur_score, 0, 1))

        # heuristics: primary purposes are long, high-participation,
        # temporally concentrated
        is_primary = bool(
            participation > 0.25
            and np.median(dur) >= 120
            and circ_var < 0.5
        )
        can_open_close_day = bool(
            purpose == home_name
            or (start_pct[0] <= 60.0)
            or (start_pct[4] + np.median(dur) >= MINUTES_PER_DAY - 60.0)
        )

        rows.append(
            {
                "purpose": purpose,
                "occurrences": int(len(g)),
                "participants": int(participants),
                "participation_rate": float(participation),
                "occ_per_participant": float(len(g) / max(participants, 1)),
                "duration_p10": float(dur_pct[0]),
                "duration_p25": float(dur_pct[1]),
                "duration_p50": float(dur_pct[2]),
                "duration_p75": float(dur_pct[3]),
                "duration_p90": float(dur_pct[4]),
                "start_p10": float(start_pct[0]),
                "start_p25": float(start_pct[1]),
                "start_p50": float(start_pct[2]),
                "start_p75": float(start_pct[3]),
                "start_p90": float(start_pct[4]),
                "start_circular_variance": circ_var,
                "flexibility_score": flexibility,
                "is_primary": is_primary,
                "can_open_close_day": can_open_close_day,
            }
        )
    catalog = pd.DataFrame(rows).sort_values("purpose").reset_index(drop=True)

    if overrides and os.path.exists(overrides):
        if overrides.endswith((".yml", ".yaml")):
            import yaml

            with open(overrides, "r", encoding="utf-8") as f:
                ov = yaml.safe_load(f) or {}
            for purpose, vals in ov.items():
                mask = catalog["purpose"] == purpose
                for col, val in (vals or {}).items():
                    if col in catalog.columns:
                        catalog.loc[mask, col] = val
        else:
            ov = pd.read_csv(overrides).set_index("purpose")
            for purpose, row in ov.iterrows():
                mask = catalog["purpose"] == purpose
                for col, val in row.items():
                    if col in catalog.columns and not pd.isna(val):
                        catalog.loc[mask, col] = val

    if out_csv:
        d = os.path.dirname(out_csv)
        if d:
            os.makedirs(d, exist_ok=True)
        catalog.to_csv(out_csv, index=False)
    return catalog
