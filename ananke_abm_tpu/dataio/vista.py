"""VISTA travel-survey cleaning: raw stops CSV -> activities CSV.

Library-code port of the reference's cleaning notebook
(src/ananke_abm/utils/clean_vista.ipynb — not importable code there), with
the same behavioral contract:

1. keep weighted rows (``wdstopwgt_sa3`` non-null when present);
2. keep persons whose stop sequence starts at stopno 1;
3. keep home-bound persons only: first origin place and last destination
   place both "Accommodation";
4. group detailed purposes into the canonical 7 (Home, Work, Education,
   Shopping, Social, Accompanying, Other; "Change Mode" -> Transit rows
   are treated as Other unless kept);
5. last stop's missing duration is filled to the 1440-min day end;
6. activity duration = stop duration + travel time; negatives dropped;
7. a stopno-0 Home activity covering [0, first start) is prepended;
8. persons whose last activity is not Home are dropped.

Output columns: persid, stopno, purpose, starttime, total_duration —
exactly the rasterizer's input contract.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

PURPOSE_GROUPS = {
    "At or Go Home": "Home",
    "Change Mode": "Other",
    "Work Related": "Work",
    "Education": "Education",
    "Buy Something": "Shopping",
    "Personal Business": "Shopping",
    "Pick-up or Deliver Something": "Shopping",
    "Social": "Social",
    "Recreational": "Social",
    "Pick-up or Drop-off Someone": "Accompanying",
    "Accompany Someone": "Accompanying",
    "Other Purpose": "Other",
    "Not Stated": "Other",
    "Unknown Purpose": "Other",
}

REQUIRED = ["persid", "stopno", "destpurp1", "startime", "arrtime",
            "duration", "travtime"]
DAY_END_MIN = 1440


def clean_vista_stops(
    stops: pd.DataFrame,
    home_place: str = "Accommodation",
    purpose_groups: dict | None = None,
) -> pd.DataFrame:
    """Clean a raw VISTA stops frame into the activities contract."""
    pg = purpose_groups or PURPOSE_GROUPS
    df = stops.copy()

    if "wdstopwgt_sa3" in df.columns:
        df = df[df["wdstopwgt_sa3"].notna()]
    missing = [c for c in REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(f"VISTA stops missing columns: {missing}")

    # persons must start at stopno 1
    has_first = df.groupby("persid")["stopno"].min().eq(1)
    df = df[df["persid"].isin(has_first[has_first].index)]

    # home-bound persons: first orig and last dest are Accommodation
    if {"origplace1", "destplace1"} <= set(df.columns):
        fl = (
            df.sort_values("stopno")
            .groupby("persid")
            .agg(first_orig=("origplace1", "first"), last_dest=("destplace1", "last"))
        )
        keep = fl[(fl.first_orig == home_place) & (fl.last_dest == home_place)].index
        df = df[df["persid"].isin(keep)]

    df["purpose"] = df["destpurp1"].map(pg).fillna("Other")

    # last stop: duration runs to the end of the day
    df = df.sort_values(["persid", "stopno"]).reset_index(drop=True)
    is_last = df.groupby("persid")["stopno"].transform("max") == df["stopno"]
    df.loc[is_last, "duration"] = np.nan
    df["duration"] = df["duration"].fillna(DAY_END_MIN - df["arrtime"])

    df["travtime"] = df["travtime"].fillna(0.0)
    df["total_duration"] = df["duration"] + df["travtime"]
    df = df[df["total_duration"] >= 0]
    df = df.rename(columns={"startime": "starttime"})

    # drop persons whose last activity isn't Home
    last_purp = df.sort_values("stopno").groupby("persid")["purpose"].last()
    df = df[df["persid"].isin(last_purp[last_purp == "Home"].index)]

    # prepend stopno-0 Home activity covering [0, first starttime)
    first = df[df.groupby("persid")["stopno"].transform("min") == df["stopno"]]
    zero = first.copy()
    zero["stopno"] = 0
    zero["purpose"] = "Home"
    zero["total_duration"] = zero["starttime"]
    zero["starttime"] = 0
    zero = zero[zero["total_duration"] > 0]

    out = pd.concat([zero, df], ignore_index=True)
    out = out.sort_values(["persid", "stopno"]).reset_index(drop=True)
    return out[["persid", "stopno", "purpose", "starttime", "total_duration"]].astype(
        {"starttime": np.int64, "total_duration": np.int64}, errors="ignore"
    )


def clean_vista_csv(stops_csv: str, out_csv: str | None = None) -> pd.DataFrame:
    df = clean_vista_stops(pd.read_csv(stops_csv))
    if out_csv:
        import os

        d = os.path.dirname(out_csv)
        if d:
            os.makedirs(d, exist_ok=True)
        df.to_csv(out_csv, index=False)
    return df
