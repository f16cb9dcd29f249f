"""VISTA travel-survey cleaning: raw stops CSV -> activities CSV.

Library-code port of the reference's cleaning notebook
(src/ananke_abm/utils/clean_vista.ipynb — not importable code there),
reproducing its full behavioral contract, in notebook order:

1.  keep weighted rows (``wdstopwgt_sa3`` non-null when present);
2.  keep persons whose stop sequence includes stopno 1;
3.  keep home-bound persons only: first origin place and last destination
    place both "Accommodation" (notebook cell 5);
4.  group detailed purposes into {Home, Transit, Work, Education,
    Shopping, Social, Accompanying, Other} — "Change Mode" maps to
    Transit, which is folded away in step 11 (cells 7, 19-20);
5.  drop persons whose last stop is their only stop or is not Home
    (cell 8 — this runs *before* durations are computed);
6.  last stop's duration is refilled to run to the 1440-min day end;
    rows with negative duration are dropped (cell 9);
7.  activity duration = stop duration + travel time; a missing travel
    time propagates NaN and the person falls out at step 9 (cell 10);
8.  a stopno-0 Home activity covering [0, first start) is prepended,
    kept even when zero-length (cell 12);
9.  persons whose activity durations do not sum to exactly 1440 minutes
    are dropped (cells 15-16);
10. stopno is renumbered contiguously from 0 (cell 17);
11. Transit blocks are folded into the *following* activity: its start
    moves back to the first transit's start and its duration absorbs the
    whole block; trailing transit with no following activity is dropped
    (cell 20);
12. consecutive same-purpose activities are merged, summing durations
    (cell 21);
13. full-day (exactly 1440-min) activity rows are dropped, and persons
    left with fewer than two activities go with them (cells 23-24);
14. persons whose day does not both start and end at Home, or whose day
    is all-Home, are dropped (cells 25, 27).

Output columns: persid, hhid, stopno, purpose, startime, total_duration
— the reference's exact activities schema (``startime`` is the VISTA
spelling; the rasterizer accepts it, dataio/rasterize.py:200).

:func:`filter_vista_persons` and :func:`sample_population` cover the
notebook's person-attribute subset (cells 33-34) and the 0.1-0.9
fraction sampling outputs (cells 38-39).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

PURPOSE_GROUPS = {
    "At or Go Home": "Home",
    "Change Mode": "Transit",
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
PERSON_COLS = ["persid", "hhid", "age", "sex", "persinc", "nolicence",
               "fulltimework", "parttimework", "casualwork", "anywork",
               "studying", "worktype"]
OUT_COLS = ["persid", "hhid", "stopno", "purpose", "startime",
            "total_duration"]
DAY_END_MIN = 1440


def _fold_transit(df: pd.DataFrame) -> pd.DataFrame:
    """Fold each contiguous Transit block into the following activity
    (start moves back to the block start, duration absorbs the block);
    trailing Transit with no receiver is dropped. Vectorized equivalent
    of the notebook's per-person Python loop (cell 20)."""
    df = df.sort_values(["persid", "stopno"]).reset_index(drop=True)
    non_transit = df["purpose"].ne("Transit")
    # receiver id = number of non-transit rows at-or-after this row,
    # within the person (reverse cumulative count). Rows sharing an id
    # form {leading transit block, its receiving activity}.
    rid = non_transit[::-1].groupby(df["persid"][::-1]).cumsum()[::-1]
    rid.name = "_rid"
    keep = rid > 0  # rid == 0: trailing transit, no receiver
    df, rid = df[keep], rid[keep]
    out = (
        df.groupby(["persid", rid], sort=False)
        .agg(
            hhid=("hhid", "first"),
            purpose=("purpose", "last"),
            startime=("startime", "min"),
            total_duration=("total_duration", "sum"),
        )
        .reset_index()
        .sort_values(["persid", "startime"], kind="mergesort")
        .reset_index(drop=True)
    )
    out["stopno"] = out.groupby("persid").cumcount()
    return out[OUT_COLS]


def _fold_duplicates(df: pd.DataFrame) -> pd.DataFrame:
    """Merge consecutive same-purpose activities, summing durations
    (notebook cell 21), vectorized."""
    df = df.sort_values(["persid", "stopno"]).reset_index(drop=True)
    change = df["persid"].ne(df["persid"].shift()) | df["purpose"].ne(
        df["purpose"].shift()
    )
    block = change.cumsum()
    out = (
        df.groupby(block, sort=False)
        .agg(
            persid=("persid", "first"),
            hhid=("hhid", "first"),
            purpose=("purpose", "first"),
            startime=("startime", "first"),
            total_duration=("total_duration", "sum"),
        )
        .reset_index(drop=True)
    )
    out["stopno"] = out.groupby("persid").cumcount()
    return out[OUT_COLS]


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
    if "hhid" not in df.columns:
        df["hhid"] = ""

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
    df = df.sort_values(["persid", "stopno"]).reset_index(drop=True)

    # drop persons whose last stop is their only stop or is not Home
    # (notebook cell 8 — runs before durations are computed)
    last = df.groupby("persid").tail(1)
    bad = last[(last["stopno"] == 1) | (last["purpose"] != "Home")]["persid"]
    df = df[~df["persid"].isin(bad)]

    # last stop: duration runs to the end of the day
    is_last = df.groupby("persid")["stopno"].transform("max") == df["stopno"]
    df.loc[is_last, "duration"] = np.nan
    df["duration"] = df["duration"].fillna(DAY_END_MIN - df["arrtime"])
    df = df[df["duration"] >= 0]

    # activity duration includes its leading travel time; NaN travtime
    # propagates so the person is dropped by the day-sum filter below
    df["total_duration"] = df["duration"] + df["travtime"]
    df = df[["persid", "hhid", "stopno", "purpose", "startime", "total_duration"]]

    # prepend a stopno-0 Home activity covering [0, first starttime),
    # kept even when zero-length (notebook cell 12)
    first = df[df.groupby("persid")["stopno"].transform("min") == df["stopno"]]
    zero = first.copy()
    zero["stopno"] = 0
    zero["purpose"] = "Home"
    zero["total_duration"] = zero["startime"]
    zero["startime"] = 0
    df = pd.concat([zero, df], ignore_index=True)
    df = df.sort_values(["persid", "stopno"]).reset_index(drop=True)

    # persons whose activities don't tile the full day exactly are out
    sums = df.groupby("persid")["total_duration"].sum()
    has_nan = df["total_duration"].isna().groupby(df["persid"]).any()
    keep = sums.index[(sums == DAY_END_MIN) & ~has_nan]
    df = df[df["persid"].isin(keep)]

    # contiguous stopno from 0
    df["stopno"] = df.groupby("persid").cumcount()

    df = _fold_transit(df)
    df = _fold_duplicates(df)

    # full-day single-activity rows go, and so do persons left with < 2
    # activities (notebook cells 23-24)
    df = df[df["total_duration"] != DAY_END_MIN]
    df = df[df.groupby("persid")["stopno"].transform("size") > 1]

    # day must start and end at Home, and not be all-Home
    is_home = df["purpose"].eq("Home")
    first_home = df.groupby("persid")["purpose"].transform("first").eq("Home")
    last_home = df.groupby("persid")["purpose"].transform("last").eq("Home")
    all_home = is_home.groupby(df["persid"]).transform("all")
    df = df[first_home & last_home & ~all_home]

    df = df.reset_index(drop=True)
    return df[OUT_COLS].astype(
        {"startime": np.int64, "total_duration": np.int64}, errors="ignore"
    )


def filter_vista_persons(
    persons: pd.DataFrame, activities: pd.DataFrame
) -> pd.DataFrame:
    """Person-attribute subset for the cleaned population (cells 33-34):
    the notebook's chosen columns (those present), restricted to persons
    that survived cleaning."""
    cols = [c for c in PERSON_COLS if c in persons.columns]
    out = persons[cols]
    return out[out["persid"].isin(activities["persid"])].reset_index(drop=True)


def sample_population(
    persons: pd.DataFrame,
    activities: pd.DataFrame,
    frac: float,
    random_state: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Fraction-sample persons and their activities (cells 38-39)."""
    samp_persons = persons.sample(frac=frac, random_state=random_state)
    samp_acts = activities[activities["persid"].isin(samp_persons["persid"])]
    return samp_persons.reset_index(drop=True), samp_acts.reset_index(drop=True)


def clean_vista_csv(
    stops_csv: str,
    out_csv: str | None = None,
    persons_csv: str | None = None,
    persons_out_csv: str | None = None,
) -> pd.DataFrame:
    df = clean_vista_stops(pd.read_csv(stops_csv))
    if out_csv:
        import os

        d = os.path.dirname(out_csv)
        if d:
            os.makedirs(d, exist_ok=True)
        df.to_csv(out_csv, index=False)
    if persons_csv and persons_out_csv:
        persons = filter_vista_persons(pd.read_csv(persons_csv), df)
        persons.to_csv(persons_out_csv, index=False)
    return df
