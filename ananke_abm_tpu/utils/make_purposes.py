"""Purposes catalog builder (reference utils/make_purposes.py:1-337).

VISTA-like activities CSV -> purposes.csv with the reference's exact
output schema (one row per distinct purpose label):

    purpose, is_primary (1/0), can_open_close_day (1/0),
    person_day_participation_rate, skip_probability,
    n_occurrences, n_person_days_with_purpose,
    mean/median/p10/p90/iqr/std duration (min), duration_cv,
    mean/median/p10/p90/std start (min), start_circ_var,
    flexibility, notes

plus any extra override columns. This catalog is the input contract for
the traj_syn family's purpose-conditioned (FiLM) decoders.

Reference semantics kept: configurable column names with case-insensitive
alias fallbacks; Title-Case purpose normalization; person-day
participation (pseudo-day when no day column; optional persons CSV to
widen the denominator); circular start variance on a configurable
horizon; flexibility = 0.6 * minmax(start_circ_var) + 0.4 *
minmax(duration_cv) across purposes; is_primary / can_open_close_day
heuristics with YAML/CSV overrides (is_primary, can_open_close_day,
notes, extra columns passthrough); sort by participation desc then
purpose.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

MINUTES_PER_DAY = 1440.0

LEAD_COLUMNS = [
    "purpose",
    "is_primary",
    "can_open_close_day",
    "person_day_participation_rate",
    "skip_probability",
    "n_occurrences",
    "n_person_days_with_purpose",
    "mean_duration_min", "median_duration_min", "p10_duration_min",
    "p90_duration_min", "iqr_duration_min", "std_duration_min",
    "duration_cv",
    "mean_start_min", "median_start_min", "p10_start_min", "p90_start_min",
    "std_start_min", "start_circ_var",
    "flexibility",
    "notes",
]

_PRIMARY_DEFAULTS = {"home", "work", "education", "school", "uni",
                     "university"}


def _safe_col(df: pd.DataFrame, preferred: str, fallbacks: list) -> str:
    """Existing column matching ``preferred`` or a fallback, case-insensitive."""
    lower = {c.lower(): c for c in df.columns}
    if preferred and preferred.lower() in lower:
        return lower[preferred.lower()]
    for name in fallbacks:
        if name.lower() in lower:
            return lower[name.lower()]
    raise KeyError(
        f"Could not find any of columns {[preferred, *fallbacks]} in CSV. "
        f"Available: {list(df.columns)}"
    )


def _circular_variance(start_minutes: np.ndarray, period: float) -> float:
    """Circular variance in [0, 1] on a ``period``-minute circle."""
    if start_minutes.size == 0:
        return float("nan")
    theta = 2 * np.pi * (start_minutes % period) / period
    r = np.sqrt(np.mean(np.cos(theta)) ** 2 + np.mean(np.sin(theta)) ** 2)
    return float(1.0 - r)


def _cv(x: np.ndarray) -> float:
    """Coefficient of variation std(ddof=1)/mean; NaN when mean ~ 0."""
    if x.size == 0:
        return float("nan")
    m = float(np.mean(x))
    s = float(np.std(x, ddof=1)) if x.size > 1 else 0.0
    return float("nan") if abs(m) < 1e-9 else s / m


def _minmax01(x: pd.Series) -> pd.Series:
    if x.isna().all():
        return x
    mn, mx = x.min(), x.max()
    if pd.isna(mn) or pd.isna(mx) or abs(mx - mn) < 1e-12:
        return pd.Series(0.5, index=x.index)  # constant -> mid
    return (x - mn) / (mx - mn)


def _boolify(v):
    if v is None:
        return None
    s = str(v).strip().lower()
    if s in {"y", "yes", "true", "1"}:
        return True
    if s in {"n", "no", "false", "0"}:
        return False
    return None


def _load_overrides(overrides: Optional[str],
                    override_csv: Optional[str]) -> Optional[pd.DataFrame]:
    """YAML (mapping keyed by purpose, or list of rows) and/or CSV."""
    df = None
    if overrides and os.path.exists(overrides):
        if overrides.endswith((".yml", ".yaml")):
            import yaml

            with open(overrides, "r", encoding="utf-8") as f:
                y = yaml.safe_load(f) or {}
            if isinstance(y, dict) and "purpose" not in y and "items" not in y:
                rows = []
                for k, v in y.items():
                    row = {"purpose": k}
                    if isinstance(v, dict):
                        row.update(v)
                    else:
                        row["notes"] = str(v)
                    rows.append(row)
                df = pd.DataFrame(rows)
            else:
                df = pd.DataFrame(y)
        else:
            df = pd.read_csv(overrides)
    if override_csv and os.path.exists(override_csv):
        d2 = pd.read_csv(override_csv)
        df = d2 if df is None else pd.concat([df, d2], ignore_index=True)
    if df is None:
        return None
    if "purpose" not in df.columns:
        raise ValueError(
            "Overrides must include a 'purpose' column or be a YAML "
            "mapping keyed by purpose."
        )
    for c in ("is_primary", "can_open_close_day"):
        if c in df.columns:
            df[c] = df[c].apply(_boolify)
    return df.drop_duplicates(subset=["purpose"], keep="last")


def build_purposes_catalog(
    activities_csv: str,
    out_csv: Optional[str] = None,
    overrides: Optional[str] = None,
    home_name: str = "Home",
    *,
    override_csv: Optional[str] = None,
    persons_csv: Optional[str] = None,
    purpose_col: str = "purpose",
    start_col: str = "startime",
    dur_col: str = "total_duration",
    person_col: str = "persid",
    day_col: Optional[str] = None,
    day_horizon_minutes: float = MINUTES_PER_DAY,
) -> pd.DataFrame:
    """Compute the per-purpose statistics table (reference output schema).

    ``persons_csv``: when given, the person-day denominator counts every
    person in it (x distinct days), so purposes absent from some persons'
    days get participation < 1 even if every *observed* day has them.
    """
    act = pd.read_csv(activities_csv)
    p_col = _safe_col(act, purpose_col,
                      ["purpose", "activity", "activity_type", "act"])
    s_col = _safe_col(act, start_col,
                      ["startime", "starttime", "start_time", "start",
                       "start_min", "start_minutes"])
    d_col = _safe_col(act, dur_col,
                      ["total_duration", "duration", "dur", "dur_min",
                       "duration_minutes"])
    pid_col = _safe_col(act, person_col,
                        ["persid", "person_id", "pid", "person"])
    if day_col:
        day_col = _safe_col(act, day_col, ["day", "date", "diary_day",
                                           "day_id"])
    else:
        day_col = "__day__"
        act[day_col] = 1

    for c in (s_col, d_col):
        act[c] = pd.to_numeric(act[c], errors="coerce")
    act = act.dropna(subset=[p_col, s_col, d_col]).copy()

    act["_purpose_norm"] = (
        act[p_col].astype(str).str.strip()
        .str.replace(r"\s+", " ", regex=True).str.title()
    )
    act["_person_day"] = (
        act[pid_col].astype(str) + "||" + act[day_col].astype(str)
    )

    all_person_days = act["_person_day"].nunique()
    if persons_csv and os.path.exists(persons_csv):
        persons = pd.read_csv(persons_csv)
        ppid = _safe_col(persons, person_col,
                         ["persid", "person_id", "pid", "person"])
        n_days = max(1, act[day_col].nunique())
        all_person_days = max(
            all_person_days, persons[ppid].nunique() * n_days
        )

    rows = []
    for purpose, g in act.groupby("_purpose_norm", sort=False):
        dur = g[d_col].to_numpy(dtype=np.float64)
        start = g[s_col].to_numpy(dtype=np.float64)
        n_pd = int(g["_person_day"].nunique())

        def q(a, p):
            return float(np.quantile(a, p)) if a.size else float("nan")

        rows.append({
            "purpose": purpose,
            "n_occurrences": int(len(g)),
            "n_person_days_with_purpose": n_pd,
            "person_day_participation_rate": (
                n_pd / all_person_days if all_person_days > 0 else np.nan
            ),
            "mean_duration_min": float(np.mean(dur)) if dur.size else np.nan,
            "median_duration_min": q(dur, 0.5),
            "p10_duration_min": q(dur, 0.10),
            "p90_duration_min": q(dur, 0.90),
            "iqr_duration_min": (
                q(dur, 0.75) - q(dur, 0.25) if dur.size else np.nan
            ),
            "std_duration_min": (
                float(np.std(dur, ddof=1)) if dur.size > 1 else 0.0
            ),
            "duration_cv": _cv(dur),
            "mean_start_min": float(np.mean(start)) if start.size else np.nan,
            "median_start_min": q(start, 0.5),
            "p10_start_min": q(start, 0.10),
            "p90_start_min": q(start, 0.90),
            "std_start_min": (
                float(np.std(start, ddof=1)) if start.size > 1 else 0.0
            ),
            "start_circ_var": _circular_variance(start, day_horizon_minutes),
        })

    out = pd.DataFrame(rows)

    # flexibility: cross-purpose normalized dispersion mix
    out["flexibility"] = (
        _minmax01(out["start_circ_var"].astype(float)) * 0.6
        + _minmax01(out["duration_cv"].astype(float)) * 0.4
    )
    out["is_primary"] = out["purpose"].apply(
        lambda p: p.lower() in _PRIMARY_DEFAULTS
    )
    out["can_open_close_day"] = out["purpose"].apply(
        lambda p: p.lower() == home_name.lower()
    )
    out["skip_probability"] = 1.0 - _minmax01(
        out["person_day_participation_rate"].astype(float)
    )

    ov = _load_overrides(overrides, override_csv)
    if ov is not None:
        # normalize override keys the same way catalog purposes were
        # (strip / collapse whitespace / Title Case), so overrides keyed
        # by the source CSV's raw spelling still match
        ov = ov.copy()
        ov["purpose"] = (
            ov["purpose"].astype(str).str.strip()
            .str.replace(r"\s+", " ", regex=True).str.title()
        )
        out = out.merge(ov, on="purpose", how="left", suffixes=("", "__ov"))
        for c in ov.columns:
            c_ov = c + "__ov"
            if c_ov in out.columns:
                out[c] = np.where(out[c_ov].notna(), out[c_ov], out[c])
                out = out.drop(columns=[c_ov])
            elif c != "purpose" and c not in out.columns:
                pass  # merged directly (new column, kept as-is)

    if "notes" not in out.columns:
        out["notes"] = ""

    cols = [c for c in LEAD_COLUMNS if c in out.columns] + [
        c for c in out.columns if c not in LEAD_COLUMNS
    ]
    out = out[cols]
    out = out.sort_values(
        ["person_day_participation_rate", "purpose"], ascending=[False, True]
    ).reset_index(drop=True)
    for c in ("is_primary", "can_open_close_day"):
        out[c] = out[c].map(
            {True: 1, False: 0, 1: 1, 0: 0, 1.0: 1, 0.0: 0}
        )

    if out_csv:
        d = os.path.dirname(out_csv)
        if d:
            os.makedirs(d, exist_ok=True)
        out.to_csv(out_csv, index=False)
    return out
