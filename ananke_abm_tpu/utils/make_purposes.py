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

Implementation is this repo's own: all per-purpose statistics come from
one vectorized ``groupby(...).agg`` table (no per-group Python loop), and
the override merge is a single indexed ``combine_first``-style update.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

MINUTES_PER_DAY = 1440.0

# Output schema contract (column names + lead ordering). Any column the
# catalog produces that is not listed here is appended after these.
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

# column-alias tables for the VISTA-ish inputs we accept
_ALIASES = {
    "purpose": ("purpose", "activity", "activity_type", "act"),
    "start": ("startime", "starttime", "start_time", "start", "start_min",
              "start_minutes"),
    "duration": ("total_duration", "duration", "dur", "dur_min",
                 "duration_minutes"),
    "person": ("persid", "person_id", "pid", "person"),
    "day": ("day", "date", "diary_day", "day_id"),
}

_FLAG_WORDS = {
    "y": True, "yes": True, "true": True, "1": True,
    "n": False, "no": False, "false": False, "0": False,
}


def _resolve_column(df: pd.DataFrame, requested: str, role: str) -> str:
    """Map a requested column name (or any known alias for ``role``) onto
    the DataFrame's actual spelling, ignoring case."""
    by_lower = {c.lower(): c for c in df.columns}
    candidates = (requested,) if requested else ()
    for cand in (*candidates, *_ALIASES[role]):
        hit = by_lower.get(cand.lower())
        if hit is not None:
            return hit
    wanted = [requested, *_ALIASES[role]]
    raise KeyError(
        f"activities CSV has no {role} column: tried {wanted}, "
        f"columns present are {sorted(df.columns)}"
    )


def _parse_flag(value) -> Optional[bool]:
    """Loose bool parsing for override cells; unrecognized -> None."""
    if value is None:
        return None
    return _FLAG_WORDS.get(str(value).strip().lower())


def _unit_rescale(x: pd.Series) -> pd.Series:
    """Min-max rescale a series to [0, 1]; a (near-)constant or all-NaN
    series maps to 0.5 everywhere it is finite (neutral dispersion)."""
    finite = x.dropna()
    if finite.empty:
        return x
    span = float(finite.max() - finite.min())
    if not np.isfinite(span) or span < 1e-12:
        return x.where(x.isna(), 0.5)
    return (x - finite.min()) / span


def _titleize(s: pd.Series) -> pd.Series:
    """Purpose-label normalization: trim, collapse whitespace, Title Case."""
    return (s.astype(str).str.strip()
            .str.replace(r"\s+", " ", regex=True).str.title())


def _circ_var(theta: pd.Series, by: pd.Series) -> pd.Series:
    """Circular variance per group: 1 - |mean e^{i theta}| — cos/sin as
    columns plus one groupby mean, no per-group Python loop."""
    comps = pd.DataFrame({"c": np.cos(theta), "s": np.sin(theta)})
    m = comps.groupby(by).mean()
    return 1.0 - np.hypot(m["c"], m["s"])


def _read_override_frames(overrides: Optional[str],
                          override_csv: Optional[str]) -> list:
    frames = []
    if overrides and os.path.exists(overrides):
        if overrides.endswith((".yml", ".yaml")):
            import yaml

            with open(overrides, "r", encoding="utf-8") as f:
                doc = yaml.safe_load(f) or {}
            if isinstance(doc, dict) and not ({"purpose", "items"} & set(doc)):
                # mapping keyed by purpose: value is a row dict or a note
                records = [
                    {"purpose": name, **val} if isinstance(val, dict)
                    else {"purpose": name, "notes": str(val)}
                    for name, val in doc.items()
                ]
                frames.append(pd.DataFrame.from_records(records))
            else:
                frames.append(pd.DataFrame(doc))
        else:
            frames.append(pd.read_csv(overrides))
    if override_csv and os.path.exists(override_csv):
        frames.append(pd.read_csv(override_csv))
    return frames


def _load_overrides(overrides: Optional[str],
                    override_csv: Optional[str]) -> Optional[pd.DataFrame]:
    """Combine YAML (mapping keyed by purpose, or list of rows) and/or CSV
    overrides into one frame, last writer wins per purpose."""
    frames = _read_override_frames(overrides, override_csv)
    if not frames:
        return None
    ov = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    if "purpose" not in ov.columns:
        raise ValueError(
            "override table needs a 'purpose' key: give the CSV a 'purpose' "
            "column, or key the YAML mapping by purpose name"
        )
    for flag_col in ov.columns.intersection(["is_primary",
                                             "can_open_close_day"]):
        ov[flag_col] = ov[flag_col].map(_parse_flag)
    # normalize labels BEFORE dedup so case/whitespace spelling variants
    # of the same purpose collapse (last writer wins) instead of
    # surviving to a duplicate-index reindex crash downstream
    ov = ov.assign(purpose=_titleize(ov["purpose"]))
    return ov.drop_duplicates(subset=["purpose"], keep="last")


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
    p_col = _resolve_column(act, purpose_col, "purpose")
    s_col = _resolve_column(act, start_col, "start")
    d_col = _resolve_column(act, dur_col, "duration")
    pid_col = _resolve_column(act, person_col, "person")
    if day_col:
        day_col = _resolve_column(act, day_col, "day")
    else:
        day_col = "__day__"
        act[day_col] = 1  # pseudo-day: every row shares one diary day

    # one flat working frame with normalized/typed columns only
    work = pd.DataFrame({
        "purpose": _titleize(act[p_col]),
        "start": pd.to_numeric(act[s_col], errors="coerce"),
        "dur": pd.to_numeric(act[d_col], errors="coerce"),
        "day": act[day_col],
        "pday": act[pid_col].astype(str) + "||" + act[day_col].astype(str),
    })
    work = work.dropna(subset=["purpose", "start", "dur"])

    denom = work["pday"].nunique()
    if persons_csv and os.path.exists(persons_csv):
        persons = pd.read_csv(persons_csv)
        ppid = _resolve_column(persons, person_col, "person")
        # count days among the rows that survived parsing — a day whose
        # rows are all unparseable must not inflate the denominator
        n_days = max(1, work["day"].nunique())
        denom = max(denom, persons[ppid].nunique() * n_days)

    # per-purpose stats in one vectorized agg pass (ddof=1 std, matching
    # the reference; single-occurrence groups get std 0, cv NaN via 0/mean
    # guard below)
    g = work.groupby("purpose", sort=False)
    q = lambda p: (lambda a: a.quantile(p))
    out = g.agg(
        n_occurrences=("dur", "size"),
        n_person_days_with_purpose=("pday", "nunique"),
        mean_duration_min=("dur", "mean"),
        median_duration_min=("dur", "median"),
        p10_duration_min=("dur", q(0.10)),
        p90_duration_min=("dur", q(0.90)),
        _q25_dur=("dur", q(0.25)),
        _q75_dur=("dur", q(0.75)),
        std_duration_min=("dur", "std"),
        mean_start_min=("start", "mean"),
        median_start_min=("start", "median"),
        p10_start_min=("start", q(0.10)),
        p90_start_min=("start", q(0.90)),
        std_start_min=("start", "std"),
    )
    out["iqr_duration_min"] = out.pop("_q75_dur") - out.pop("_q25_dur")
    for std_col in ("std_duration_min", "std_start_min"):
        out[std_col] = out[std_col].fillna(0.0)  # size-1 groups
    mean_dur = out["mean_duration_min"]
    out["duration_cv"] = np.where(
        mean_dur.abs() < 1e-9, np.nan, out["std_duration_min"] / mean_dur
    )
    theta = 2 * np.pi * (work["start"] % day_horizon_minutes) / day_horizon_minutes
    out["start_circ_var"] = _circ_var(theta, work["purpose"])
    out = out.reset_index()

    out["person_day_participation_rate"] = (
        out["n_person_days_with_purpose"] / denom if denom > 0 else np.nan
    )
    out["flexibility"] = (
        0.6 * _unit_rescale(out["start_circ_var"].astype(float))
        + 0.4 * _unit_rescale(out["duration_cv"].astype(float))
    )
    out["skip_probability"] = 1.0 - _unit_rescale(
        out["person_day_participation_rate"].astype(float)
    )
    lowered = out["purpose"].str.lower()
    out["is_primary"] = lowered.isin(_PRIMARY_DEFAULTS)
    out["can_open_close_day"] = lowered == home_name.lower()

    ov = _load_overrides(overrides, override_csv)
    if ov is not None:
        # _load_overrides already normalized + deduped purpose labels
        ov = ov.set_index("purpose").reindex(out["purpose"]).reset_index()
        for c in ov.columns.drop("purpose"):
            if c in out.columns:
                out[c] = ov[c].where(ov[c].notna(), out[c])
            else:
                out[c] = ov[c]

    if "notes" not in out.columns:
        out["notes"] = ""

    ordered = [c for c in LEAD_COLUMNS if c in out.columns]
    out = out[ordered + [c for c in out.columns if c not in ordered]]
    out = out.sort_values(
        ["person_day_participation_rate", "purpose"], ascending=[False, True]
    ).reset_index(drop=True)
    for flag_col in ("is_primary", "can_open_close_day"):
        out[flag_col] = (
            out[flag_col].map(lambda v: None if pd.isna(v) else int(bool(v)))
        )

    if out_csv:
        parent = os.path.dirname(out_csv)
        if parent:
            os.makedirs(parent, exist_ok=True)
        out.to_csv(out_csv, index=False)
    return out
