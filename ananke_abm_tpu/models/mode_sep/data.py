"""CSV contracts + person/shared data structures for the trajectory models.

Schema parity with the reference io_csv
(src/ananke_abm/models/mode_sep/data_process/io_csv.py:17-125): snaps
(person_id, timestamp, location, purpose, anchor), periods (person_id,
start_time, end_time, type, location, purpose, mode), zones, persons, and a
labeled symmetric zero-diagonal distance matrix whose row/column order must
match zones.csv. Validation failures raise with the offending field named.

Additionally supports a *minimal* two-file mode (periods + snaps only — the
reference's test fixtures, test/test_periods_small.csv): zone ids/distances
are derived from the location names present.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

SNAPS_COLS = {"person_id": int, "timestamp": float, "location": str,
              "purpose": str, "anchor": int}
PERIODS_COLS = {"person_id": int, "start_time": float, "end_time": float,
                "type": str, "location": str, "purpose": str, "mode": str}
ZONES_COLS = {"zone_id": int, "name": str, "type": str, "x_coord": float,
              "y_coord": float, "population": float,
              "job_opportunities": float, "retail_accessibility": float,
              "transit_accessibility": float, "attractiveness": float}
PERSONS_COLS = {"person_id": int, "name": str, "age": float, "income": float,
                "home_zone_id": int, "work_zone_id": int}

TRAVEL_TOKEN = "travel"


@dataclasses.dataclass
class IdMaps:
    Z: int
    zone_name_to_index: Dict[str, int]
    zone_index_to_name: Dict[int, str]
    zone_id_to_index: Dict[int, int]


@dataclasses.dataclass
class PersonData:
    person_id: int
    person_name: str
    times_snap: np.ndarray  # (S,) float32
    loc_ids: np.ndarray  # (S,) int64
    stay_segments: List[Tuple[float, float, int]]  # (t0, t1, loc_idx)
    home_zone_idx: int
    work_zone_idx: int
    traits_raw: np.ndarray  # (2,) [age/100, income/1e5]


@dataclasses.dataclass
class SharedData:
    dist_mat: np.ndarray  # (Z, Z) float32
    zone_names: List[str]
    id_maps: IdMaps
    zone_features: Optional[np.ndarray] = None  # (Z, F) when zones.csv given


def _validate_columns(df, required, name):
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(
            f"{name} is missing required columns: {missing}. "
            f"Expected columns: {list(required)}."
        )
    for col, typ in required.items():
        if typ in (int, float):
            df[col] = pd.to_numeric(df[col], errors="raise")
            if typ is int:
                df[col] = df[col].astype(int)
        else:
            df[col] = df[col].astype(str)
    return df


def validate_dist_mat(raw: pd.DataFrame, zone_names: List[str]) -> np.ndarray:
    if raw.columns[0].lower() not in {"loc_id", "location", "name"}:
        raise ValueError(
            "dist_mat.csv: first column must be named 'loc_id'/'location'/'name'."
        )
    header = list(raw.columns[1:])
    if header != zone_names:
        raise ValueError(
            f"dist_mat.csv header {header} does not match zone order {zone_names}."
        )
    rows = raw.iloc[:, 0].tolist()
    if rows != zone_names:
        raise ValueError(
            f"dist_mat.csv row labels {rows} do not match zone order {zone_names}."
        )
    mat = raw.iloc[:, 1:].to_numpy(dtype=np.float32)
    if mat.shape[0] != mat.shape[1]:
        raise ValueError(f"dist_mat.csv must be square; got {mat.shape}.")
    if not np.allclose(mat, mat.T, atol=1e-6):
        raise ValueError("dist_mat.csv must be symmetric (within 1e-6).")
    if not np.all(np.abs(np.diag(mat)) <= 1e-6):
        raise ValueError("dist_mat.csv diagonal must be ~0.")
    return mat


def load_trajectory_csvs(
    periods_csv: str,
    snaps_csv: str,
    zones_csv: Optional[str] = None,
    persons_csv: Optional[str] = None,
    dist_mat_csv: Optional[str] = None,
) -> Tuple[List[PersonData], SharedData]:
    """Load + validate the trajectory-data CSV family.

    Full mode needs all five files; minimal mode (periods+snaps) derives the
    zone universe from location names (sorted) and uses a unit-distance
    matrix and home=first/work=most-visited-nonhome heuristics.
    """
    periods = _validate_columns(pd.read_csv(periods_csv), PERIODS_COLS, "periods.csv")
    snaps = _validate_columns(pd.read_csv(snaps_csv), SNAPS_COLS, "snaps.csv")

    bad_types = set(periods["type"].str.lower()) - {"stay", "travel"}
    if bad_types:
        raise ValueError(f"periods.csv: unknown period types {sorted(bad_types)}")

    if zones_csv:
        zones = _validate_columns(pd.read_csv(zones_csv), ZONES_COLS, "zones.csv")
        zones = zones.sort_values("zone_id").reset_index(drop=True)
        zone_names = zones["name"].tolist()
        if len(set(zone_names)) != len(zone_names):
            raise ValueError("zones.csv: zone names must be unique.")
        zone_id_to_index = {
            int(z): i for i, z in enumerate(zones["zone_id"].tolist())
        }
        feat_cols = ["x_coord", "y_coord", "population", "job_opportunities",
                     "retail_accessibility", "transit_accessibility",
                     "attractiveness"]
        zone_features = zones[feat_cols].to_numpy(dtype=np.float32)
    else:
        names = set(snaps["location"]) | set(
            periods.loc[periods["type"].str.lower() == "stay", "location"]
        )
        names.discard(TRAVEL_TOKEN)
        zone_names = sorted(names)
        zone_id_to_index = {i: i for i in range(len(zone_names))}
        zone_features = None

    name_to_idx = {n: i for i, n in enumerate(zone_names)}
    idx_to_name = {i: n for n, i in name_to_idx.items()}
    Z = len(zone_names)
    id_maps = IdMaps(Z, name_to_idx, idx_to_name, zone_id_to_index)

    unknown = (
        set(snaps["location"])
        | set(periods.loc[periods["type"].str.lower() == "stay", "location"])
    ) - set(zone_names) - {TRAVEL_TOKEN}
    if unknown:
        raise ValueError(f"Locations not present in the zone universe: {sorted(unknown)}")

    if dist_mat_csv:
        dist_mat = validate_dist_mat(pd.read_csv(dist_mat_csv), zone_names)
    else:
        dist_mat = (np.ones((Z, Z)) - np.eye(Z)).astype(np.float32)

    persons_df = None
    if persons_csv:
        persons_df = _validate_columns(
            pd.read_csv(persons_csv), PERSONS_COLS, "persons.csv"
        )

    people: List[PersonData] = []
    for pid in sorted(snaps["person_id"].unique().tolist()):
        s = snaps[snaps["person_id"] == pid].sort_values("timestamp")
        times = s["timestamp"].to_numpy(dtype=np.float32)
        locs = np.array(
            [name_to_idx[loc] for loc in s["location"]], dtype=np.int64
        )
        p = periods[
            (periods["person_id"] == pid)
            & (periods["type"].str.lower() == "stay")
        ]
        stay_segments = [
            (float(r.start_time), float(r.end_time), name_to_idx[r.location])
            for r in p.itertuples()
        ]

        if persons_df is not None:
            prow = persons_df[persons_df["person_id"] == pid]
            if prow.empty:
                raise ValueError(f"persons.csv missing person_id {pid}")
            prow = prow.iloc[0]
            for zid_col in ("home_zone_id", "work_zone_id"):
                if int(prow[zid_col]) not in zone_id_to_index:
                    raise ValueError(
                        f"Person {pid}: {zid_col}={int(prow[zid_col])} not in zones.csv"
                    )
            home_idx = zone_id_to_index[int(prow["home_zone_id"])]
            work_idx = zone_id_to_index[int(prow["work_zone_id"])]
            traits = np.array(
                [float(prow["age"]) / 100.0, float(prow["income"]) / 1e5],
                dtype=np.float32,
            )
            pname = str(prow["name"])
        else:
            home_idx = int(locs[0])
            nonhome = locs[locs != home_idx]
            work_idx = (
                int(np.bincount(nonhome).argmax()) if nonhome.size else home_idx
            )
            traits = np.array([0.35, 0.5], dtype=np.float32)
            pname = str(pid)

        people.append(
            PersonData(
                person_id=int(pid),
                person_name=pname,
                times_snap=times,
                loc_ids=locs,
                stay_segments=stay_segments,
                home_zone_idx=home_idx,
                work_zone_idx=work_idx,
                traits_raw=traits,
            )
        )

    shared = SharedData(
        dist_mat=dist_mat,
        zone_names=zone_names,
        id_maps=id_maps,
        zone_features=zone_features,
    )
    return people, shared


def load_data_paths_yaml(path: str) -> dict:
    """Resolve a data-paths YAML (reference data_paths.py:14-81): keys
    {snaps,periods,zones,dist_mat,persons}_csv, relative to the YAML file."""
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    base = os.path.dirname(os.path.abspath(path))
    out = {}
    for k in ("snaps_csv", "periods_csv", "zones_csv", "dist_mat_csv", "persons_csv"):
        v = raw.get(k)
        if v is None:
            out[k] = None
            continue
        p = v if os.path.isabs(v) else os.path.join(base, v)
        if not os.path.exists(p):
            raise FileNotFoundError(f"{k} -> {p} does not exist")
        out[k] = p
    return out
